"""Shared alpha-entmax threshold solver for the Pallas kernels.

The solve: find tau with  f(tau) = sum_i max(x_i - tau, 0)^(1/(alpha-1)) = 1,
then p = max(x - tau, 0)^(1/(alpha-1)) (x pre-scaled by alpha-1; reference
bisection spec at /root/reference/utils/entmax.py:29-68).

Pure bisection needs ~27 iterations to exhaust an f32 bracket, and each
iteration costs one transcendental pow per element for generic alpha (the
dominant cost: alpha=1.7 measured 19x slower than the pow-free alpha=2).
This solver does N_BISECT bracket halvings, then N_NEWTON safeguarded Newton
steps — f is monotone decreasing and convex/concave (fixed sign of f'' for
alpha<2 / alpha>2), so Newton from inside a bracket converges quadratically;
each step is clamped back into the live bracket, so worst-case behavior is
still bisection. f'(tau) = -1/(alpha-1) * sum p_i / z_i costs one divide on
top of the pow already computed for f. 8 + 5 iterations match the 50-iter
reference bisection to f32 tolerance (~2e-7, same as 50-vs-30 bisection).
"""

import os

import jax.numpy as jnp
from jax import lax

__all__ = ["pow_inv", "pow_static", "solve_entmax_axis0"]

# (8,6) is the validated production budget; smaller budgets measurably
# lose accuracy at generic alpha (r2 sweep: (6,3) misses the interpret
# parity tolerance on ~0.03% of elements at alpha=1.7 — the safeguarded
# Newton needs the warmup when the support boundary sits near an input
# kink). Env overrides for experiments only.
N_BISECT = int(os.environ.get("ARMNET_ENTMAX_BISECT", 8))
N_NEWTON = int(os.environ.get("ARMNET_ENTMAX_NEWTON", 6))
# generic-alpha solver (see solve_entmax_axis0): fastpow warmup + exact
# Newton polish is the PRODUCTION DEFAULT since r5 — campaign stage 08:
# newton 244.8K ex/s vs fastpow(12,4) 267.5-273.4K on the Criteo alpha=1.7
# recipe (+9-12%), and the r4 CPU accuracy sweep
# (benchmarks/fastpow_accuracy.py, commit 5f01680) showed (12,4) is the
# smallest newton-equivalent budget. ARMNET_ENTMAX_SOLVER=newton restores
# the bisect+Newton solver everywhere.
SOLVER = os.environ.get("ARMNET_ENTMAX_SOLVER", "fastpow")
N_FAST = int(os.environ.get("ARMNET_ENTMAX_FAST", 12))
N_POLISH = int(os.environ.get("ARMNET_ENTMAX_POLISH", 4))
_TINY = 1e-30


def pow_inv(z, inv_am1):
    """clamp(z,0) ** (1/(alpha-1)) with static-exponent specialization."""
    z = jnp.maximum(z, 0.0)
    if inv_am1 == 1.0:          # alpha = 2 (sparsemax)
        return z
    if inv_am1 == 2.0:          # alpha = 1.5
        return z * z
    if inv_am1 == 3.0:
        return z * z * z
    return jnp.power(z, inv_am1)


def pow_static(y, e):
    """y ** e for y >= 0 with static-exponent specialization (backward)."""
    if e == 0.0:
        return jnp.ones_like(y)
    if e == 0.5:                # alpha = 1.5
        return jnp.sqrt(y)
    if e == 1.0:
        return y
    return jnp.power(jnp.maximum(y, 1e-38), e)


_BISECT_CONVERGED = 30   # f32 bracket is mantissa-exhausted after ~27 halvings


def solve_entmax_axis0(x, alpha, n_iter=50):
    """alpha-entmax over axis 0 of a value of any rank.

    Solver choice (measured on v5e at [40, 32, 128]-class tiles):
      * specialized exponents (alpha in {1.5, 2, 4/3}: pow is 0-2 multiplies)
        -> pure bisection, capped at the f32 convergence limit; each
        iteration is one cheap evaluation (0.35 ms at alpha=2).
      * generic alpha (pow = exp+log transcendentals, ~19x an iteration)
        -> bisection warmup + safeguarded Newton: ~14 evaluations instead
        of 30 (11.2 -> 5.0 ms at alpha=1.7).
    `n_iter` is accepted for API parity with the reference's bisection count.
    """
    am1 = alpha - 1.0
    inv_am1 = 1.0 / am1
    x = x * am1
    d = x.shape[0]

    max_val = jnp.max(x, axis=0, keepdims=True)
    tau_lo = max_val - 1.0                      # f(tau_lo) >= 0 always
    tau_hi = max_val - (1.0 / d) ** am1         # f(tau_hi) <= 0 always

    if inv_am1 in (1.0, 2.0, 3.0):              # cheap-pow: plain bisection
        n = min(int(n_iter), _BISECT_CONVERGED)
        f_lo0 = jnp.sum(pow_inv(x - tau_lo, inv_am1), 0, keepdims=True) - 1.0
        dm = tau_hi - tau_lo

        def body(_, carry):
            dm, t_lo, _ = carry
            dm = dm * 0.5
            t_m = t_lo + dm
            f_m = jnp.sum(pow_inv(x - t_m, inv_am1), 0, keepdims=True) - 1.0
            t_lo = jnp.where(f_m * f_lo0 >= 0, t_m, t_lo)
            return dm, t_lo, t_m

        _, _, tau = lax.fori_loop(0, n, body, (tau_hi - tau_lo, tau_lo,
                                               tau_lo))
        p = pow_inv(x - tau, inv_am1)
        return p / jnp.sum(p, 0, keepdims=True)

    def f_val(tau):
        return jnp.sum(pow_inv(x - tau, inv_am1), 0, keepdims=True) - 1.0

    if SOLVER == "fastpow" and alpha <= 2.0:
        # alpha > 2 (c = 1/(alpha-1) < 1) measurably degrades the fast seed
        # (1e-2 residual after 4 polishes on adversarial inputs) — the
        # standard warmup below handles that rare regime instead.
        # Experimental (r3, VERDICT #9): localize tau with a BIT-TRICK pow —
        # z^c ~= bitcast(c * (bits(z) - K) + K), the Blinn fast-pow, whose
        # ~±4% relative error is irrelevant for bracketing — then hand the
        # ~1e-2-accurate tau to the exact-pow safeguarded Newton polish
        # below. Exact-pow evaluations drop from 8+6 to N_POLISH (+1 final);
        # each fast iteration costs integer mul-adds instead of exp+log.
        _K = jnp.int32(int((127 - 0.0450466) * (1 << 23)))

        def fast_pow(z):
            # z <= 0 -> 0 (a masked where, as the exact path does); the
            # bit trick needs z well inside the normal-f32 range
            zc = jnp.maximum(z, 1e-20)
            bits = lax.bitcast_convert_type(zc, jnp.int32)
            # clamp in f32 BEFORE the int32 cast: at small alpha (inv_am1
            # ~ 4+) a tiny z gives inv_am1*(bits-K)+K past int32 min — the
            # saturated/UB cast would bitcast to garbage and poison the
            # warmup bracket. The 0 floor bitcasts to +0.0, the correct
            # limit of z^c as z -> 0 (f32 rounding at 1e9 magnitudes is
            # ~100x finer than the bit-trick's own ~4% error).
            pb_f = inv_am1 * (bits - _K).astype(jnp.float32) + jnp.float32(_K)
            pb = jnp.clip(pb_f, 0.0, 2.1e9).astype(jnp.int32)
            p = lax.bitcast_convert_type(pb, jnp.float32)
            return jnp.where(z > 0, p, 0.0)

        def fast_f(tau):
            return jnp.sum(fast_pow(x - tau), 0, keepdims=True) - 1.0

        def fbis(_, carry):
            t_lo, t_hi = carry
            t_m = 0.5 * (t_lo + t_hi)
            pos = fast_f(t_m) >= 0
            return (jnp.where(pos, t_m, t_lo), jnp.where(pos, t_hi, t_m))

        f_lo, f_hi = lax.fori_loop(0, N_FAST, fbis, (tau_lo, tau_hi))
        # polish brackets re-derive from EXACT f signs; the fast bracket
        # only seeds tau (the true root can sit slightly outside it)
        tau = 0.5 * (f_lo + f_hi)
        n_polish = N_POLISH
    else:
        def bis(_, carry):
            t_lo, t_hi = carry
            tau_m = 0.5 * (t_lo + t_hi)
            pos = f_val(tau_m) >= 0
            return (jnp.where(pos, tau_m, t_lo),
                    jnp.where(pos, t_hi, tau_m))

        tau_lo, tau_hi = lax.fori_loop(0, N_BISECT, bis, (tau_lo, tau_hi))
        tau = 0.5 * (tau_lo + tau_hi)
        n_polish = N_NEWTON

    def newton(_, carry):
        tau_lo, tau_hi, tau = carry
        z = jnp.maximum(x - tau, 0.0)
        p = pow_inv(z, inv_am1)
        s1 = jnp.sum(p, 0, keepdims=True) - 1.0
        # f' = -inv_am1 * sum p/z over the support
        s2 = jnp.sum(jnp.where(z > 0, p / jnp.maximum(z, _TINY), 0.0),
                     0, keepdims=True)
        pos = s1 >= 0
        tau_lo = jnp.where(pos, tau, tau_lo)
        tau_hi = jnp.where(pos, tau_hi, tau)
        t_n = tau + s1 / (inv_am1 * jnp.maximum(s2, _TINY))
        # non-strict bounds: a converged iterate has t_n == tau == tau_lo
        # (or tau_hi) and must be kept, not kicked to the midpoint
        inside = (t_n >= tau_lo) & (t_n <= tau_hi)
        tau = jnp.where(inside, t_n, 0.5 * (tau_lo + tau_hi))
        return tau_lo, tau_hi, tau

    _, _, tau = lax.fori_loop(0, n_polish, newton, (tau_lo, tau_hi, tau))
    p = pow_inv(x - tau, inv_am1)
    return p / jnp.sum(p, 0, keepdims=True)
