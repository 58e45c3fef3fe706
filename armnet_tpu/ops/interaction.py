"""Feature-interaction ops: ARM exponential-neuron cross products, FM/Anova,
cross layers, compressed interaction — the compute cores the zoo shares.

The ARM pipeline (behavioral spec: /root/reference/models/armnet.py:26-36,86-87
and armnet_1h.py:25-34,85-86):

  gates   = <emb, bilinear, query> * d_k^-0.5      (per head/neuron/field score)
  sparse  = entmax_alpha(gates) over the field axis (adaptive field selection)
  weight  = sparse * values                         (signed exponents)
  out     = exp(sum_f weight[...,f] * emb[:,f,:])   ("exponential neuron":
            prod_f exp(e_f)^w_f, a multiplicative cross-feature)

Everything here is jnp (XLA fuses the einsum+exp chains); the fused Pallas
variant lives in armnet_tpu/kernels/arm_pallas.py and is numerically
interchangeable (tested against these twins).
"""

import os

import jax
import jax.numpy as jnp

__all__ = [
    "arm_attention_multihead", "arm_attention_1h", "arm_exp_cross",
    "arm_exp_cross_fmajor", "mh_gate_proj",
    "arm1h_interaction", "anova_kernel", "cross_layer",
    "compressed_interaction_step",
]


def arm1h_interaction(emb, wk, query, values, alpha, n_iter=50):
    """Full ARM-1h interaction: emb [B,F,E] -> exponential neurons [B,O,E].

    Dispatch: with --kernels pallas-fused and a static alpha > 1 the whole
    chain runs as one VMEM-resident kernel (kernels/arm_pallas.py). The
    default path is the jnp chain below — XLA fuses the einsums, and
    entmax_bisect inside sparse_normalizer dispatches to the standalone
    Pallas entmax kernel on TPU (the measured-fastest combination; see
    BENCH_NOTES.md for why the monolithic kernel is opt-in).
    """
    if isinstance(alpha, (int, float)) and float(alpha) > 1.0:
        from armnet_tpu.kernels.config import use_fused_arm

        if use_fused_arm():
            from armnet_tpu.kernels.arm_pallas import arm1h_fused

            return arm1h_fused(emb, wk, query, values, float(alpha), n_iter)
    from armnet_tpu.ops.entmax import sparse_normalizer

    keys = jnp.einsum("bfe,ed->bfd", emb, wk.astype(emb.dtype))
    if os.environ.get("ARMNET_ARM1H_LAYOUT", "fmajor") != "bof":
        # Fields-major is the PRODUCTION DEFAULT (r5 campaign stages 02/04:
        # 292.1K/293.0K ex/s vs 274.3K bof baseline, +6.5-6.8% — the same
        # lane-pad mechanism that won for the multi-head path in r3; layout
        # parity pinned by test_arm1h_fields_major_layout_matches_bof_math).
        # Gates/sparse weights stay [B, F, O] with O lane-minor (O=128 at
        # the flagship recipe - dense tiles), entmax normalizes the middle
        # field axis through the kernel's leading-axis entry, and the
        # exp-cross contracts fields directly. The [B, O, F] layout
        # (ARMNET_ARM1H_LAYOUT=bof) materializes F-minor tensors
        # lane-padded 128/F (~3.3x at F=39) on both sides of the entmax
        # kernel.
        d_k = query.shape[-1]
        gates = jnp.einsum("bfd,od->bfo", keys, query) * (d_k ** -0.5)
        sparse = sparse_normalizer(alpha, axis=1, n_iter=n_iter)(gates)
        return arm_exp_cross_fmajor(emb, sparse * values.T[None])
    w = arm_attention_1h(keys, query, values,
                         sparse_normalizer(alpha, n_iter=n_iter))
    return arm_exp_cross(emb, w)


def mh_gate_proj(bilinear_w, query):
    """Fold the bilinear+query factors into one gate projection [K*O, E].

    m[k,o,x] = sum_y bilinear_w[k,x,y] * query[k,o,y] — the tiny GEMM XLA's
    einsum optimizer already factors out; doing it explicitly lets the big
    contraction emit gates in the [B, F, K*O] layout (KO minor: dense lanes)
    instead of [B,K,O,F], whose F-minor materializations are lane-padded
    128/F (~3.3x at F=39) and require a [K,O,B,F]->[B,K,O,F] transpose.
    """
    nhead, nemb, _ = bilinear_w.shape
    nhid = query.shape[1]
    m = jnp.einsum("kxy,koy->kox", bilinear_w, query)
    return m.reshape(nhead * nhid, nemb)


def arm_attention_multihead(emb, bilinear_w, query, values, normalizer):
    """Multi-head sparse field weights in the TPU-friendly [B, F, K*O] layout.

    Math parity with the reference [B,K,O,F] pipeline
    (/root/reference/models/armnet.py:26-36): gates are the same bilinear
    scores (bitwise — XLA factored the 3-operand einsum into the same m
    product), entmax normalizes over the field axis (here axis=1), and
    `values` scales per (head, neuron, field). Only the memory layout
    differs: KO stays minor end-to-end, so no F-minor (lane-padded) tensor
    is ever materialized. `normalizer` must normalize axis=1.
    """
    d_k = bilinear_w.shape[-1]
    m = mh_gate_proj(bilinear_w, query)
    gates = jnp.einsum("bfx,ox->bfo", emb, m) * (d_k ** -0.5)  # [B,F,KO]
    sparse = normalizer(gates)                    # entmax over fields (axis 1)
    nhead, nhid, nfield = values.shape
    v_t = values.reshape(nhead * nhid, nfield).T  # [F, KO]
    return sparse * v_t[None]                     # [B, F, KO]


def arm_attention_1h(keys, query, values, normalizer):
    """One-head sparse gates: keys [B,F,dk] x query [O,dk] -> [B,O,F]."""
    d_k = query.shape[-1]
    gates = jnp.einsum("bfe,oe->bof", keys, query) * (d_k ** -0.5)
    sparse = normalizer(gates)
    return sparse * values[None]                   # [B,O,F]


def arm_exp_cross(emb, weight):
    """Exponential neurons: exp(sum_f w_f * e_f).

    emb [B,F,E], weight [B,...,F] -> [B,...,E]; supports both the one-head
    ([B,O,F]) and multi-head ([B,K,O,F]) weight layouts.
    """
    if weight.ndim == 3:
        z = jnp.einsum("bfe,bof->boe", emb, weight)
    elif weight.ndim == 4:
        z = jnp.einsum("bfe,bkof->bkoe", emb, weight)
    else:
        raise ValueError(f"unsupported weight rank {weight.ndim}")
    return jnp.exp(z)


def arm_exp_cross_fmajor(emb, weight):
    """Exponential neurons with fields-major weights: the [B, F, C] twin of
    arm_exp_cross (C = flattened head*neuron channels, kept lane-minor by the
    multi-head pipeline). emb [B,F,E], weight [B,F,C] -> [B,C,E]; identical
    math to arm_exp_cross on weight.transpose(0,2,1).reshape(B,K,O,F)."""
    z = jnp.einsum("bfe,bfc->bce", emb, weight)
    return jnp.exp(z)


def anova_kernel(x, order):
    """ANOVA kernel of a given order via the cumsum DP over fields.

    x: [B, F, E]; returns [B] — the order-`order` interaction sum. Matches the
    recurrence of the reference HOFM (models/hofm.py:10-22): a dynamic program
    where a[t, j] accumulates all t-way products over fields < j.
    """
    bsz, nfield, nemb = x.shape
    a_prev = jnp.ones((bsz, nfield + 1, nemb), x.dtype)
    for t in range(order):
        upd = x[:, t:, :] * a_prev[:, t:-1, :]
        a = jnp.zeros_like(a_prev).at[:, t + 1:, :].set(upd)
        a_prev = jnp.cumsum(a, axis=1)
    return jnp.sum(a_prev[:, -1, :], axis=-1)


def cross_layer(x0, x, w, b):
    """One DCN cross layer: x0 * (x @ w) + b + x (rank-1 explicit cross)."""
    xw = jnp.matmul(x, w)                          # [B, 1]
    return x0 * xw + b + x


def compressed_interaction_step(x0, xk, filt):
    """One CIN layer: outer product over field dims -> 1x1 'conv' -> ReLU.

    x0 [B,F,E], xk [B,C,E], filt [F*C, nfilter] -> [B, nfilter, E].
    The reference's Conv1d(kernel_size=1) is exactly a dense map over the
    flattened (F*C) channel axis — on TPU we express it as an einsum so the
    MXU sees one batched matmul.
    """
    h = x0[:, :, None, :] * xk[:, None, :, :]      # [B, F, C, E]
    b, f, c, e = h.shape
    h = h.reshape(b, f * c, e)
    out = jnp.einsum("bce,cf->bfe", h, filt)       # [B, nfilter, E]
    return jax.nn.relu(out)
