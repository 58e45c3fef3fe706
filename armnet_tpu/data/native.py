"""ctypes binding for the C++ libsvm parser (csrc/libsvm_parser.cc).

Builds the shared library on first use if the toolchain is present; callers
(armnet_tpu.data.libsvm.parse_libsvm) fall back to the numpy parser when
neither the .so nor a compiler is available.
"""

import ctypes
import os
import subprocess
import warnings

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libsvm_parser.so")

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise RuntimeError("native parser build previously failed")
    src = os.path.join(_CSRC, "libsvm_parser.cc")
    # rebuild when the source is newer than the .so, not just when the .so
    # is missing — a stale committed binary would otherwise shadow local
    # source fixes forever
    stale = (os.path.exists(src) and os.path.exists(_SO)
             and os.path.getmtime(src) > os.path.getmtime(_SO))
    if not os.path.exists(_SO) or stale:
        if not os.path.exists(src):
            _build_failed = True
            raise RuntimeError("csrc/libsvm_parser.cc missing")
        try:
            subprocess.run(["make", "-C", _CSRC] + (["-B"] if stale else []),
                           check=True, capture_output=True, timeout=120)
        except Exception as e:
            if not os.path.exists(_SO):
                _build_failed = True
                raise RuntimeError(f"native parser build failed: {e}")
            warnings.warn(f"native parser rebuild failed, using existing "
                          f".so: {e}")
    lib = ctypes.CDLL(_SO)
    lib.libsvm_count_rows.argtypes = [ctypes.c_char_p]
    lib.libsvm_count_rows.restype = ctypes.c_int64
    lib.libsvm_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.libsvm_parse.restype = ctypes.c_int64
    lib.libsvm_count_rows_range.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.libsvm_count_rows_range.restype = ctypes.c_int64
    lib.libsvm_parse_range.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.libsvm_parse_range.restype = ctypes.c_int64
    _lib = lib
    return lib


def parse_file(path, nfield):
    """Parse with the native library -> (ids, values, labels) numpy arrays."""
    lib = _load()
    path_b = os.fsencode(path)
    nrows = lib.libsvm_count_rows(path_b)
    if nrows < 0:
        raise IOError(f"cannot read {path}")
    ids = np.empty((nrows, nfield), np.int32)
    values = np.empty((nrows, nfield), np.float32)
    labels = np.empty((nrows,), np.float32)
    skipped = ctypes.c_int64(0)
    got = lib.libsvm_parse(
        path_b, nfield,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrows, ctypes.byref(skipped))
    if got < 0:
        raise IOError(f"native parse failed for {path}")
    if skipped.value:
        warnings.warn(f"{path}: skipped {skipped.value} malformed line(s)")
    return ids[:got], values[:got], labels[:got]


def parse_file_range(path, nfield, byte_lo, byte_hi):
    """Parse only the rows whose first byte lies in [byte_lo, byte_hi) —
    the per-host shard of SURVEY.md §3.5 (each process parses ~1/P of the
    bytes instead of P redundant whole-file parses)."""
    lib = _load()
    path_b = os.fsencode(path)
    nrows = lib.libsvm_count_rows_range(path_b, byte_lo, byte_hi)
    if nrows < 0:
        raise IOError(f"cannot read {path}")
    ids = np.empty((max(nrows, 1), nfield), np.int32)
    values = np.empty((max(nrows, 1), nfield), np.float32)
    labels = np.empty((max(nrows, 1),), np.float32)
    skipped = ctypes.c_int64(0)
    got = lib.libsvm_parse_range(
        path_b, nfield, byte_lo, byte_hi,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrows, ctypes.byref(skipped))
    if got < 0:
        raise IOError(f"native range parse failed for {path}")
    if skipped.value:
        warnings.warn(f"{path}: skipped {skipped.value} malformed line(s)")
    return ids[:got], values[:got], labels[:got]
