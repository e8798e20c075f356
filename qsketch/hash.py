"""Vectorized 64-bit FNV-1a fingerprinting.

Reference parity: micheleriva/quotient hashes keys with Go's
``hash/fnv`` FNV-1a64 (/root/reference/filter.go:134-141) and its
tests feed 8-byte little-endian ``uint64`` encodings of integer keys
(/root/reference/filter_test.go:16-20).  We reproduce exactly that
fingerprint function, but vectorized over NumPy arrays so whole Arrow
batches of token ids hash in a handful of SIMD-friendly passes instead
of per-row Python.

Public FNV-1a constants (fnv.isthe.com / RFC draft):
  offset basis = 0xcbf29ce484222325
  prime        = 0x100000001b3
"""

from __future__ import annotations

import numpy as np

FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
FNV64_PRIME = np.uint64(0x100000001B3)

_U8_MASK = np.uint64(0xFF)


def fnv1a64(values: np.ndarray) -> np.ndarray:
    """FNV-1a64 of each value's 8-byte little-endian encoding.

    ``values`` is any integer ndarray; it is reinterpreted as uint64
    (int32 token ids are zero/two's-complement-extended the same way Go's
    ``uint64(v)`` conversion does for non-negative ids).  Returns a
    uint64 ndarray of fingerprints.  Mirrors the byte-at-a-time loop of
    Go ``fnv.New64a().Write(le8(v))`` with 8 unrolled vector passes.
    """
    v = np.ascontiguousarray(values)
    if v.dtype.kind == "f" or v.dtype == object:
        # floats silently round |x| > 2**53 (e.g. a nullable long column
        # that pandas widened to float64) — corrupt fingerprints would
        # break the zero-false-negative contract, so fail loudly.
        raise TypeError(
            f"fnv1a64 requires integer input, got {v.dtype}; for nullable "
            "columns coalesce nulls JVM-side, for strings use "
            "fnv1a64_str_array")
    if v.dtype != np.uint64:
        # int32/int64 -> uint64 with two's-complement reinterpretation
        v = v.astype(np.int64, copy=False).view(np.uint64)
    h = np.full(v.shape, FNV64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(8):
            h = (h ^ ((v >> np.uint64(8 * i)) & _U8_MASK)) * FNV64_PRIME
    return h


def fnv1a64_bytes(data: bytes) -> int:
    """Scalar FNV-1a64 over raw bytes (API/test parity for string keys,

    cf. /root/reference/server.go:100 which hashes the UTF-8 key bytes).
    """
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_buf(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a64 over n variable-length byte strings packed in

    one uint8 buffer; string i is ``buf[offsets[i]:offsets[i+1]]``.
    Position-grouped vector passes: the Python-level loop is over byte
    POSITIONS (bounded by the longest string), not rows — so an Arrow
    StringArray's (values buffer, offsets) hashes with zero per-row
    Python and zero re-encoding.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    out = np.full(n, FNV64_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    starts = offsets[:-1]
    max_len = int(lens.max())
    with np.errstate(over="ignore"):
        for pos in range(max_len):
            active = lens > pos
            if not active.any():
                break
            idx = starts[active] + pos
            out[active] = (out[active] ^ buf[idx].astype(np.uint64)) * FNV64_PRIME
    return out


def fnv1a64_str_array(strings) -> np.ndarray:
    """Vectorized FNV-1a64 over variable-length UTF-8 strings.

    Concatenates the batch into one byte buffer and defers to the
    packed-buffer kernel (fnv1a64_buf).
    """
    enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    n = len(enc)
    if n == 0:
        return np.full(0, FNV64_OFFSET, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return fnv1a64_buf(buf, offsets)


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """SplitMix64 finalizer (public domain, Steele et al.) — used to

    derive independent hash families / deterministic seeds from one
    fingerprint without another data pass.
    """
    scalar = np.isscalar(x)
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z
