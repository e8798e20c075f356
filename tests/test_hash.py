"""FNV-1a64 parity tests against published vectors and a pure-Python oracle."""

import numpy as np
import pytest

from qsketch.hash import fnv1a64, fnv1a64_bytes, fnv1a64_str_array, splitmix64


def _fnv_py(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_known_vectors():
    # Published FNV-1a64 test vectors (fnv.isthe.com)
    assert fnv1a64_bytes(b"") == 0xCBF29CE484222325
    assert fnv1a64_bytes(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a64_bytes(b"foobar") == 0x85944171F73967E8


def test_vectorized_matches_scalar_le8():
    """fnv1a64(values) == FNV-1a of 8-byte LE encoding, the exact key
    encoding the reference tests use (/root/reference/filter_test.go:16-20)."""
    rng = np.random.default_rng(42)
    vals = np.concatenate([
        np.array([0, 1, 2**31 - 1, 2**63 - 1, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**64, size=1000, dtype=np.uint64),
    ])
    got = fnv1a64(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == _fnv_py(int(v).to_bytes(8, "little")), hex(v)


def test_int32_tokens_hash_like_uint64():
    toks = np.array([0, 1, 50256, 12345], dtype=np.int32)
    got = fnv1a64(toks)
    for t, g in zip(toks.tolist(), got.tolist()):
        assert g == _fnv_py(int(t).to_bytes(8, "little"))


def test_str_array_matches_bytes():
    ss = ["", "a", "foobar", "héllo", "x" * 100]
    got = fnv1a64_str_array(ss)
    for s, g in zip(ss, got.tolist()):
        assert g == fnv1a64_bytes(s.encode("utf-8"))


def test_splitmix64_deterministic_and_mixing():
    a = splitmix64(np.arange(100, dtype=np.uint64))
    b = splitmix64(np.arange(100, dtype=np.uint64))
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == 100
    assert splitmix64(0) != 0


def test_fnv_buf_equals_str_array_and_bytes():
    """The packed-buffer kernel, the string-list wrapper, and the scalar
    byte loop must agree on arbitrary byte strings (incl. empty)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from qsketch.hash import fnv1a64_buf, fnv1a64_bytes, fnv1a64_str_array

    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0,
                    max_size=30))
    @settings(deadline=None, max_examples=60)
    def check(blobs):
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum(lens)))
        a = fnv1a64_buf(buf, offs)
        b = fnv1a64_str_array(blobs)
        c = np.array([fnv1a64_bytes(x) for x in blobs], dtype=np.uint64)
        assert np.array_equal(a, b)
        assert np.array_equal(a, c.reshape(a.shape))

    check()
