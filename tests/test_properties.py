"""Hypothesis property tests for the canonical quotient-filter core."""

import numpy as np
from hypothesis import given, settings, strategies as st

from qsketch.quotient import (
    QuotientFilter,
    _keys_from_hashes,
    pack_slots,
    unpack_slots,
)

hash_sets = st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                     min_size=0, max_size=300, unique=True)


@given(hashes=hash_sets, q=st.integers(min_value=4, max_value=12))
@settings(max_examples=200, deadline=None)
def test_pack_unpack_is_identity(hashes, q):
    r = min(61, 64 - q)
    keys = np.unique(_keys_from_hashes(
        np.array(hashes, dtype=np.uint64), q, r))
    cap = 1 << q
    if len(keys) >= cap:
        keys = keys[: cap - 1]
    assert np.array_equal(unpack_slots(pack_slots(keys, q, r), q, r), keys)


@given(a=hash_sets, b=hash_sets, c=hash_sets)
@settings(max_examples=50, deadline=None)
def test_merge_associative_commutative_bytes(a, b, c):
    fa = QuotientFilter.build(np.array(a, dtype=np.uint64), pre_hashed=True)
    fb = QuotientFilter.build(np.array(b, dtype=np.uint64), pre_hashed=True)
    fc = QuotientFilter.build(np.array(c, dtype=np.uint64), pre_hashed=True)
    x = fa.merge(fb).merge(fc).to_bytes()
    y = fc.merge(fa.merge(fb)).to_bytes()
    z = fb.merge(fc).merge(fa).to_bytes()
    assert x == y == z


@given(vals=st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                     min_size=1, max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_no_false_negatives_ever(vals):
    qf = QuotientFilter.build(np.array(vals, dtype=np.int64))
    assert qf.contains(np.array(vals, dtype=np.int64)).all()
    rt = QuotientFilter.from_bytes(qf.to_bytes())
    assert rt.contains(np.array(vals, dtype=np.int64)).all()
