"""Dyadic count-min quantiles: the merge-SHAPE-independent quantile
sketch (linear counters — byte-identical for ANY partitioning or merge
tree, the same guarantee class as QF/Bloom/HLL/CMS)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from qsketch import base
from qsketch.dyadic import DyadicCMQuantiles


def _rank_exact(vals, x):
    return int((np.asarray(vals) <= x).sum())


def test_exact_when_all_levels_exact():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 4096, 5000)
    sk = DyadicCMQuantiles(domain_bits=13, width=8192)
    sk.update(vals)
    for x in (0, 1, 100, 2048, 4095, 8191):
        assert sk.rank(x) == _rank_exact(vals, x)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        target = max(1, int(np.ceil(q * len(vals))))
        exact = int(np.sort(vals)[target - 1])
        assert sk.quantiles([q])[0] == exact


def test_rank_error_within_bound_on_cms_levels():
    rng = np.random.default_rng(2)
    vals = rng.zipf(1.5, 40_000).clip(max=(1 << 20) - 1).astype(np.int64)
    sk = DyadicCMQuantiles(domain_bits=20, width=4096, depth=3)
    sk.update(vals)
    bound = sk.rank_error_bound()
    for x in (1, 2, 5, 10, 100, 1000, 100_000):
        err = abs(sk.rank(x) - _rank_exact(vals, x))
        assert err <= bound
        # CMS never undercounts a dyadic interval, so rank never drops
        assert sk.rank(x) >= _rank_exact(vals, x)


def test_signed_domain():
    vals = np.array([-5, -1, 0, 3, 7, -8, 7])
    sk = DyadicCMQuantiles(domain_bits=5, width=64, signed=True)
    sk.update(vals)
    assert sk.rank(-6) == 1 and sk.rank(0) == 4 and sk.rank(7) == 7
    assert sk.quantiles([0.5])[0] == 0.0


def test_out_of_domain_raises():
    sk = DyadicCMQuantiles(domain_bits=8, width=256)
    with pytest.raises(ValueError):
        sk.update(np.array([256]))
    with pytest.raises(ValueError):
        DyadicCMQuantiles(domain_bits=8, signed=True).update(np.array([200]))
    with pytest.raises(TypeError):
        sk.update(np.array([1.5]))


@given(st.lists(st.integers(0, 1023), min_size=0, max_size=300),
       st.data())
@settings(deadline=None, max_examples=40)
def test_merge_shape_independent_bytes(vals, data):
    """ANY partitioning of the multiset into parts and ANY merge tree
    yields byte-identical state — and identical to a single-shot build."""
    ref = DyadicCMQuantiles(domain_bits=10, width=128, depth=2)
    ref.update(np.asarray(vals, dtype=np.int64))
    ref_bytes = ref.to_bytes()

    n_parts = data.draw(st.integers(1, 5))
    assign = [data.draw(st.integers(0, n_parts - 1)) for _ in vals]
    parts = []
    for p in range(n_parts):
        sk = DyadicCMQuantiles(domain_bits=10, width=128, depth=2)
        sk.update(np.asarray([v for v, a in zip(vals, assign) if a == p],
                             dtype=np.int64))
        parts.append(sk)
    # random merge order (fold in a shuffled sequence = arbitrary shape)
    order = data.draw(st.permutations(range(n_parts)))
    acc = parts[order[0]]
    for i in order[1:]:
        acc = acc.merge(parts[i])
    assert acc.to_bytes() == ref_bytes


def test_serialization_roundtrip_and_registry():
    rng = np.random.default_rng(3)
    sk = DyadicCMQuantiles(domain_bits=16, width=512, depth=2, signed=True)
    sk.update(rng.integers(-1000, 1000, 2000))
    rt = base.from_bytes(sk.to_bytes())
    assert isinstance(rt, DyadicCMQuantiles)
    assert rt.to_bytes() == sk.to_bytes()
    assert np.array_equal(rt.quantiles([0.1, 0.5, 0.9]),
                          sk.quantiles([0.1, 0.5, 0.9]))
