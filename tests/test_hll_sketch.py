"""Sketch-state tests mirroring the reference's SerializationTest
states (date/internal/SerializationTest.java:69-98 in /root/reference):
empty / exact / approx / mixed, serialized round-trips, merges in both
orders, tipped/exact behavior around thresholds {0, 2, 999, -1}."""

import numpy as np
import pytest

from elasticsearch_approx_plugin_spark.functions.hll import (
    hll_add_hashes,
    hll_estimate,
    hll_merge,
    hll_new,
    p_for_rsd,
)
from elasticsearch_approx_plugin_spark.functions.sketch import CountThenEstimate


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_hll_accuracy():
    p = p_for_rsd(0.0025)
    assert p == 18
    regs = hll_new(14)  # rsd ~ 0.0081
    n = 100_000
    hll_add_hashes(regs, _hashes(n))
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.03


def test_hll_merge_equals_union():
    a, b, u = hll_new(12), hll_new(12), hll_new(12)
    ha, hb = _hashes(5000, 1), _hashes(5000, 2)
    hll_add_hashes(a, ha)
    hll_add_hashes(b, hb)
    hll_add_hashes(u, np.concatenate([ha, hb]))
    merged = hll_merge(a, b)
    assert hll_estimate(merged) == hll_estimate(u)


def test_small_range_exactish():
    regs = hll_new(14)
    hll_add_hashes(regs, _hashes(50))
    assert hll_estimate(regs) == 50  # linear counting regime


def test_exact_below_threshold():
    st = CountThenEstimate(threshold=1000, p=12)
    h = _hashes(500)
    st.offer_hashes(h)
    st.offer_hashes(h)  # repeats: count up, cardinality flat
    assert not st.tipped
    assert st.cardinality() == 500
    assert st.count == 1000


def test_tips_above_threshold():
    st = CountThenEstimate(threshold=100, p=14)
    st.offer_hashes(_hashes(101))
    assert st.tipped
    assert abs(st.cardinality() - 101) <= 3


def test_threshold_sentinels():
    never = CountThenEstimate(threshold=-1, p=12)
    never.offer_hashes(_hashes(10_000))
    assert not never.tipped and never.cardinality() == 10_000

    always = CountThenEstimate(threshold=0, p=14)
    assert always.tipped
    always.offer_hashes(_hashes(5))
    assert always.cardinality() == 5  # linear-counting exact at tiny n


@pytest.mark.parametrize("threshold", [0, 2, 999, -1])
def test_merge_both_orders(threshold):
    ha, hb = _hashes(600, 3), _hashes(600, 4)
    a1, b1 = CountThenEstimate(threshold, p=14), CountThenEstimate(threshold, p=14)
    a2, b2 = CountThenEstimate(threshold, p=14), CountThenEstimate(threshold, p=14)
    a1.offer_hashes(ha), b1.offer_hashes(hb)
    a2.offer_hashes(ha), b2.offer_hashes(hb)
    m1 = a1.merge(b1)
    m2 = b2.merge(a2)
    assert m1.cardinality() == m2.cardinality()
    assert m1.count == m2.count == 1200
    assert m1.tipped == m2.tipped


def test_merge_exact_pair_tips_when_union_exceeds():
    a, b = CountThenEstimate(1000, p=14), CountThenEstimate(1000, p=14)
    a.offer_hashes(_hashes(600, 5))
    b.offer_hashes(_hashes(600, 6))
    assert not a.tipped and not b.tipped
    m = a.merge(b)
    assert m.tipped
    assert abs(m.cardinality() - 1200) / 1200 < 0.05


def test_serialization_roundtrip_all_states():
    for threshold, n in [(1000, 0), (1000, 50), (10, 50), (0, 50)]:
        st = CountThenEstimate(threshold, p=12)
        if n:
            st.offer_hashes(_hashes(n, 7))
        rt = CountThenEstimate.from_bytes(st.to_bytes())
        assert rt.tipped == st.tipped
        assert rt.count == st.count
        assert rt.cardinality() == st.cardinality()
        # merged round-trips still merge
        other = CountThenEstimate(threshold, p=12)
        other.offer_hashes(_hashes(20, 8))
        assert rt.merge(other).cardinality() == pytest.approx(
            CountThenEstimate.from_bytes(st.to_bytes()).merge(other).cardinality()
        )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=2, max_size=6),
    st.randoms(use_true_random=False),
)
def test_merge_order_invariance_property(chunk_sizes, rnd):
    """HLL register merges are associative+commutative (max-semilattice):
    ANY merge order yields byte-identical registers — the property the
    reference's shard reduce relies on (CountThenEstimateBytes merge)."""
    states = []
    for i, n in enumerate(chunk_sizes):
        s = CountThenEstimate(threshold=0, p=10)
        s.offer_hashes(_hashes(n, seed=100 + i))
        states.append(s)
    order = list(range(len(states)))
    rnd.shuffle(order)

    def merge_all(idxs):
        acc = CountThenEstimate.from_bytes(states[idxs[0]].to_bytes())
        for i in idxs[1:]:
            acc = acc.merge(CountThenEstimate.from_bytes(states[i].to_bytes()))
        return acc

    a = merge_all(list(range(len(states))))
    b = merge_all(order)
    assert a.to_bytes() == b.to_bytes()  # registers byte-identical
    assert a.count == b.count


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=200), min_size=2, max_size=5))
def test_exact_merge_equals_bulk_property(chunk_sizes):
    """Exact-mode merging of disjoint chunks == offering everything to
    one state (set-union semantics, threshold -1)."""
    bulk = CountThenEstimate(threshold=-1, p=10)
    merged = CountThenEstimate(threshold=-1, p=10)
    for i, n in enumerate(chunk_sizes):
        h = _hashes(n, seed=200 + i)
        bulk.offer_hashes(h)
        part = CountThenEstimate(threshold=-1, p=10)
        part.offer_hashes(h)
        merged = merged.merge(part)
    assert merged.cardinality() == bulk.cardinality()
    assert merged.count == bulk.count
