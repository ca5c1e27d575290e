"""Behavior contract + head-to-head parity for data_struct — the
API-parity twins of the reference's pure-python search structures
(reference data_struct.py:8-250, reference tests/test_data_struct.py).

Three layers: (1) the reference test suite's own scenarios, ported;
(2) spec tests (slices vs bisect ground truth, pruned range_search vs
a full in-order walk); (3) when the reference package is importable
(read from /root/reference/src, never copied — the
test_reference_parity.py convention), randomized head-to-head equality
of every observable: search result types, org_inx, payloads, slices,
and the tree REPR (shape identity — our O(N) direct bisection build
must produce the exact tree the reference grows insert-by-insert)."""

from __future__ import annotations

import bisect
import math
import random
import sys

import pytest

from tradesignal_mtm_runner_spark.data_struct import (
    BTree,
    IndexedList,
    Node,
    SearchResultType,
)

REF_SRC = "/root/reference/src"


def _ref_module():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        from tradesignal_mtm_runner import data_struct as ref

        return ref
    except Exception:  # noqa: BLE001
        return None


# --- (1) the reference suite's scenarios --------------------------------------


def test_node_struct_reference_scenario():
    samples = [5, 3, 1, 8, 7, 6, 10, 2, 9, 11, 4]
    payload = {c: chr(c + 64) for c in samples}
    node = Node(samples[0], org_inx=0, payload=payload[samples[0]])
    for i in range(1, len(samples)):
        node.insert(samples[i], i, payload[samples[i]])

    n, s = node.search_value(10)
    assert (n.payload, n.org_inx, s) == (chr(74), 6, SearchResultType.Exact)
    n, s = node.search_value(7.5)
    assert (n.payload, s) == (chr(71), SearchResultType.LargestValueJustSmaller)
    n, s = node.search_value(1.5)
    assert (n.payload, s) == (chr(66), SearchResultType.SmallestValueJustLarger)
    for inx, sample in enumerate(samples):
        n, s = node.search_value(sample)
        assert (n.payload, n.org_inx, s) == (
            payload[sample],
            inx,
            SearchResultType.Exact,
        )


def test_empty_and_singleton_list():
    assert IndexedList(base_list=[]).search_value_left(5) == []
    assert IndexedList(base_list=[]).search_closet_value(5) == (
        None,
        SearchResultType.EmptyList,
    )
    assert IndexedList(base_list=[0]).search_value_left(5) == [0]


def test_index_the_list_triangular_scenario():
    samples = [int(i * (i + 1) / 2) for i in range(10)]
    il = IndexedList(base_list=samples)
    node = il._index_the_list()
    for inx, sample in enumerate(samples):
        n, s = node.search_value(sample)
        assert (n.value, n.org_inx, n.payload) == (sample, inx, sample)
        assert n.org_inx == int((math.sqrt(1 + 8 * sample) - 1) / 2)
        assert s == SearchResultType.Exact

    assert il.search_value(samples[-1]).org_inx == len(samples) - 1
    pick = len(samples) // 2
    v = samples[pick]
    assert il.search_value_left(v) == samples[: pick + 1]
    assert il.search_value_left(v - 1) == samples[:pick]
    assert il.search_value_left(v + 1) == samples[: pick + 1]
    assert il.search_value_right(v) == samples[pick:]
    assert il.search_value_right(v + 1) == samples[pick + 1 :]


# --- (2) spec tests ------------------------------------------------------------


def test_slices_match_bisect_ground_truth():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(0, 40)
        lst = sorted(rng.sample(range(-100, 100), n))
        il = IndexedList(base_list=lst)
        for probe in range(-105, 105, 3):
            left = il.search_value_left(probe)
            right = il.search_value_right(probe)
            if not lst:
                assert left == [] and right == []
                continue
            # ground truth: prefix of values <= probe, suffix >= probe
            assert left == lst[: bisect.bisect_right(lst, probe)], (lst, probe)
            assert right == lst[bisect.bisect_left(lst, probe) :], (lst, probe)


def test_btree_search_and_pruned_range_search():
    rng = random.Random(11)
    vals = rng.sample(range(0, 1000), 200)
    bt = BTree(vals[0])
    for v in vals[1:]:
        bt.insert(v)
    present = set(vals)
    for v in range(0, 1000, 7):
        got = bt.search(v)
        assert got == (v if v in present else f"{v} Not Found")
    for lo, hi in [(0, 999), (100, 500), (501, 100), (873, 873), (-5, 3)]:
        assert bt.range_search(lo, hi) == sorted(
            v for v in present if lo <= v <= hi
        )


# --- (3) randomized head-to-head vs the actual reference ----------------------


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_head_to_head_vs_reference(seed):
    ref = _ref_module()
    if ref is None:
        pytest.skip("reference package not importable")
    rng = random.Random(seed)

    # Node: identical insertion order => identical shape => identical
    # (payload, org_inx, result-type) for every probe, absent or not
    samples = rng.sample(range(0, 500), 60)
    ours = Node(samples[0], 0, f"p{samples[0]}")
    theirs = ref.Node(samples[0], 0, f"p{samples[0]}")
    for i, v in enumerate(samples[1:], start=1):
        ours.insert(v, i, f"p{v}")
        theirs.insert(v, i, f"p{v}")
    for probe in [v + d for v in samples for d in (0, 0.5, -0.5)]:
        n_a, s_a = ours.search_value(probe)
        n_b, s_b = theirs.search_value(probe)
        assert (n_a.payload, n_a.org_inx, s_a.value) == (
            n_b.payload,
            n_b.org_inx,
            s_b.value,
        ), probe

    # IndexedList: tree shape identity (repr) + every observable on a
    # sorted unique list, including the shape-dependent neighbor tag
    lst = sorted(rng.sample(range(-1000, 1000), 97))
    il_a, il_b = IndexedList(lst), ref.IndexedList(lst)
    assert repr(il_a.node).replace(" ", "") == repr(il_b.node).replace(" ", "")
    for probe in [v + d for v in lst for d in (0, 1, -1)] + [-2000, 2000]:
        na, sa = il_a.search_closet_value(probe)
        nb, sb = il_b.search_closet_value(probe)
        assert (na.org_inx, sa.value) == (nb.org_inx, sb.value), probe
        assert il_a.search_value_left(probe) == il_b.search_value_left(probe)
        assert il_a.search_value_right(probe) == il_b.search_value_right(probe)

    # BTree: same insertion order, full search + range parity. Values
    # start at 1: the reference's insert tests `if self.data:` (falsy
    # zero), so a node holding 0 is OVERWRITTEN by the next value
    # routed through it — a reference bug we fix rather than replicate
    # (the helper.py convention; pinned below).
    vals = rng.sample(range(1, 300), 40)
    bt_a, bt_b = BTree(vals[0]), ref.BTree(vals[0])
    for v in vals[1:]:
        bt_a.insert(v)
        bt_b.insert(v)
    for probe in range(0, 300, 3):
        assert bt_a.search(probe) == bt_b.search(probe)
    for lo, hi in [(0, 299), (50, 200), (250, 10)]:
        assert bt_a.range_search(lo, hi) == bt_b.range_search(lo, hi)


def test_btree_keeps_zero_where_reference_loses_it():
    """Documented divergence: inserting through a node that holds 0
    must not clobber it. The reference's `if self.data:` branch treats
    a 0-valued node as 'empty' and overwrites it with the incoming
    value (observable: 0 vanishes, the router value duplicates); ours
    checks `is None` and keeps both."""
    bt = BTree(5)
    bt.insert(0)
    bt.insert(3)  # routes through the 0 node (3 > 0 goes to its right)
    assert bt.search(0) == 0
    assert bt.range_search(-10, 10) == [0, 3, 5]
    ref = _ref_module()
    if ref is not None:
        rbt = ref.BTree(5)
        rbt.insert(0)
        rbt.insert(3)
        assert rbt.search(0) == "0 Not Found"  # the bug, pinned


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_indexed_list_duplicate_values_match_reference(seed):
    """ADVICE r12: with DUPLICATE values the direct-bisection tree can
    diverge from the reference's insert-by-midpoint build (equal
    values route right past their bisection slot), so duplicate lists
    replay the reference's insertion order. Pin shape identity and
    every observable on duplicate-heavy sorted lists, including the
    advisor's counterexample."""
    ref = _ref_module()
    if ref is None:
        pytest.skip("reference package not importable")

    cases = [[2, 3, 3, 4, 6, 6]]
    rng = random.Random(seed)
    for _ in range(6):
        n = rng.randint(1, 60)
        cases.append(sorted(rng.choice([rng.randint(0, 12), rng.randint(0, 400)])
                            for _ in range(n)))
    for lst in cases:
        il_a, il_b = IndexedList(lst), ref.IndexedList(lst)
        assert repr(il_a.node).replace(" ", "") == repr(il_b.node).replace(
            " ", ""
        ), lst
        probes = sorted({v + d for v in lst for d in (0, 1, -1)} | {-5, 10**6})
        for probe in probes:
            na, sa = il_a.search_closet_value(probe)
            nb, sb = il_b.search_closet_value(probe)
            assert (na.org_inx, sa.value) == (nb.org_inx, sb.value), (lst, probe)
            assert il_a.search_value_left(probe) == il_b.search_value_left(probe)
            assert il_a.search_value_right(probe) == il_b.search_value_right(
                probe
            )
