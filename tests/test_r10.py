"""Round-10 pins for the incremental CC dedup family: the planted
bridge-merge semantics of the contracted refresh (the one behavior the
auto-parametrized oracle harness can't isolate — it needs a corpus
engineered so one new doc bridges two existing components), delta
scoping (untouched components stay out of the refresh output), and
agreement with full re-clustering on the touched subgraph."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark.queries import ALL_QUERIES

# Planted triple (found by searching md5-simhash space; pinned as
# literals so the test is deterministic): d(A,N)=2, d(B,N)=2,
# d(A,B)=4 with SIMHASH_MAX_HAMMING=2 — so A~N and B~N are near-dup
# pairs but A~B is NOT: only the new doc N connects them.
_N_TXT = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
_A_TXT = "w0 w1 w2 w3 w4 w16 w6 w7 w8 w9 w10 w11"
_B_TXT = "w0 w1 w2 w3 w4 w17 w6 w7 w8 w9 w10 w11"


def _bridge_docs(spark):
    # base ids: % INC_MOD != 0 (A=1, B=5, unrelated=2,3); new id: 4
    rows = [
        (1, _A_TXT),
        (5, _B_TXT),
        (2, "completely different text about alpha beta gamma delta"),
        (3, "yet another unrelated document with its own vocabulary set"),
        (4, _N_TXT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cc_refresh_bridge_merges_components(spark):
    """The headline refresh semantics: base docs A and B sit in two
    DIFFERENT components (their mutual simhash distance exceeds the
    near-dup threshold), the new doc N is within threshold of BOTH —
    the refresh must merge all three into one component labeled by
    the global minimum id, relabel B (changed=True), keep A's label
    (changed=False), and exclude the untouched base docs entirely
    from the delta."""
    from tradesignal_mtm_runner_spark.queries_r10 import cc_refresh_frame

    out = {
        int(r["doc_id"]): r
        for r in cc_refresh_frame(_bridge_docs(spark)).collect()
    }
    # delta scope: A, B, N only — untouched components stay out
    assert set(out) == {1, 4, 5}
    assert out[1]["new_component"] == 1 and not out[1]["changed"]
    assert out[5]["old_component"] == 5
    assert out[5]["new_component"] == 1 and out[5]["changed"]
    assert out[4]["is_new_doc"] and out[4]["new_component"] == 1
    assert not out[1]["is_new_doc"] and not out[5]["is_new_doc"]


def test_cc_refresh_agrees_with_full_recluster(spark):
    """Semantic gold standard: for every doc the refresh touches, the
    incremental label must equal what a FULL re-clustering over
    base+batch would assign (the refresh is an optimization, not an
    approximation, whenever the touched subgraph is contraction-
    representable — which planted bridges are)."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        connected_canonical,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_HAMMING,
    )
    from tradesignal_mtm_runner_spark.queries_r10 import cc_refresh_frame

    d = _bridge_docs(spark)
    got = {
        int(r["doc_id"]): int(r["new_component"])
        for r in cc_refresh_frame(d).collect()
    }
    sig = simhash_signatures(d)
    full_pairs = simhash_near_dup_pairs(sig, max_hamming=SIMHASH_MAX_HAMMING)
    full = {
        int(r["doc_id"]): int(r["canonical_id"])
        for r in connected_canonical(
            d.select("doc_id"), full_pairs, iters=DEDUP_CC_ITERS
        ).collect()
    }
    for doc_id, comp in got.items():
        assert comp == full[doc_id], (doc_id, comp, full[doc_id])


def test_cc_refresh_real_corpus_invariants(spark):
    """Structural invariants at SF_SMOKE on the real documents table:
    labels are component minima (new_component <= every member id),
    base rows only appear relabeled-or-bridged (their old component
    was touched), and is_new_doc partitions exactly on the INC_MOD
    split."""
    from tradesignal_mtm_runner_spark.queries_pipeline_extras import INC_MOD

    rows = ALL_QUERIES["dedup_cc_refresh"](spark, SF_SMOKE).collect()
    assert rows
    by_comp: dict[int, list[int]] = {}
    for r in rows:
        by_comp.setdefault(int(r["new_component"]), []).append(int(r["doc_id"]))
        if r["is_new_doc"]:
            assert int(r["doc_id"]) % INC_MOD == 0
            assert int(r["old_component"]) == int(r["doc_id"])
        else:
            assert int(r["doc_id"]) % INC_MOD != 0
    for comp, members in by_comp.items():
        assert comp <= min(members), (comp, members)
    # at least one actual merge or assignment happened on real data
    assert any(r["changed"] for r in rows)
