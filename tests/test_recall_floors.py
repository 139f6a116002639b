"""Self-judging recall entries (VERDICT r2 item 2): each recall catalog
entry carries a machine-readable ``meets_floor`` column; these tests pin
the floors at sf0.01 — the SF the driver's correctness gate runs — so a
recall regression turns a test (and the driver row) red instead of
silently shipping a worse number.

Floors (measured r3, see queries.py constants):
- IVF nprobe 10/16:            mean recall@10 >= 0.85 (measured 0.89)
- PQ m=16 ksub=256 ADC-only:   mean recall@10 >= 0.80 (measured 0.835)
- PQ shortlist-50 re-rank:     mean recall@10 >= 0.95 (measured 1.00)
- IVFxPQ nprobe 5/8 re-rank:   mean recall@10 >= 0.85 (measured 0.875)
- SQ8 ADC-only (r5):           mean recall@10 >= 0.95 (measured 1.00)
- SQ8 shortlist-50 re-rank:    mean recall@10 >= 0.98 (measured 1.00)
"""

from __future__ import annotations

import os

import pytest

SF001 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF001), reason="sf0.01 fixture absent"
)


def _floor_rows(fn, spark):
    rows = fn(spark, SF001).collect()
    assert rows, "recall entry returned no rows"
    return rows


def test_ivf_recall_meets_floor(spark):
    from deployment_spark.queries import q_ivf_recall

    rows = _floor_rows(q_ivf_recall, spark)
    assert all(r.meets_floor for r in rows), rows[0].mean_recall


def test_pq_recall_meets_floor(spark):
    from deployment_spark.queries import q_pq_recall

    rows = _floor_rows(q_pq_recall, spark)
    assert all(r.meets_floor for r in rows), (
        rows[0].mean_recall_adc,
        rows[0].mean_recall_rerank,
        rows[0].mean_recall_batch,
    )
    # the sweep's chosen geometry clears the stretch target too: exact
    # re-rank stays effectively lossless on this fixture
    assert rows[0].mean_recall_rerank >= 0.98
    # the corpus-scale batch route computes the SAME ADC math as the
    # interactive path (identical per-query LUT expressions), so its
    # recall must EQUAL the adc column — not just clear a floor
    assert rows[0].mean_recall_batch == rows[0].mean_recall_adc


def test_ivfpq_recall_meets_floor(spark):
    from deployment_spark.queries import q_ivfpq_recall

    rows = _floor_rows(q_ivfpq_recall, spark)
    assert all(r.meets_floor for r in rows), (
        rows[0].mean_recall_rerank,
        rows[0].mean_recall_batch,
    )


def test_sq_recall_meets_floor(spark):
    from deployment_spark.queries import q_sq_recall

    rows = _floor_rows(q_sq_recall, spark)
    assert all(r.meets_floor for r in rows), (
        rows[0].mean_recall_adc,
        rows[0].mean_recall_rerank,
        rows[0].mean_recall_batch,
    )


def test_ivfsq_recall_meets_floor(spark):
    from deployment_spark.queries import q_ivfsq_recall

    rows = _floor_rows(q_ivfsq_recall, spark)
    assert all(r.meets_floor for r in rows), (
        rows[0].mean_recall_adc,
        rows[0].mean_recall_rerank,
        rows[0].mean_recall_batch,
    )


def test_ivf_batch_recall_meets_floor(spark):
    """r8: the corpus-scale batch path on the exact-by-construction
    big-nlist fixture — floor is EQUALITY at 1.0 (any routing/grouping/
    id-transport error is a hard red, not a recall dip)."""
    from deployment_spark.queries import q_ivf_batch_recall

    rows = _floor_rows(q_ivf_batch_recall, spark)
    assert all(r.meets_floor for r in rows), rows[0].mean_recall
    assert all(abs(r.mean_recall - 1.0) < 1e-9 for r in rows)


def test_ivf_graph_recall_meets_floor(spark):
    """r10 (V8 closure): the graph-assisted arm must clear its floor AND
    strictly lift the deliberately starved seed — the monotone-superset
    argument made measurable."""
    from deployment_spark.queries import q_ivf_graph_recall

    rows = _floor_rows(q_ivf_graph_recall, spark)
    assert all(r.meets_floor for r in rows), (
        rows[0].mean_recall_seed, rows[0].mean_recall_graph
    )
    assert rows[0].mean_recall_graph > rows[0].mean_recall_seed


def test_maxsim_two_stage_recall_meets_floor(spark):
    """r12 (VERDICT r11 #3): the two-stage maxsim path at the
    SCALE-DERIVED operating point (k_per_token from
    reference_k_per_token, token-index nlist from reference_nlist)
    clears its end-to-end floor — the fixed r11 point decayed 0.91→0.42
    over a 16× corpus (maxsim_probe); the derived point is held to a
    published floor like every other approximate surface."""
    from deployment_spark.queries import q_maxsim_recall

    rows = _floor_rows(q_maxsim_recall, spark)
    assert all(r.meets_floor for r in rows), rows[0].mean_recall

def test_maxsim_stream_recall_meets_floor(spark):
    """r13 (VERDICT r12 Missing #1): the two-stage pipeline served from
    the STREAMING-MAINTAINED token index — four batches plus a
    mid-stream delete healed by the exact tombstone repair — holds the
    same floor against the exact maxsim ranking over the survivors."""
    from deployment_spark.queries import q_maxsim_stream_recall

    rows = _floor_rows(q_maxsim_stream_recall, spark)
    assert all(r.meets_floor for r in rows), rows[0].mean_recall
