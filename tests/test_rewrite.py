"""SURVEY §7.2 stretch — the logical ORDER BY cosine DESC LIMIT k
rewrite onto the IVF-pruned path: the rewrite must FIRE (partition
filters in the rewritten plan), reproduce the exact answer at
nprobe >= nlist, and leave every non-matching plan untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.functions.vector import cosine_similarity
from deployment_spark.operators.ivf import IVFIndex
from deployment_spark.plans import audit
from deployment_spark.plans.rewrite import match_topk_cosine, rewrite_topk_onto_ivf


@pytest.fixture(scope="module")
def ivf(spark, sf_dir, tmp_path_factory):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = str(tmp_path_factory.mktemp("rewrite_ivf"))
    return IVFIndex(spark, root).build(emb, nlist=8), emb


def _qvec(emb):
    row = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0]
    return [float(x) for x in row.embedding]


def test_match_extracts_k_col_and_vector(spark, ivf):
    _, emb = ivf
    qvec = _qvec(emb)
    df = emb.orderBy(cosine_similarity("embedding", F.lit(qvec)).desc()).limit(7)
    m = match_topk_cosine(df)
    assert m is not None
    assert m["k"] == 7 and m["corpus_col"] == "embedding"
    assert m["qvec"] == pytest.approx(qvec)


def test_rewrite_fires_prunes_and_is_exact_at_full_probe(spark, ivf):
    index, emb = ivf
    qvec = _qvec(emb)
    df = emb.orderBy(cosine_similarity("embedding", F.lit(qvec)).desc()).limit(10)
    routed = rewrite_topk_onto_ivf(df, index, nprobe=10**9)
    assert routed is not df  # fired
    # the IVF scan is partition-pruned (trivially all-lists here; the
    # nprobe<nlist pruning plan itself is pinned in test_ivf.py)
    assert routed.columns == df.columns
    got = [r.vec_id for r in routed.collect()]
    want = [r.vec_id for r in df.collect()]
    # same top-k SET; order may differ only among exact ties
    assert set(got) == set(want)
    assert got[0] == 3  # self-query at rank 1
    sims = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", cosine_similarity("embedding", F.lit(qvec)).alias("s")
        ).collect()
    }
    assert [round(sims[g], 9) for g in got] == sorted(
        (round(sims[w], 9) for w in want), reverse=True
    )


def test_rewrite_prunes_partitions_at_low_nprobe(spark, ivf):
    index, emb = ivf
    qvec = _qvec(emb)
    df = emb.orderBy(cosine_similarity("embedding", F.lit(qvec)).desc()).limit(5)
    routed = rewrite_topk_onto_ivf(df, index, nprobe=2)
    assert routed is not df
    assert audit.has_partition_filters(routed), audit.physical_plan(routed)
    assert routed.count() == 5


def test_non_matching_plans_come_back_unchanged(spark, ivf):
    index, emb = ivf
    qvec = _qvec(emb)
    cos = cosine_similarity("embedding", F.lit(qvec))
    no_limit = emb.orderBy(cos.desc())
    asc_sort = emb.orderBy(cos.asc()).limit(5)
    not_cosine = emb.orderBy(F.col("vec_id").desc()).limit(5)
    col_vector = emb.orderBy(
        cosine_similarity("embedding", "embedding").desc()
    ).limit(5)
    for q in (no_limit, asc_sort, not_cosine, col_vector):
        assert rewrite_topk_onto_ivf(q, index) is q


def test_row_removing_children_block_the_rewrite(spark, ivf):
    """A Filter/Sample/Limit between the Sort and the corpus makes a
    whole-corpus index answer WRONG (review finding r5): the child has
    dropped rows the index still returns, and the join-back silently
    loses in-filter candidates. Such plans must come back untouched."""
    index, emb = ivf
    qvec = _qvec(emb)
    cos = cosine_similarity("embedding", F.lit(qvec))
    filtered = emb.filter(F.col("vec_id") >= 100).orderBy(cos.desc()).limit(10)
    sampled = emb.sample(0.5, seed=1).orderBy(cos.desc()).limit(10)
    limited = emb.limit(50).orderBy(cos.desc()).limit(10)
    for q in (filtered, sampled, limited):
        assert rewrite_topk_onto_ivf(q, index) is q
    # and the filtered plan's own answer stays correct + complete
    assert filtered.count() == 10
    assert all(r.vec_id >= 100 for r in filtered.collect())
    # projection-only children still fire
    projected = emb.select("vec_id", "embedding").orderBy(cos.desc()).limit(5)
    assert rewrite_topk_onto_ivf(projected, index, nprobe=10**9) is not projected


def test_rank_payload_column_does_not_break_the_rewrite(spark, ivf):
    """A child payload column named 'rank' must not make the join-back
    ambiguous (the safe-no-op/never-crash contract): the rewrite still
    fires and returns the child's own columns, 'rank' payload intact."""
    index, emb = ivf
    qvec = _qvec(emb)
    with_rank = emb.withColumn("rank", F.col("vec_id") % 7)
    df = with_rank.orderBy(
        cosine_similarity("embedding", F.lit(qvec)).desc()
    ).limit(5)
    out = rewrite_topk_onto_ivf(df, index, nprobe=8)
    rows = out.collect()  # must not raise AMBIGUOUS_REFERENCE
    assert len(rows) == 5
    assert set(out.columns) == set(with_rank.columns)
    assert all(r.rank == r.vec_id % 7 for r in rows)  # payload survived
    assert rows[0].vec_id == 3  # self-query still first


def test_case_insensitive_rank_collision(spark, ivf):
    """Spark resolution is case-insensitive by default, so a payload
    column '_IVF_RANK' must also be dodged by the alias probe."""
    index, emb = ivf
    qvec = _qvec(emb)
    with_rank = emb.withColumn("_IVF_RANK", F.lit(1))
    df = with_rank.orderBy(
        cosine_similarity("embedding", F.lit(qvec)).desc()
    ).limit(4)
    out = rewrite_topk_onto_ivf(df, index, nprobe=8)
    rows = out.collect()  # must not raise AMBIGUOUS_REFERENCE
    assert len(rows) == 4 and set(out.columns) == set(with_rank.columns)
