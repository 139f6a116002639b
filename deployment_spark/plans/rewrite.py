"""Logical top-k-cosine rewrite onto the IVF path (SURVEY §7.2 stretch).

The survey flags an optional ``SparkSessionExtensions`` rule that would
auto-rewrite ``ORDER BY cosine_similarity(vec, lit(q)) DESC LIMIT k``
onto the IVF partition-pruned search plan (the reference's
``index.nprobe = 10`` operating point, ``FAISS/PlainDemo/pipeline.py:
257,316-321``). A true extensions rule needs compiled Scala; the same
rewrite is expressed here at the logical-plan level in Python:

1. pattern-match the ANALYZED plan ``GlobalLimit(LocalLimit(Sort))``
   with a single DESC sort key,
2. loosely parse (corpus column, query-vector literal) candidates out
   of the sort expression's SQL rendering,
3. VERIFY the parse by regenerating ``cosine_similarity(col,
   lit(vec))`` through the same rendering path and requiring the SQL
   byte-equal — a lookalike expression with different semantics cannot
   slip through; the rewrite either proves the sort key is exactly our
   cosine or leaves the plan untouched,
4. route the query through ``IVFIndex.search`` (partition-pruned scan)
   and join the surviving ids back to the ORIGINAL child plan, so the
   output carries exactly the input's columns.

``rewrite_topk_onto_ivf`` is a safe no-op: any non-matching plan comes
back unchanged. Ties at the boundary differ from the raw sort (the
index breaks them deterministically by id; a bare ``orderBy`` leaves
tie order unspecified), and nprobe < nlist trades recall for pruning
exactly as the index does — nprobe >= nlist reproduces the exact
answer (pinned in tests/test_rewrite.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_COL = re.compile(r"aggregate\((?:cast\()?([A-Za-z_][A-Za-z0-9_]*)[,) ]")
_ARRAY_LIT = re.compile(r"array\(([-+0-9DFEe., ]+)\)")


def _analyzed(df: DataFrame):
    return df._jdf.queryExecution().analyzed()


def _sort_expr_sql(df: DataFrame) -> str:
    """SQL rendering of the single sort key of GlobalLimit(LocalLimit(
    Sort)) — the comparison key for byte-exact verification."""
    sort = _analyzed(df).children().apply(0).children().apply(0)
    return sort.order().apply(0).child().sql()


def _child_df(df: DataFrame) -> DataFrame:
    """Rehydrate the Sort's child logical plan as a DataFrame."""
    spark = df.sparkSession
    child = (
        _analyzed(df).children().apply(0).children().apply(0).children().apply(0)
    )
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, child
    )
    return DataFrame(jdf, spark)


# node kinds that neither add nor remove rows: the ONLY shapes allowed
# between the Sort and the scanned corpus. A Filter/Sample/Join/Limit in
# the child would make the whole-corpus index answer wrong (the index
# would return top-k over rows the child has dropped), so anything not
# on this list blocks the rewrite — safe no-op over silent wrongness.
_ROW_PRESERVING = {
    "Project", "SubqueryAlias", "LogicalRelation", "Relation", "View",
    "InMemoryRelation",
}


def _child_is_row_preserving(plan) -> bool:
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() not in _ROW_PRESERVING:
            return False
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return True


def match_topk_cosine(df: DataFrame) -> dict | None:
    """Return {'k', 'corpus_col', 'qvec'} when ``df`` is exactly an
    ORDER BY cosine_similarity(col, lit(vec)) DESC LIMIT k plan over a
    ROW-PRESERVING child (projections over the scanned corpus — no
    filters/samples/joins, which would invalidate a whole-corpus index
    answer) that still carries ``col``; None otherwise."""
    from deployment_spark.functions.vector import cosine_similarity

    try:
        p = _analyzed(df)
        if p.nodeName() != "GlobalLimit":
            return None
        k = int(p.limitExpr().toString())
        c1 = p.children().apply(0)
        if c1.nodeName() != "LocalLimit":
            return None
        sort = c1.children().apply(0)
        if sort.nodeName() != "Sort" or sort.order().size() != 1:
            return None
        so = sort.order().apply(0)
        if so.direction().sql() != "DESC":
            return None
        if not _child_is_row_preserving(sort.children().apply(0)):
            return None
        expr_sql = so.child().sql()
    except Exception:
        return None

    cols = set(_AGG_COL.findall(expr_sql))
    vecs = []
    for body in _ARRAY_LIT.findall(expr_sql):
        try:
            vecs.append([float(tok.rstrip("DF")) for tok in body.split(",")])
        except ValueError:
            continue
    if not cols or not vecs:
        return None
    child = _child_df(df)
    for col in cols:
        if col not in child.columns:
            continue
        for vec in vecs:
            probe = child.orderBy(
                cosine_similarity(col, F.lit(vec)).desc()
            ).limit(k)
            try:
                if _sort_expr_sql(probe) == expr_sql:
                    return {"k": k, "corpus_col": col, "qvec": vec}
            except Exception:
                continue
    return None


def rewrite_topk_onto_ivf(
    df: DataFrame,
    index,
    nprobe: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Rewrite a matched top-k-cosine plan onto ``index`` (an
    ``IVFIndex`` whose corpus rows are keyed like the plan's child by
    ``id_col``); return ``df`` unchanged when the pattern doesn't match
    or the child lacks ``id_col``. The caller asserts, as with any
    index hint, that the index was built over the same vectors the
    plan sorts by."""
    m = match_topk_cosine(df)
    if m is None:
        return df
    child = _child_df(df)
    if id_col not in child.columns:
        return df
    spark = df.sparkSession
    queries = spark.createDataFrame(
        [(0, [float(x) for x in m["qvec"]])], ["query_id", "query_vec"]
    )
    # the hits' ordering column must not collide with a child payload
    # column (a child named 'rank' would make the join ambiguous and
    # crash — violating the safe-no-op contract); pick a fresh name,
    # comparing case-insensitively because Spark resolution is
    # case-insensitive by default ('_IVF_RANK' collides too)
    taken = {c.lower() for c in child.columns}
    rank_col = "_ivf_rank"
    while rank_col.lower() in taken:
        rank_col = "_" + rank_col
    hits = (
        index.search(queries, k=m["k"], nprobe=nprobe, id_col=id_col)
        .select(id_col, F.col("rank").alias(rank_col))
    )
    return (
        child.join(F.broadcast(hits), on=id_col)
        .orderBy(rank_col)
        .select(*child.columns)
    )
