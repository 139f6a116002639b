"""Training-data export: deterministic global shuffle into shards, and
temperature-scaled domain mixing.

The last mile of a curation pipeline (north-star M8 family): after
dedup/filter/pack, the corpus is (a) re-mixed across sources to a target
distribution and (b) globally shuffled into equal shards so a data
loader can stream shard files without any train-time shuffle buffer.

Scale design — both ops are ROW-LOCAL decisions plus one tiny aggregate:

- ``shuffled_shards``: shard + in-shard position derive from a per-row
  hash; no global sort, no window over the whole corpus. The in-shard
  position is a window per shard — shards are sized (corpus/num_shards)
  so each window partition is one writer task's worth, exactly the unit
  a sharded parquet/jsonl export writes anyway. Order within a shard is
  the hash order, i.e. a uniform random permutation of the corpus,
  reproducible from (seed, id) alone on any engine.
- ``temperature_mixture``: per-source rates come from one
  count-by-source aggregate (S rows, broadcast back); keep/drop is then
  a row-local hash threshold — zero corpus shuffle, exactly the
  ``stratified_sample`` shape (``operators/cleaning.py``) with the rate
  VECTOR computed from the temperature formula instead of given.

Both default to the portable md5-derived hash (`same construction in
DuckDB: ('0x' || substring(md5(..),1,8))::BIGINT`) so the driver gate
value-verifies the exact kept set / shard assignment; production can
flip ``portable=False`` for xxhash64 (one native hash vs md5 + hex
parse), the same prod/portable split as ``sketch.cms_build``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32 — md5-prefix hash space


def _hash_u32(col: Column, seed: int, salt: str, portable: bool) -> Column:
    """Uniform 32-bit int from (seed, salt, value). Portable form: first
    8 hex chars of md5 — every primitive exists in ANSI SQL/DuckDB.
    Prod form: xxhash64 folded to 32 bits (cheaper, engine-native)."""
    tagged = F.concat_ws("|", F.lit(str(seed)), F.lit(salt), col.cast("string"))
    if portable:
        return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(tagged), F.lit(int(_U32))).cast("long")


def shuffled_shards(
    df: DataFrame,
    num_shards: int,
    seed: int = 42,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Deterministic global shuffle: adds (shard, pos) — shard ∈
    [0, num_shards), pos = 1-based position within the shard under the
    hash permutation. Same (seed, id) ⇒ same placement on any engine and
    any partitioning (unlike ``orderBy(rand())``, whose seed is
    per-partition and repartition-sensitive).

    Shard assignment is row-local; the in-shard ordering window
    shuffles each row once on its shard key. Ties in the 32-bit order
    hash break by id, so positions are total and reproducible."""
    okey = _hash_u32(F.col(id_col), seed, "order", portable)
    shard = F.pmod(_hash_u32(F.col(id_col), seed, "shard", portable), F.lit(num_shards))
    w = Window.partitionBy("shard").orderBy(F.col("_okey").asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard.cast("long"))
        .withColumn("_okey", okey)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_okey")
    )


def shard_manifest(
    sharded: DataFrame, id_col: str = "doc_id", token_col: str | None = None
) -> DataFrame:
    """Per-shard export ledger: row count, id-sum checksum (order-free,
    verifies the partition is exactly the claimed id set), and the id
    landing at the first/last position (verifies the permutation
    itself). One aggregate over the sharded frame."""
    first_id = F.min(F.when(F.col("pos") == 1, F.col(id_col)))
    last_id = F.min(F.when(F.col("pos") == F.col("_n"), F.col(id_col)))
    w = Window.partitionBy("shard")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(id_col)).alias("id_checksum"),
        first_id.alias("first_id"),
        last_id.alias("last_id"),
    ]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).alias("n_tokens"))
    return (
        sharded.withColumn("_n", F.max("pos").over(w))
        .groupBy("shard")
        .agg(*aggs)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_rows: int | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Temperature-scaled mixture sampling: re-weights sources to
    p_g ∝ n_g^alpha (alpha < 1 up-samples the tail relative to the head
    — the multilingual/domain-balancing rule of mBERT/XLM-R-style
    pipelines), then keeps each row iff its uniform hash falls under its
    source's rate. alpha=1 preserves the natural mix; alpha=0 equalizes
    sources.

    rate_g = min(1, target_rows·p_g / n_g) — single-pass, no
    redistribution of quota a capped source can't absorb (documented:
    the realized total can undershoot target_rows when a tail source
    saturates; re-run with a higher target to compensate).

    Adds (rate, kept) — callers filter on ``kept`` and drop the columns.
    The keep decision is row-local (hash < rate); the only exchange is
    the S-row source-count aggregate, broadcast back onto the corpus."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    wsum = counts.agg(
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))).alias("_wsum")
    )
    if target_rows is None:
        rate = F.lit(1.0)
    else:
        rate = F.least(
            F.lit(1.0),
            F.lit(float(target_rows))
            * F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
            / F.col("_wsum")
            / F.col("_n").cast("double"),
        )
    rates = counts.crossJoin(F.broadcast(wsum)).select(group_col, "_n", rate.alias("rate"))
    u = _hash_u32(F.col(id_col), seed, "mix", portable) / F.lit(_U32)
    return (
        df.join(F.broadcast(rates.drop("_n")), group_col)
        .withColumn("kept", u < F.col("rate"))
    )


def unimax_mixture(
    df: DataFrame,
    group_col: str = "lang",
    budget_rows: int = 1000,
    epochs_cap: float = 2.0,
    seed: int = 42,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining") — the OTHER published mixing rule next to temperature
    scaling: spread a total row budget as uniformly as possible across
    groups, but cap any group at ``epochs_cap`` passes over its data
    (temperature re-weighting has no such cap, so at small alpha a tiny
    language gets epoched dozens of times and memorized).

    Waterfilling, closed form instead of the paper's sequential loop:
    sort groups by cap = epochs_cap·n ascending; with prefix sums the
    fair share at position k (assuming 1..k-1 capped) is
    τ_k = (B − cum_{k−1})/(L−k+1); capped groups form a prefix, τ is
    τ_k at the first uncapped position (the maximum over uncapped rows
    — τ_k decreases from there on), and alloc = min(cap, τ). When the
    whole corpus fits the budget (Σcap ≤ B) every group is capped and
    the budget is under-used by design. All of it is two windows over
    the L-row group-count table — never a corpus-side loop.

    epochs = alloc/n may exceed 1 (up-sampling): per doc,
    n_copies = floor(epochs) + (portable hash < frac(epochs)), so the
    realized copy counts are row-local, engine-reproducible, and sum to
    ≈alloc per group. Output adds (epochs, n_copies); callers explode
    ``sequence(1, n_copies)`` to materialize the mix.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w_sorted = Window.orderBy(F.asc("_cap"), F.asc(group_col))
    w_all = Window.partitionBy()
    caps = (
        counts.withColumn("_cap", F.lit(float(epochs_cap)) * F.col("_n"))
        .withColumn("_rn", F.row_number().over(w_sorted))
        .withColumn(
            "_cum_before",
            F.coalesce(
                F.sum("_cap").over(w_sorted.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .withColumn("_L", F.count(F.lit(1)).over(w_all))
    )
    tau_k = (F.lit(float(budget_rows)) - F.col("_cum_before")) / (
        F.col("_L") - F.col("_rn") + 1
    )
    caps = caps.withColumn("_tau_k", tau_k)
    tau_row = caps.agg(
        F.max(F.when(F.col("_cap") >= F.col("_tau_k"), F.col("_tau_k"))).alias("_tau")
    )
    alloc = F.least(F.col("_cap"), F.coalesce(F.col("_tau"), F.col("_cap")))
    rates = (
        caps.crossJoin(F.broadcast(tau_row))
        .withColumn("_alloc", alloc)
        .select(
            group_col,
            (F.col("_alloc") / F.col("_n")).alias("epochs"),
        )
    )
    u = _hash_u32(F.col(id_col), seed, "unimax", portable) / F.lit(_U32)
    ep = F.col("epochs")
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn(
            "n_copies",
            (F.floor(ep) + (u < (ep - F.floor(ep))).cast("long")).cast("long"),
        )
    )
