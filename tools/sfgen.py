#!/usr/bin/env python
"""Derive a LARGER scale factor from the driver-shipped sf0.1 tables
(VERDICT r6 next #2): the driver ships sf ≤ 0.1 and this sandbox has no
network (DuckDB's tpch dbgen cannot install), so the 10× panel data is
DERIVED from sf0.1 with shape-aware scaling rather than naive
replication — replicas probe slope but miss data-shape effects; this
keeps the three that matter:

- **skew GROWS**: the top-decile hottest foreign keys (custkey /
  partkey / suppkey / user_id, measured from the fact tables) keep
  their ORIGINAL ids in every copy, so heavy hitters get 10× heavier —
  the way real-world key skew scales;
- **dictionaries GROW**: cold keys get per-copy offset ids (~9×
  distinct-key growth), timestamps shift per copy (the window/date
  dictionary grows), document texts are word-rotated + salted
  (distinct md5s, distinct shingle sets), embeddings get deterministic
  per-copy jitter;
- **values stay in-distribution**: prices/quantities/values jitter by
  hash-derived ±0.5% instead of duplicating exactly.

Everything is a deterministic function of (table, id, copy) via
DuckDB's hash() — re-running regenerates identical bytes. Output goes
under the repo (scratch/, gitignored), never /root/testdata.

Usage: python tools/sfgen.py [--mult 10] [--src /root/testdata/sf0.1]
                             [--out <repo>/scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "scratch", "sf1"))
    args = ap.parse_args()
    src, out, m = args.src, args.out, args.mult

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")
    con.sql(f"CREATE VIEW copies AS SELECT unnest(range(0, {m})) AS c")

    # key ranges + hot sets (top decile by fact-table frequency)
    ck = con.sql("SELECT max(c_custkey)+1 FROM customer").fetchone()[0]
    ok = con.sql("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0]
    pk = con.sql("SELECT max(p_partkey)+1 FROM part").fetchone()[0]
    sk = con.sql("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0]
    ek = con.sql("SELECT max(event_id)+1 FROM events").fetchone()[0]
    dk = con.sql("SELECT max(doc_id)+1 FROM documents").fetchone()[0]
    vk = con.sql("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0]
    for name, key, fact in [
        ("hot_cust", "o_custkey", "orders"),
        ("hot_part", "l_partkey", "lineitem"),
        ("hot_supp", "l_suppkey", "lineitem"),
        ("hot_user", "user_id", "events"),
    ]:
        con.sql(
            f"""CREATE TABLE {name} AS
            SELECT {key} AS k FROM (
              SELECT {key}, count(*) AS n,
                     percent_rank() OVER (ORDER BY count(*)) AS pr
              FROM {fact} GROUP BY {key}
            ) WHERE pr >= 0.9"""
        )

    def jit(expr: str, salt: str, pct: float = 0.005) -> str:
        """value * (1 ± pct), hash-derived, deterministic. Rounded to 2
        decimals — the source columns are all exactly 2-dec, and a
        4-dec jitter put values on .xx5 half-up boundaries where Spark
        and DuckDB round(x, 2) disagree by one cent (first sf1 gate
        run caught exactly that in store_range_read/streaming)."""
        return (
            f"round({expr} * (1.0 + {pct} * "
            f"(((hash({salt} || '|' || c::VARCHAR) % 1000)::BIGINT - 500) / 500.0)), 2)"
        )

    def write(table: str, sql: str) -> None:
        con.sql(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # small dims copy through; dictionary tables get offset copies so
    # every generated foreign key resolves
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {t}")
    write("customer", f"""
        SELECT c_custkey + c * {ck} AS c_custkey,
               c_name || CASE WHEN c=0 THEN '' ELSE '-' || c::VARCHAR END AS c_name,
               c_nationkey, {jit('c_acctbal', "'cust' || c_custkey::VARCHAR")} AS c_acctbal,
               c_mktsegment
        FROM customer CROSS JOIN copies""")
    write("supplier", f"""
        SELECT s_suppkey + c * {sk} AS s_suppkey,
               s_name || CASE WHEN c=0 THEN '' ELSE '-' || c::VARCHAR END AS s_name,
               s_nationkey, {jit('s_acctbal', "'supp' || s_suppkey::VARCHAR")} AS s_acctbal
        FROM supplier CROSS JOIN copies""")
    write("part", f"""
        SELECT p_partkey + c * {pk} AS p_partkey,
               p_name || CASE WHEN c=0 THEN '' ELSE '-' || c::VARCHAR END AS p_name,
               p_brand, p_type, p_size,
               {jit('p_retailprice', "'part' || p_partkey::VARCHAR")} AS p_retailprice
        FROM part CROSS JOIN copies""")

    # facts: hot keys keep original ids (skew grows), cold keys offset
    # (dictionary grows); dates shift one day per copy (window growth)
    write("orders", f"""
        SELECT o_orderkey + c * {ok} AS o_orderkey,
               CASE WHEN o_custkey IN (SELECT k FROM hot_cust)
                    THEN o_custkey ELSE o_custkey + c * {ck} END AS o_custkey,
               o_orderstatus,
               {jit('o_totalprice', "'ord' || o_orderkey::VARCHAR")} AS o_totalprice,
               o_orderdate + to_days(c::INTEGER) AS o_orderdate,
               o_orderpriority
        FROM orders CROSS JOIN copies""")
    write("lineitem", f"""
        SELECT l_orderkey + c * {ok} AS l_orderkey,
               CASE WHEN l_partkey IN (SELECT k FROM hot_part)
                    THEN l_partkey ELSE l_partkey + c * {pk} END AS l_partkey,
               CASE WHEN l_suppkey IN (SELECT k FROM hot_supp)
                    THEN l_suppkey ELSE l_suppkey + c * {sk} END AS l_suppkey,
               l_linenumber,
               {jit('l_quantity', "'lq' || l_orderkey::VARCHAR || l_linenumber::VARCHAR")} AS l_quantity,
               {jit('l_extendedprice', "'lp' || l_orderkey::VARCHAR || l_linenumber::VARCHAR")} AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + to_days(c::INTEGER) AS l_shipdate
        FROM lineitem CROSS JOIN copies""")
    write("events", f"""
        SELECT event_id + c * {ek} AS event_id,
               ts + to_hours(c::INTEGER) AS ts,
               CASE WHEN user_id IN (SELECT k FROM hot_user)
                    THEN user_id ELSE user_id + c * 1000000 END AS user_id,
               event_type,
               {jit('value', "'ev' || event_id::VARCHAR")} AS value,
               props
        FROM events CROSS JOIN copies""")

    # documents: copy c rotates each text by c words and salts it —
    # distinct md5s, but rotation PRESERVES most 3-word shingles, so
    # each original doc deliberately gains 9 near-copies: the derived
    # corpus carries crawl-like near-dup cliques (real web data is
    # 30-50% near-dup — dedup operators must be stressed by dup
    # structure, not just row count). Verified-pair output grows ~45x
    # per clique; see the BASELINE.md sf1 panel note on
    # doc_ngram_jaccard.
    # copy c interleaves a per-copy salt token every 4 words (plus a
    # doc-salted tail token). r8 used word ROTATION, which preserves
    # every interior word-3-gram — so the 10 copies of each doc were
    # all J≈0.9 near-dups of each other and the sf1 dup-PAIR count grew
    # quadratically (~45 cross-copy pairs per doc): the output-driven
    # exact-jaccard row alone was 26 s = 36% of the 10× panel, hiding
    # regressions in the other 30 rows (VERDICT r8 #6). Salt-interleave
    # caps cross-copy 3-gram Jaccard at ~0.25 (every 4-word run shares
    # only its 2 interior grams), far under the 0.6 entry threshold, so
    # dup pairs stay bounded by the natural copy-0 pairs + each entry's
    # own planted pairs while the corpus still 10×es for scan/shuffle
    # slope. Shingle sets stay distinct per copy (the original intent).
    write("documents", f"""
        WITH w AS (
          SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\\s+') AS ws
          FROM documents
        )
        SELECT doc_id + c * {dk} AS doc_id,
               CASE WHEN c = 0 THEN array_to_string(ws, ' ')
                    ELSE array_to_string(
                           flatten(list_transform(
                             range(1, greatest(len(ws), 1) + 1, 4),
                             i -> list_concat(
                               list_slice(ws, i, least(i + 3, len(ws))),
                               ['c' || c::VARCHAR || 's' || i::VARCHAR])
                           )), ' ')
                         || ' c' || c::VARCHAR || 'x'
                         || ((doc_id * 31 + c) % 9973)::VARCHAR
               END AS text,
               lang, source,
               CAST(NULL AS BIGINT) AS n_chars
        FROM w CROSS JOIN copies""")
    # recompute n_chars from the generated text (column must stay honest)
    con.sql(
        f"""COPY (
          SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
          FROM '{out}/documents.parquet'
        ) TO '{out}/documents2.parquet' (FORMAT PARQUET)"""
    )
    os.replace(f"{out}/documents2.parquet", f"{out}/documents.parquet")

    # embeddings: per-copy deterministic jitter of each component
    # (±1%), labels preserved — 10× corpus, vectors in-distribution
    # but distinct
    write("embeddings", f"""
        SELECT vec_id + c * {vk} AS vec_id,
               CASE WHEN c = 0 THEN embedding
                    ELSE list_transform(
                           list_zip(embedding,
                                    range(1, len(embedding) + 1)),
                           z -> (z[1] * (1.0 + 0.01 *
                                 (((hash(vec_id::VARCHAR || '|' || c::VARCHAR
                                        || '|' || z[2]::VARCHAR) % 200)::BIGINT
                                   - 100) / 100.0)))::FLOAT)
               END AS embedding,
               label
        FROM embeddings CROSS JOIN copies""")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
