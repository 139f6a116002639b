"""Greedy sequence packing — the training-sample assembly step: fill
fixed token-budget packs (context windows) with documents so padding is
minimized. The industry-standard greedy first-fit-in-order policy, made
deterministic (docs are packed in id order within a shard) so results
are reproducible and oracle-checkable.

Scale shape: packing is SHARD-LOCAL by design — each shard packs its own
documents independently (``applyInPandas`` per shard), which is exactly
how production packers parallelize; cross-shard packing would serialize
the corpus for a <1% fill-rate gain. Shuffle is one exchange on the
shard key; shard count = desired parallelism.

A document larger than the budget gets a pack of its own (callers chunk
oversized docs first — see ``textstats.chunk_text``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType




def pack_greedy(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign every document a (shard, pack_id): greedy first-fit in
    ascending id order per shard; a new pack opens when the next doc
    would overflow ``budget``. Output one row per document, with the
    CALLER'S column names (shard_col, 'pack_id', id_col, token_col)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    schema = StructType(
        [
            StructField(shard_col, LongType()),
            StructField("pack_id", LongType()),
            StructField(id_col, LongType()),
            StructField(token_col, LongType()),
        ]
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        pack_ids = []
        pid, fill = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                pid, fill = pid + 1, 0
            fill += t
            pack_ids.append(pid)
        return pd.DataFrame(
            {
                shard_col: key[0],
                "pack_id": pack_ids,
                id_col: pdf[id_col],
                token_col: pdf[token_col],
            }
        )

    src = df.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
    )
    return src.groupBy(shard_col).applyInPandas(pack, schema=schema)
