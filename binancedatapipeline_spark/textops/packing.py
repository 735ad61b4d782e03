"""Sequence packing: assign documents to token-budget training bins.

Training-data pipelines batch documents into fixed-token-budget
sequences (e.g. 4k-token context windows). The deterministic
contiguous form used here: within each group, documents in a stable
order fill bins of ``budget`` tokens; a document's bin is the number
of whole budgets consumed before it starts::

    seq_id = floor(tokens_before_this_doc / budget)

A document may straddle a boundary (its tail spills into the next
bin) — that is the standard "pack then split" approximation, and it
keeps the operator a pure window expression instead of an iterative
bin-packer.

Scale shape: the window partitions by the grouping columns (source,
language, shard...), so at 100 TB this is one hash shuffle on the
group key and a per-group sort — no global total order, no driver
involvement. Groups are the unit of packing exactly because a global
ordering would serialize the cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_cols: Sequence[str],
    order_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    output_col: str = "seq_id",
) -> DataFrame:
    """Add ``seq_id``: the token-budget bin of each row within its
    group, deterministic given (group_cols, order_col)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    cum = F.sum(n_tokens_col).over(w)
    seq = F.floor((cum - F.col(n_tokens_col)) / F.lit(float(budget)))
    return df.withColumn(output_col, seq)
