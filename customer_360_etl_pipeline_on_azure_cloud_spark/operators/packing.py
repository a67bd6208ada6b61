"""Sequence packing for LLM training pipelines.

Training consumes fixed-size context windows; documents are
variable-size. Packing assigns documents to windows ("packs") so each
pack's token total stays under the budget — the step between "curated
corpus" and "batchable training examples". The assignment must be
DETERMINISTIC (re-running data prep cannot reshuffle examples between
packs, or resumed training sees different batches), which rules out
anything partitioning-dependent.

This implements first-fit SEQUENTIAL greedy packing within explicit
groups: docs are walked in ``order_col`` order; a doc joins the current
pack if it fits, else opens the next. Greedy-by-order is the standard
corpus-prep choice (vs bin-packing by size) precisely because it is
deterministic, streaming-friendly, and preserves any locality the sort
order encodes. A doc larger than the budget gets a pack of its own
(downstream truncation is a policy decision, not the packer's).

The in-group walk is inherently sequential (each decision depends on
the running total), so the GROUP is the parallelism unit — shard a
100 TB corpus into many groups (date, source, hash bucket) and every
group packs independently in one ``applyInPandas`` task; there is no
cross-group state. One shuffle on the group key, Arrow-batched, and the
per-row Python work is a few integer ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_col`` (0-based per group) by greedy
    sequential packing of ``token_col`` under ``budget``, walking each
    group in ascending ``order_col``. Input columns pass through."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(pack_col, T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        packs = []
        cum = None
        pack_id = 0
        for tok in pdf[token_col]:
            tok = int(tok)
            if cum is None:
                cum = tok
            elif cum + tok <= budget:
                cum += tok
            else:
                pack_id += 1
                cum = tok
            packs.append(pack_id)
        pdf[pack_col] = pd.array(packs, dtype="int64")
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, out_schema)
