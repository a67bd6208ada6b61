#!/usr/bin/env python3
"""Generate an sf1-SHAPED documents/embeddings dataset for scale-growth
validation (VERDICT r4 item 2).

The driver's /root/testdata is read-only and stops at sf0.1, so this
mirrors its observed generation characteristics at 10x the bench scale:

* documents: ~30-word query-engine vocabulary, uniform 10-99 token
  lengths, lang {en,es,fr,de,zh} ~ (44,15,13,14,15)%, sources src0-19,
  ~5%% of docs planted as near-duplicates (a copy with one token
  substituted — the same one-edit construction whose exact 3-gram
  Jaccard lands >= 30%% for all but the shortest docs);
* embeddings: 64-dim float32 standard-normal vectors, labels 0-9.

Deterministic (seed fixed), written under testdata_scale/sf<SF>/ in the
repo (gitignored — an artifact, not source). Usage:

    python scripts/gen_scale_data.py [sf]    # default 1.0
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window stream data column order small query big filter "
    "group join click view the a customer"
).split()

LANGS = ["en", "es", "fr", "de", "zh"]
LANG_W = [0.44, 0.15, 0.13, 0.14, 0.14]


def gen(sf: float, out_dir: str) -> None:
    rng = random.Random(20260813)
    n_docs = int(50_000 * sf / 1.0)
    n_vecs = int(20_000 * sf / 1.0)
    n_base = int(n_docs / 1.05)  # ~5% of rows are planted near-dups

    texts = [
        " ".join(rng.choices(VOCAB, k=rng.randrange(10, 100)))
        for _ in range(n_base)
    ]
    # planted near-dups: copy an earlier doc, substitute one token
    while len(texts) < n_docs:
        src = texts[rng.randrange(n_base)]
        toks = src.split()
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        texts.append(" ".join(toks))
    order = list(range(n_docs))
    rng.shuffle(order)  # near-dups scattered across the id space
    texts = [texts[i] for i in order]

    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choices(LANGS, weights=LANG_W, k=n_docs), pa.string()
            ),
            "source": pa.array(
                [f"src{rng.randrange(20)}" for _ in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )

    nrng = np.random.default_rng(20260813)
    vecs = nrng.standard_normal((n_vecs, 64)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                [int(x) for x in nrng.integers(0, 10, n_vecs)], pa.int32()
            ),
        }
    )

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(f"wrote {n_docs} docs, {n_vecs} vecs -> {out_dir}")
    gen_facts(sf, out_dir)


def gen_facts(sf: float, out_dir: str) -> None:
    """orders/lineitem at sf-shape, mirroring the driver testdata's
    observed characteristics (orders 1.5M*sf; lines-per-order ~
    Poisson(4) clipped >=1, parts 200k*sf uniform; status/price/date
    marginals) — enough to scale-validate the co-purchase graph
    (part_pagerank) and the DQ audit alongside the text family."""
    nrng = np.random.default_rng(20260813)
    n_orders = int(1_500_000 * sf)
    n_parts = int(200_000 * sf)
    okeys = np.arange(n_orders, dtype=np.int64)
    day = nrng.integers(0, 2400, n_orders)  # ~1995-2001 span, days
    base = np.datetime64("1995-01-01", "us")
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys),
            "o_custkey": pa.array(
                nrng.integers(0, max(1, int(15_000 * sf)), n_orders)
            ),
            "o_orderstatus": pa.array(
                np.array(["F", "O", "P"])[nrng.integers(0, 3, n_orders)]
            ),
            "o_totalprice": pa.array(
                np.round(nrng.uniform(900.0, 360_000.0, n_orders), 2)
            ),
            "o_orderdate": pa.array(
                base + day.astype("timedelta64[D]").astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])[
                    nrng.integers(0, 4, n_orders)
                ]
            ),
        }
    )
    lines = np.clip(nrng.poisson(4.0, n_orders), 1, None)
    l_okey = np.repeat(okeys, lines)
    n_li = len(l_okey)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_okey),
            "l_partkey": pa.array(nrng.integers(0, n_parts, n_li)),
            "l_suppkey": pa.array(nrng.integers(0, max(1, int(1000 * sf)), n_li)),
            "l_linenumber": pa.array(
                np.concatenate([np.arange(1, k + 1) for k in lines]).astype(
                    np.int32
                )
            ),
            "l_quantity": pa.array(
                nrng.integers(1, 51, n_li).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(nrng.uniform(900.0, 105_000.0, n_li), 2)
            ),
            "l_discount": pa.array(np.round(nrng.uniform(0, 0.1, n_li), 2)),
            "l_tax": pa.array(np.round(nrng.uniform(0, 0.08, n_li), 2)),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[nrng.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[nrng.integers(0, 2, n_li)]
            ),
            "l_shipdate": pa.array(
                base
                + (day.repeat(lines) + nrng.integers(1, 120, n_li)).astype(
                    "timedelta64[D]"
                ).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, os.path.join(out_dir, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(out_dir, "lineitem.parquet"))
    print(f"wrote {n_orders} orders, {n_li} lineitem -> {out_dir}")


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen(sf, os.path.join(root, "testdata_scale", f"sf{sf:g}"))
