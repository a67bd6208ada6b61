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


def gen(sf: float, out_dir: str, docs_only: bool = False) -> None:
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
    if docs_only:
        # dedup-cascade scale points only need the documents table;
        # facts at sf>=30 (180M+ lineitem rows) cost minutes and GBs
        # for nothing
        return
    gen_facts(sf, out_dir)
    gen_dims(sf, out_dir)


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
                # mirrors the driver testdata: customer count is
                # 150_000*sf and o_custkey spans ALL of it (checked at
                # sf0.01/sf0.1; the r6 generator drew from 15_000*sf —
                # one decade short at sf=1)
                nrng.integers(0, max(1, int(150_000 * sf)), n_orders)
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
            "l_suppkey": pa.array(
                # driver testdata: supplier count is 10_000*sf and
                # l_suppkey spans it (r6 generator used 1000*sf)
                nrng.integers(0, max(1, int(10_000 * sf)), n_li)
            ),
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


def gen_dims(sf: float, out_dir: str) -> None:
    """customer/part at sf-shape (VERDICT r6 item 5), mirroring the
    driver testdata's observed schemas and marginals exactly
    (checked at sf0.01/sf0.1): customer 150_000*sf rows with
    c_name = Customer#%09d, c_nationkey 0-24, c_acctbal ~
    uniform(-1000, 10000) 2dp, 5 market segments; part 200_000*sf
    rows with adj+noun names from the observed 8x8 vocabulary,
    Brand#1-25, 6 types, p_size 1-50, and the exact driver price
    rule p_retailprice = 900 + (p_partkey %% 1000)/10.  A fresh rng
    stream (so orders/lineitem bytes are unaffected by this
    addition)."""
    nrng = np.random.default_rng(20260814)
    n_cust = max(1, int(150_000 * sf))
    n_part = max(1, int(200_000 * sf))
    segs = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(
                nrng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(nrng.uniform(-1000.0, 10_000.0, n_cust), 2)
            ),
            "c_mktsegment": pa.array(segs[nrng.integers(0, 5, n_cust)]),
        }
    )
    adjs = np.array(
        ["blue", "old", "large", "hot", "red", "cold", "new", "small"]
    )
    nouns = np.array(
        ["gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod", "widget"]
    )
    types = np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )
    pk = np.arange(n_part, dtype=np.int64)
    a = adjs[nrng.integers(0, 8, n_part)]
    n_ = nouns[nrng.integers(0, 8, n_part)]
    part = pa.table(
        {
            "p_partkey": pa.array(pk),
            "p_name": pa.array([f"{x} {y}" for x, y in zip(a, n_)]),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in nrng.integers(1, 26, n_part)]
            ),
            "p_type": pa.array(types[nrng.integers(0, 6, n_part)]),
            "p_size": pa.array(
                nrng.integers(1, 51, n_part).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(900.0 + (pk % 1000) / 10.0, 2)
            ),
        }
    )
    pq.write_table(customer, os.path.join(out_dir, "customer.parquet"))
    pq.write_table(part, os.path.join(out_dir, "part.parquet"))
    print(f"wrote {n_cust} customer, {n_part} part -> {out_dir}")

    # region/nation are static reference dims; supplier is 10_000*sf
    # (schema + Supplier#%09d / nationkey / acctbal marginals mirror
    # the driver testdata)
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
            ),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array(
                (np.arange(25) % 5).astype(np.int32), pa.int32()
            ),
        }
    )
    n_supp = max(1, int(10_000 * sf))
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(
                nrng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
            ),
            "s_acctbal": pa.array(
                np.round(nrng.uniform(-1000.0, 10_000.0, n_supp), 2)
            ),
        }
    )
    pq.write_table(region, os.path.join(out_dir, "region.parquet"))
    pq.write_table(nation, os.path.join(out_dir, "nation.parquet"))
    pq.write_table(supplier, os.path.join(out_dir, "supplier.parquet"))
    print(f"wrote 5 region, 25 nation, {n_supp} supplier -> {out_dir}")

    # events: 1_000_000*sf rows over a 30-day Jan-2024 window, ts
    # sorted (event_id follows arrival order, as in the driver data),
    # users 15_000*sf, 5 uniform event types, value ~ gamma tail,
    # props = {"k": 0-99}
    n_ev = max(1, int(1_000_000 * sf))
    off_us = np.sort(
        nrng.integers(0, 30 * 86_400 * 1_000_000, n_ev, dtype=np.int64)
    )
    ev_base = np.datetime64("2024-01-01", "us")
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
            "ts": pa.array(
                ev_base + off_us.astype("timedelta64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array(
                nrng.integers(0, max(1, int(15_000 * sf)), n_ev)
            ),
            "event_type": pa.array(etypes[nrng.integers(0, 5, n_ev)]),
            "value": pa.array(np.round(nrng.gamma(2.0, 40.0, n_ev), 2)),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in nrng.integers(0, 100, n_ev)]
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))
    print(f"wrote {n_ev} events -> {out_dir}")


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    docs_only = "--docs-only" in sys.argv[2:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen(sf, os.path.join(root, "testdata_scale", f"sf{sf:g}"),
        docs_only=docs_only)
