#!/usr/bin/env python3
"""Skew-join timing evidence (r7 verdict item 7): one generated hot
key at sf1 scale, measured three ways —

  * ``unsalted``  — plain sort-merge join, AQE skew splitting OFF:
    the hot key's entire row mass lands in ONE shuffle partition and
    its task is the straggler (the 100 TB pathology).
  * ``aqe_skew``  — same plan, AQE skew-join splitting ON (thresholds
    lowered to fire at this data size; at cluster scale the defaults
    fire on real hot partitions): the runtime splits the oversized
    partition after seeing map output stats.
  * ``salted``    — operators/skew.salted_join(salt=16): the hot key
    is scattered across 16 sub-keys up front, the dim replicated 16x;
    works for ANY join strategy the planner picks and needs no
    runtime stats.

Corpus: sf1 lineitem (6M rows) with l_suppkey remapped so ~half of
all rows share ONE key and the rest spread over 10k keys; the right
side is the 10k-key dim with a payload column.  Broadcast is disabled
(at 100 TB the dim side of a skewed fact-fact join is not
broadcastable; a broadcast-hash join is immune to skew and would
measure nothing).  Each variant validates the identical output row
count before timing counts (min of PASSES).

Writes SKEW_BENCH_r8.json; SCALE.md records the crossover.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.skew import (  # noqa: E402
    salted_join,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402

PASSES = int(os.environ.get("SPARK_GRAFT_SKEW_PASSES", "3"))
HOT_KEY = 7
N_KEYS = 10_000


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.path.join(root, "testdata_scale", "sf1")
    spark = get_spark(
        app_name="c360-skew-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # force sort-merge: a broadcastable dim would make every variant a
    # skew-immune broadcast join and the bench vacuous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # one hot key with ~50% of the fact + a uniform tail over N_KEYS
    fact = li.select(
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(2)) == 0,
            F.lit(HOT_KEY),
        )
        .otherwise(
            F.pmod(F.xxhash64("l_partkey", "l_linenumber"), F.lit(N_KEYS))
        )
        .cast("long")
        .alias("k"),
        F.col("l_extendedprice").alias("val"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("weight")
    )

    def agg_count(joined):
        return joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
        ).collect()[0]["n"]

    variants = {}

    def run(name, setup, make):
        setup()
        # one validation pass (row-count equivalence), then timed passes
        n = agg_count(make())
        secs = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            agg_count(make())
            secs.append(round(time.perf_counter() - t0, 3))
        variants[name] = {"rows": int(n), "passes": secs, "sec_min": min(secs)}
        print(name, variants[name], file=sys.stderr)

    def aqe(enabled: bool, skew: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(enabled).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew).lower()
        )
        # fire at this data size (defaults: 256MB/5x — tuned for real
        # clusters; the RATIO semantics are what is under test)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    run(
        "unsalted",
        lambda: aqe(True, False),
        lambda: fact.join(dim, "k"),
    )
    run(
        "aqe_skew",
        lambda: aqe(True, True),
        lambda: fact.join(dim, "k"),
    )
    run(
        "salted",
        lambda: aqe(True, False),
        lambda: salted_join(fact, dim, on="k", salt=16),
    )

    counts = {v["rows"] for v in variants.values()}
    out = {
        "hot_key_share": 0.5,
        "n_keys": N_KEYS,
        "fact_rows": fact.count(),
        "rows_agree": len(counts) == 1,
        "variants": variants,
    }
    with open(os.path.join(root, "SKEW_BENCH_r8.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
