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

Corpus: sf1 lineitem (6M rows) with the key remapped so ~90% of all
rows share ONE key and the rest spread over 10k keys; the right side
is the 10k-key dim with a payload column.  Broadcast is disabled
(at 100 TB the dim side of a skewed fact-fact join is not
broadcastable; a broadcast-hash join is immune to skew and would
measure nothing).  Each variant validates the identical output row
count (untimed), then times the join through a noop sink (min of
PASSES).

Measured r8 (min-of-3, local[32]): unsalted 3.70 s, aqe_skew 1.35 s,
salted 1.71 s — and the methodological finding that a global
aggregate in the SAME stage as the join suppresses
OptimizeSkewedJoin entirely (0 skew splits in the executed plan;
verified by plan markers), in which case salted_join is the only
working mitigation.  Writes SKEW_BENCH_r8.json; SCALE.md records the
crossover.
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
    # one hot key with ~90% of the fact + a uniform tail over N_KEYS:
    # the hot key's shuffle partition carries ~5.4M of the 6M rows, so
    # unsalted wall-clock IS the straggler task (31 of 32 slots idle)
    fact = li.select(
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 9,
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

    variants = {}

    def run(name, setup, make):
        setup()
        # one UNTIMED validation pass (row-count equivalence); the timed
        # passes drive the join through a noop sink so the SortMergeJoin
        # is its stage's top operator — measured here: a same-stage
        # global aggregate suppresses AQE's OptimizeSkewedJoin (the
        # split fires only when the join output feeds the stage
        # boundary directly), so timing through an agg would silently
        # measure the unsplit plan for the aqe_skew variant
        n = make().count()
        secs = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        variants[name] = {"rows": int(n), "passes": secs, "sec_min": min(secs)}
        print(name, variants[name], file=sys.stderr)

    def aqe(enabled: bool, skew: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(enabled).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew).lower()
        )
        # fire at this data size (defaults: 256MB threshold / 64MB
        # advisory / 5x factor — tuned for real clusters; the hot
        # partition here is only ~14MB COMPRESSED shuffle bytes for
        # 5.4M rows, so the advisory must sit well under it for the
        # split to actually parallelize the straggler; the RATIO
        # semantics are what is under test)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB"
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
        "hot_key_share": 0.9,
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
