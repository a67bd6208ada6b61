#!/usr/bin/env python3
"""Production dedup cascade, end-to-end, at a given scale — the
operator_only measurement behind SCALE_r10.json (the 100 TB path with
ZERO oracle freight):

    minhash_lsh_pairs(num_hashes=32, bands=8, verify_threshold_pct=30,
                      max_bucket=500)        # capped banded candidates
                                             # + exact signature verify
 -> dedup_survivors(...)                     # hash-min CC + keep-lowest

Method matches scripts/bench_sf1.py: one session, cold pass + N-1 warm
passes, min of the warm passes; survivors counted (the survivor RATE
should be scale-invariant on the generator's planted ~5% near-dup
corpus — it is part of the printed record so drift is visible).

Usage:
    python scripts/dedup_cascade_scale.py <sf_dir> [passes=3]

Prints one JSON line: {"sf_dir", "docs", "survivors", "cold_sec",
"warm_secs", "warm_min"} — merge into SCALE_r10.json by hand (the
artifact rows carry prose notes the script should not overwrite).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.graph import (  # noqa: E402
    dedup_survivors,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="c360-dedup-cascade-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    secs: list[float] = []
    survivors = None
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(
            docs,
            num_hashes=32,
            bands=8,
            verify_threshold_pct=30,
            max_bucket=500,
            exact=True,
        )
        surv = dedup_survivors(
            pairs.select("id_a", "id_b"), docs.select("doc_id")
        )
        survivors = surv.filter("is_survivor").count()
        secs.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "sf_dir": sf_dir,
        "docs": n_docs,
        "survivors": survivors,
        "survivor_pct": round(100.0 * survivors / n_docs, 1),
        "cold_sec": secs[0],
        "warm_secs": secs[1:],
        "warm_min": min(secs[1:]) if len(secs) > 1 else None,
    }))


if __name__ == "__main__":
    main()
