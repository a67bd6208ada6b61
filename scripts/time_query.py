#!/usr/bin/env python3
"""In-session min-of-N timing of named registry queries with phase()
subtimings — the per-change isolation harness used by the optimization
rounds (fresh process, warmed session, N passes, min per query,
per-pass numbers printed so variance is visible).

Usage: python scripts/time_query.py SF_DIR N name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark import phases  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark(
        app_name="c360-time-query",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm scheduler
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        passes = []
        sub_min: dict[str, float] = {}
        for _ in range(n):
            spark.catalog.clearCache()
            sink: dict[str, float] = {}
            phases.capture(sink)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
            phases.capture(None)
            passes.append(dt)
            for k, v in sink.items():
                sub_min[k] = min(sub_min.get(k, v), round(v, 3))
        out[name] = {"min": min(passes), "passes": passes, "phases": sub_min}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
