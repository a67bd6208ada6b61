#!/usr/bin/env python3
"""Committed per-query bench at sf1 (r7 verdict item 3): min-of-N
wall-clock for the most expensive registry queries at 10x the bench
scale, so the scale story has timing evidence, not just the
sf0.1->sf1 growth RATIOS in SCALE_r*.json (whose timings are
single-pass, embedded in a mixed sweep).

Query set: the TOP_N most expensive queries by the committed sf0.1
bench (BENCH_LOCAL_latest.json per-query MINs) whose tables exist in
the scale corpus, plus anything passed via SPARK_GRAFT_SCALE_ONLY.
Method matches bench.py: one warm session, per query N full
plan-build+collect passes, record the MIN (this host has heavy steal
noise — compare MINs, never medians).  Each row also carries the
growth prediction implied by SCALE_r7.json for the NOTES comparison.

Writes BENCH_SF1_local.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402

PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
TOP_N = int(os.environ.get("SPARK_GRAFT_BENCH_TOPN", "32"))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.path.join(root, "testdata_scale", "sf1")
    with open(os.path.join(root, "BENCH_LOCAL_latest.json")) as fh:
        base = json.load(fh)["queries"]
    growth = {}
    scale_path = os.path.join(root, "SCALE_r7.json")
    if os.path.exists(scale_path):
        with open(scale_path) as fh:
            growth = json.load(fh)

    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        names = only.split(",")
    else:
        names = [n for n, _ in sorted(base.items(), key=lambda kv: -kv[1])][
            :TOP_N
        ]

    spark = get_spark(
        app_name="c360-bench-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            # single local JVM standing in for a cluster at 10x bench
            # scale (same sizing as scripts/correctness_scale.py)
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    out: dict[str, dict] = {}
    art = os.path.join(root, "BENCH_SF1_local.json")
    prior: dict = {}
    if os.path.exists(art):
        with open(art) as fh:
            prior = json.load(fh)
    if only and isinstance(prior.get("queries"), dict):
        out.update(prior["queries"])

    for name in names:
        if name not in queries:
            continue
        rec: dict[str, object] = {"err": None}
        try:
            secs = []
            rows = None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = len(queries[name](spark, sf_dir).collect())
                secs.append(round(time.perf_counter() - t0, 3))
            rec["sec_min"] = min(secs)
            rec["passes"] = secs
            rec["rows"] = rows
            rec["sf0.1_sec_min"] = base.get(name)
            g = growth.get(name, {}).get("growth_10x")
            rec["scale_r7_growth_10x"] = g
            if base.get(name) and g:
                rec["predicted_sec"] = round(base[name] * g, 2)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:250]
        out[name] = rec
        print(name, rec, file=sys.stderr)

    payload = {
        "passes": PASSES,
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": out,
        "total_sec_min": round(
            sum(r["sec_min"] for r in out.values() if r.get("sec_min")), 1
        ),
    }
    with open(art, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"queries": len(out), "total": payload["total_sec_min"]}))


if __name__ == "__main__":
    main()
