#!/usr/bin/env python3
"""Committed per-query bench at sf1, COLD/WARM SEPARATED (r8 verdict
item 3): the r8 artifact ran 32 expensive queries sequentially in one
warm session, so first-touch parquet caching, codebook warmup and host
contention contaminated the numbers — BENCH_SF1_local.json and
SCALE_r8.json disagreed 3-5x on the same queries.

Method (r9): every query runs in its OWN fresh subprocess —

* ``session_sec``  — SparkSession build + one trivial job (JVM spinup,
  scheduler path); never attributed to the query.
* ``cold_sec``     — the first full plan-build+collect in the fresh
  process: what a brand-new cluster pays once (codegen compile, parquet
  footer reads, Python worker spinup).
* ``warm_secs``    — N-1 further passes in the same process;
  ``warm_min`` is the steady-state per-query number and THE SCALE
  TRUTH for cross-artifact comparison (matches how SCALE_r*.json and
  bench.py numbers are consumed: repeated-execution minimum).
* phased queries additionally carry per-pass build/probe subtimings
  (operators' ``phases.capture``), so an index build inside a query is
  never misread as probe cost.

Query set: the TOP_N most expensive by the committed sf0.1 bench MINs,
plus anything in SPARK_GRAFT_SCALE_ONLY.  Writes BENCH_SF1_local.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
TOP_N = int(os.environ.get("SPARK_GRAFT_BENCH_TOPN", "32"))


def worker(name: str, sf_dir: str, passes: int) -> None:
    """Fresh-process single-query bench: prints one JSON line."""
    import __spark_entry__ as entrymod
    from customer_360_etl_pipeline_on_azure_cloud_spark import phases
    from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark

    rec: dict[str, object] = {"err": None}
    t0 = time.perf_counter()
    spark = get_spark(
        app_name=f"c360-bench-sf1-{name}",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    rec["session_sec"] = round(time.perf_counter() - t0, 3)
    fn = entrymod.queries()[name]
    try:
        secs: list[float] = []
        subs: list[dict[str, float]] = []
        rows = None
        for _ in range(passes):
            spark.catalog.clearCache()
            sink: dict[str, float] = {}
            phases.capture(sink)
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())
            secs.append(round(time.perf_counter() - t0, 3))
            phases.capture(None)
            if sink:
                subs.append({k: round(v, 3) for k, v in sink.items()})
        rec["cold_sec"] = secs[0]
        rec["warm_secs"] = secs[1:]
        rec["warm_min"] = min(secs[1:]) if len(secs) > 1 else None
        rec["rows"] = rows
        if subs:
            rec["phases"] = subs
    except Exception as exc:  # noqa: BLE001
        rec["err"] = f"{type(exc).__name__}: {exc}"[:250]
    print("BENCH_SF1_ROW " + json.dumps({name: rec}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ROOT, "testdata_scale", "sf1")
    )
    with open(os.path.join(ROOT, "BENCH_LOCAL_latest.json")) as fh:
        base = json.load(fh)["queries"]
    growth = {}
    for tag in ("SCALE_r9.json", "SCALE_r8.json", "SCALE_r7.json"):
        scale_path = os.path.join(ROOT, tag)
        if os.path.exists(scale_path):
            with open(scale_path) as fh:
                growth = json.load(fh)
            break

    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        names = only.split(",")
    else:
        names = [n for n, _ in sorted(base.items(), key=lambda kv: -kv[1])][
            :TOP_N
        ]

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    art = os.path.join(ROOT, "BENCH_SF1_local.json")
    out: dict[str, dict] = {}
    prior: dict = {}
    if os.path.exists(art):
        with open(art) as fh:
            prior = json.load(fh)
    if only and isinstance(prior.get("queries"), dict):
        out.update(prior["queries"])

    for name in names:
        if name not in registry:
            continue
        # A hung worker must cost its own row, not the whole artifact
        # (ADVICE r9: an uncaught TimeoutExpired aborted the loop and
        # discarded every completed row, since the file is written at
        # the end).
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", name,
                 sf_dir, str(PASSES)],
                capture_output=True,
                text=True,
                cwd=ROOT,
                timeout=3600,
            )
        except subprocess.TimeoutExpired:
            out[name] = {"err": "timeout 3600s", "sf0.1_sec_min": base.get(name)}
            print(name, out[name], file=sys.stderr)
            continue
        rec: dict[str, object] = {
            "err": f"worker exit {proc.returncode}: {proc.stderr[-200:]}"
        }
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_SF1_ROW "):
                rec = json.loads(line[len("BENCH_SF1_ROW "):])[name]
        rec["sf0.1_sec_min"] = base.get(name)
        g = growth.get(name, {}).get("growth_10x")
        rec["scale_growth_10x"] = g
        if base.get(name) and g:
            rec["predicted_sec"] = round(base[name] * g, 2)
        out[name] = rec
        print(name, rec, file=sys.stderr)

    payload = {
        "method": (
            "fresh subprocess per query; cold_sec = first pass "
            "(codegen/footer warmup), warm_min = min of subsequent "
            f"{PASSES - 1} passes = THE per-query scale truth"
        ),
        "passes": PASSES,
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": out,
        "total_warm_min_sec": round(
            sum(
                r["warm_min"]
                for r in out.values()
                if isinstance(r.get("warm_min"), (int, float))
            ),
            1,
        ),
    }
    with open(art, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({
        "queries": len(out), "total_warm_min": payload["total_warm_min_sec"],
    }))


if __name__ == "__main__":
    main()
