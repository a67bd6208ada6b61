#!/usr/bin/env python3
"""sf3 growth points for the two worst sf1 growers (VERDICT r9 item 8).

r9's sf0.1->sf1 sweep showed every heavy query growing sub-linearly on
10x data except two outliers worth another decade of evidence:
``winnowing_dedup_pairs`` (6.8x, explained by the measured shingle-mass
law) and ``semantic_dedup_distributed`` (5.3x). This runs each in a
fresh subprocess (scripts/bench_sf1.py --worker, the r9 cold/warm
methodology) against the sf3-shaped generator output
(scripts/gen_scale_data.py 3 — same generator family as the sf1 data,
3x the rows) and records warm-min growth vs the committed sf1 numbers.

Claim under test: growth on 3x data stays well under the quadratic 9x
(and under the verdict's lenient 10x bar) — i.e. the sub-quadratic
trend from sf0.1->sf1 holds for another 3x.

Usage: python scripts/scale_sf3.py [query ...]   # merges SCALE_r10.json

With no arguments runs the two default outliers; explicit names (must
exist in BENCH_SF1_local.json for the growth denominator) extend the
artifact — existing rows for other queries are preserved.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["winnowing_dedup_pairs", "semantic_dedup_distributed"]
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))


def main() -> None:
    names = sys.argv[1:] or QUERIES
    sf3_dir = os.path.join(ROOT, "testdata_scale", "sf3")
    art = os.path.join(ROOT, "SCALE_r10.json")
    with open(os.path.join(ROOT, "BENCH_SF1_local.json")) as fh:
        sf1 = json.load(fh)["queries"]
    unknown = [n for n in names if n not in sf1]
    assert not unknown, f"no sf1 baseline for: {unknown}"
    out: dict[str, dict] = {}
    extra: dict[str, object] = {}
    if os.path.exists(art):
        with open(art) as fh:
            prior = json.load(fh)
        out.update(prior.get("queries", {}))
        # preserve hand-recorded sections (e.g. operator_only rows)
        extra = {
            k: v for k, v in prior.items()
            if k not in ("method", "sf_dir", "cpus", "queries")
        }
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(ROOT, "scripts", "bench_sf1.py"),
                 "--worker", name, sf3_dir, str(PASSES)],
                capture_output=True, text=True, cwd=ROOT, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            out[name] = {"err": "timeout 3600s"}
            continue
        rec: dict[str, object] = {
            "err": f"worker exit {proc.returncode}: {proc.stderr[-200:]}"
        }
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_SF1_ROW "):
                rec = json.loads(line[len("BENCH_SF1_ROW "):])[name]
        base = sf1.get(name, {})
        rec["sf1_warm_min"] = base.get("warm_min")
        wm = rec.get("warm_min")
        if isinstance(wm, (int, float)) and base.get("warm_min"):
            rec["growth_3x_data"] = round(wm / base["warm_min"], 2)
        out[name] = rec
        print(name, rec, file=sys.stderr)
    payload = {
        "method": (
            "fresh subprocess per query (bench_sf1 --worker), warm_min of "
            f"{PASSES - 1} post-cold passes; sf3 data from "
            "scripts/gen_scale_data.py 3 (3x the sf1 rows, same generator); "
            "growth_3x_data = sf3 warm_min / committed sf1 warm_min — "
            "quadratic would be 9x, the r9 verdict bar is 10x"
        ),
        "sf_dir": sf3_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": out,
        **extra,
    }
    with open(art, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({
        n: r.get("growth_3x_data") for n, r in out.items()
    }))


if __name__ == "__main__":
    main()
