#!/usr/bin/env python3
"""Full-registry determinism sweep: run every registered query twice —
once with default input splits and once with 128 KB
``spark.sql.files.maxPartitionBytes`` (every scan shatters into many
small partitions, so per-partition iteration order, partial-aggregation
grouping, and task count all change) — and require bit-identical result
multisets.

(Shuffle partitioning itself is pinned by each query's own ``tune()``
call, so the split size is the layout knob a sweep can actually vary —
and it is the harsher one: it perturbs the MAP side, which is where
non-associative folds and order-dependent tiebreaks would leak.)

Every query in this engine claims partition-independence (integer
arithmetic, deterministic tiebreaks, pinned-order folds); this sweep
turns that claim into a committed artifact instead of a per-family
pytest.  Writes DETERMINISM_local.json.

Usage: python scripts/determinism_sweep.py [sf_dir]  (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402


def multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(repr(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="c360-determinism",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    root_ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art_ = os.path.join(root_, "DETERMINISM_local.json")
    if only:
        # apply the requested subset unconditionally (ADVICE r7: the
        # subset must not silently depend on the artifact existing);
        # only the merge-into-artifact step needs the prior file
        queries = {n: queries[n] for n in only.split(",") if n in queries}
        if os.path.exists(art_):
            with open(art_) as fh:  # subset reruns merge into the artifact
                out.update(json.load(fh))
    for name, fn in queries.items():
        rec: dict[str, object] = {"match": False, "err": None}
        try:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
            a = fn(spark, sf_dir)
            ma = multiset(a.columns, a.collect())
            spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
            b = fn(spark, sf_dir)
            mb = multiset(b.columns, b.collect())
            rec["match"] = ma == mb
            rec["rows"] = len(ma)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        out[name] = rec
        print(("ok  " if rec["match"] else "FAIL") + f" {name}", file=sys.stderr)
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DETERMINISM_local.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    n_ok = sum(1 for r in out.values() if r["match"])
    print(json.dumps({"total": len(out), "match": n_ok, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
