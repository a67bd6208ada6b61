#!/usr/bin/env python3
"""Machine-checked physical-plan audit over the whole registry.

For every registered query, build its DataFrame at the gate SF and
record plan-shape facts the scale review otherwise checks by hand:

* ``batch_eval_python`` — row-at-a-time Python UDF operators
  (``BatchEvalPython``).  The engine's claim is ZERO everywhere (all
  Python is Arrow-vectorized); the summary asserts it.
* ``arrow_eval`` — Arrow-batched Python operators
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  / ``FlatMapGroupsInPandasWithState``): the sanctioned Python path.
* ``cartesian`` — ``CartesianProduct`` operators.  Expected ZERO:
  scalar broadcasts plan as BroadcastNestedLoopJoin (counted
  separately — benign when one side is a 1-row aggregate, which is
  the engine's documented scalar-broadcast pattern).
* ``bnlj`` — BroadcastNestedLoopJoin count (scalar crossJoins and
  bounded audit joins land here; fact-fact ones would be a bug).
* ``exchanges`` — shuffle Exchange count (the scale currency).

(WholeStageCodegen spans are NOT counted here: with AQE the returned
plan is an unexecuted AdaptiveSparkPlan whose string has no codegen
wrappers yet — codegen coverage is pinned where it matters in
tests/test_plan_shape.py instead.)

Some queries execute work when CALLED (index builds, streaming
demos) — the audit tolerates that; it reads the final plan of the
RETURNED DataFrame.  Writes PLAN_AUDIT_r10.json.

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402

MARKS = {
    "batch_eval_python": ("BatchEvalPython",),
    "arrow_eval": (
        "ArrowEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
    ),
    "cartesian": ("CartesianProduct",),
    "bnlj": ("BroadcastNestedLoopJoin",),
    "exchanges": ("Exchange",),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="c360-plan-audit",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict[str, object] = {}
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            for key, needles in MARKS.items():
                rec[key] = sum(plan.count(n) for n in needles)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        out[name] = rec
        print(name, rec, file=sys.stderr)

    summary = {
        "queries": len(out),
        "errors": sum(1 for r in out.values() if "err" in r),
        "total_batch_eval_python": sum(
            int(r.get("batch_eval_python", 0)) for r in out.values()
        ),
        "total_cartesian": sum(
            int(r.get("cartesian", 0)) for r in out.values()
        ),
        "queries_with_arrow": sum(
            1 for r in out.values() if int(r.get("arrow_eval", 0)) > 0
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = os.environ.get("PLAN_AUDIT_OUT", "PLAN_AUDIT_r10.json")
    with open(os.path.join(root, out_name), "w") as fh:
        json.dump({"summary": summary, "per_query": out}, fh, indent=1)
        fh.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
