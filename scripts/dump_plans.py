#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for named registry queries to files.

Used to produce the committed before/after plan evidence under
``plans/r10/``: run once against a worktree of the pre-optimization
tree (suffix ``before``) and once against HEAD (suffix ``after``).
The repo root is an ARGUMENT so the same script file can load either
tree's modules; run each tree in its own process.

Usage:
    python scripts/dump_plans.py REPO_ROOT SF_DIR OUT_DIR SUFFIX name...
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)

    import __spark_entry__ as entrymod  # noqa: E402
    from customer_360_etl_pipeline_on_azure_cloud_spark.session import (  # noqa: E402
        get_spark,
    )

    spark = get_spark(
        app_name="c360-plan-dump",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = queries[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
