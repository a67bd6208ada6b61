#!/usr/bin/env python3
"""Correctness at 100x the gate scale: replay the Spark-vs-DuckDB
comparison on the sf1-SHAPED generated data (scripts/gen_scale_data.py
— 50k docs / 20k vectors / 1.5M orders / 6M lineitem; 10x the bench
sf0.1, 100x the sf0.01 gate) for EVERY registry query (r7 verdict
item 2): each registered query is either run here or carries a
documented per-query exclusion in ``EXCLUDED`` below, and the artifact
records both — so the sf1 coverage claim is machine-exhaustive, not a
curated subset.

Included even at this size: the exact shared-shingle pair queries
(doc_jaccard_pairs, doc_containment_pairs — ~25 s DuckDB oracles).

Writes CORRECTNESS_SCALE_sf1_local.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from correctness_full import multiset  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402

# Every registry query is either RUN here or EXCLUDED with a stated,
# per-query reason (r7 verdict item 2: the sf1 artifact must count
# every registry entry).  The exclusion list is EMPTY as of r10:
#
# - r9 (VERDICT r8 item 2): the 12-member "lsh-coincidence" family was
#   restated as scale-valid contracts (exact-set echo + precision
#   sentinel over exact-verified candidates + recall-floor sentinel;
#   see operators/dedup.py cross_dedup_contract).
# - r10 (VERDICT r9 item 3): doc_packing — the last "oracle-cost"
#   exclusion (one-row-per-step recursive CTE, quadratic in DuckDB at
#   50k rows) — was restated as the greedy-packing contract
#   (conservation + capacity + contiguity + boundary-forced sentinels,
#   which jointly determine the greedy assignment uniquely; see
#   q_doc_packing's docstring). Every oracle aggregate is linear, so
#   the full registry asserts at every SF.
EXCLUDED: dict[str, str] = {}


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(root, "testdata_scale", "sf1")
    )
    spark = get_spark(
        app_name="c360-correctness-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            # same sizing as scripts/scale_growth.py: a single local JVM
            # standing in for a cluster at 100x the gate scale needs a
            # real heap (the 17M-edge co-purchase graph OOMs 1g).
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [q for q in EXCLUDED if q not in queries]
    assert not missing, f"EXCLUDED names not in registry: {missing}"
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        # a requested name that is excluded or unknown must FAIL loudly:
        # a silent no-op run rewrites the artifact unchanged and reads
        # as "re-verified" when nothing ran (r8 review finding)
        requested = only.split(",")
        bad = [q for q in requested if q in EXCLUDED or q not in queries]
        assert not bad, (
            f"SPARK_GRAFT_SCALE_ONLY names excluded or unknown: {bad}"
        )
    names = [
        q for q in queries
        if q not in EXCLUDED and (not only or q in only.split(","))
    ]
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    out: dict[str, dict] = {}
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_SCALE_sf1_local.json",
    )
    if only and os.path.exists(art):
        with open(art) as fh:
            out.update(json.load(fh))
    for name in names:
        rec: dict[str, object] = {
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "spark_sec": None,
            "oracle_sec": None,
            "err": None,
        }
        try:
            t0 = time.perf_counter()
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["spark_rows"] = len(s_rows)
            t0 = time.perf_counter()
            res = con.sql(oracles[name])
            d_cols = list(res.columns)
            d_rows = [tuple(r) for r in res.fetchall()]
            rec["oracle_sec"] = round(time.perf_counter() - t0, 2)
            rec["oracle_rows"] = len(d_rows)
            rec["hash_match"] = sorted(s_cols) == sorted(d_cols) and multiset(
                s_cols, s_rows
            ) == multiset(d_cols, d_rows)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:250]
        out[name] = rec
        flag = "ok  " if rec["hash_match"] else "FAIL"
        print(f"{flag} {name} {rec}", file=sys.stderr)
    for name, reason in EXCLUDED.items():
        out[name] = {"excluded": reason}
    # exhaustiveness: every registry entry is in the artifact, either
    # as a run row or as a documented exclusion
    uncovered = [q for q in queries if q not in out]
    if not only:
        assert not uncovered, f"registry entries uncovered: {uncovered}"
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    n_ok = sum(1 for r in out.values() if r.get("hash_match"))
    n_ex = sum(1 for r in out.values() if "excluded" in r)
    print(json.dumps({
        "total": len(out), "hash_match": n_ok, "excluded": n_ex,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
