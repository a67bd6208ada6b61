"""K-minimum-values (KMV / "bottom-k") distinct sketches with set
operations [Bar-Yossef et al. 2002; Beyer et al. 2007].

The missing piece next to the engine's other sketches: HLL
(``sketch_rollup_users``) merges UNIONS only, CMS estimates
frequencies, the fixed-width histogram merges quantiles — none of them
can estimate an INTERSECTION ("how many users did both X and Y").  A
KMV sketch — the k smallest values of a uniform hash over a group's
distinct members — supports exactly that: the bottom-k of a UNION of
two sketches is computable from the two sketches alone, and the
fraction of those k union hashes present in both sides is an unbiased
Jaccard estimator, so ``|A ∩ B| ≈ (j/k) * D_union`` where
``D_union = (k-1) * 2^HASH_BITS / h_(k)`` (the classic k-th minimum
estimator).

Engine-portability is the design driver: the hash is md5 (stable
across Spark / DuckDB / anything), truncated to 60 bits so every value
is a plain BIGINT, and every sketch row, union rank, and overlap count
is exact integer algebra — the oracle replays the ENTIRE sketch path
bit-for-bit, not just a tolerance gate.  Estimation (the one division)
is left to the caller / pytest so no float ever crosses engines.

Scale shape: sketch build is one distinct aggregate over (group, hash)
followed by a per-group bottom-k (rank window over the DISTINCT
hashes, already group-partitioned; at extreme per-group cardinality
swap in the two-phase top-k used by ``lang_quota_sample`` — partial
per-partition bottom-k, then merge, which the rank window's
map-side-combinable shape already approximates).  Everything after the
sketch touches ``k * n_groups`` rows: pairwise set operations cost is
independent of data volume — the entire point of shipping sketches
instead of raw ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash width: 15 md5 hex chars = 60 bits, comfortably inside BIGINT
#: and wide enough that collisions are negligible (~n^2 / 2^61).
KMV_HASH_BITS = 60


def kmv_hash(col: Column) -> Column:
    """60-bit integer md5 hash (the engine's cross-engine hash idiom:
    md5, never xxhash64 — DuckDB twin:
    ``CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS
    BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 60-bit md5
    hashes of ``value_col``.  Returns ``(grp, h)`` rows — at most ``k``
    per group (fewer when the group has < k distinct members, in which
    case the sketch is the exact hashed set and every estimate
    degenerates to exact).  Mergeable: the sketch of a union of row
    sets is the bottom-k of the union of their sketches, so daily
    sketches roll up without rescanning history (same contract as the
    HLL rollup, plus intersections)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = (
        df.select(
            F.col(group_col).alias("grp"),
            kmv_hash(F.col(value_col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("grp", "h")
    )


def kmv_pair_overlap(sketch: DataFrame, k: int) -> DataFrame:
    """All-pairs set-operation sketch state from a ``kmv_sketch``
    output: for every group pair ``(ga < gb)``, take the bottom-k of
    the UNION of the two sketches and report

    - ``kmv_common``  — union hashes present in BOTH sketches (the
      Jaccard numerator ``j``),
    - ``kmv_kept``    — union hashes kept (= min(k, distinct union);
      the Jaccard denominator),
    - ``kmv_kth_hash`` — the largest kept hash ``h_(k)`` (the
      denominator of the union-size estimator).

    Estimates (caller-side, the only division in the recipe):
    ``D_union ≈ (kmv_kept - 1) * 2**KMV_HASH_BITS / kmv_kth_hash`` and
    ``|A ∩ B| ≈ kmv_common / kmv_kept * D_union``.

    Cost is sketch-sized: ``n_groups^2 * k`` rows flow through one
    tagged union, one presence aggregate, one rank window, one final
    aggregate — no raw data is touched."""
    groups = sketch.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("ga"))
        .join(
            groups.select(F.col("grp").alias("gb")),
            F.col("ga") < F.col("gb"),
        )
    )
    side_a = pairs.join(
        sketch, pairs["ga"] == sketch["grp"]
    ).select(
        "ga", "gb", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    side_b = pairs.join(
        sketch, pairs["gb"] == sketch["grp"]
    ).select(
        "ga", "gb", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    both = (
        side_a.union(side_b)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    kept = both.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return kept.groupBy("ga", "gb").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("kmv_common"),
        F.count(F.lit(1)).alias("kmv_kept"),
        F.max("h").alias("kmv_kth_hash"),
    )
