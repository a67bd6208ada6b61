"""Data-quality expectation checks — the constraint audit a warehouse
runs before promoting a load (the capability Delta Lake exposes as
table constraints / expectations, re-expressed engine-side).

The reference pipeline trusts its inputs blindly (no validation
anywhere in ETL_pipeline.py); at 100 TB a silent bad load poisons every
downstream feature, so the engine ships a one-scan audit: N rules over
a table cost ONE aggregate job (conditional counts share the scan),
never N passes.  Uniqueness rides the same aggregate as
``count - count(distinct key)``; referential integrity is the only rule
that needs a second input and runs as a broadcast/shuffle anti-join
count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Output schema shared by all rule evaluators.
_OUT_COLS = ("rule", "total", "violations", "passed")


def check_rules(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate named expectations over ``df`` in ONE aggregate pass.

    ``rules`` maps rule name -> a boolean Column that is True when the
    row SATISFIES the expectation; a NULL predicate counts as a
    violation (``coalesce(cond, false)`` — the conservative reading,
    identical across engines).  ``unique_keys`` maps rule name -> key
    column list; duplicates = ``count(*) - count(distinct keys)``.

    Returns ``(rule, total, violations, passed)`` — one row per rule.

    Scale: all conditional counts and the distinct-count(s) fold into a
    single hash aggregate over one scan of ``df`` (map-side partial
    aggregation; the result is one row wide), then a driver-free
    explode to rows.  Adding a rule adds a column to the aggregate, not
    a pass over the data.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, (_name, cond) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    uk = list((unique_keys or {}).items())
    for i, (_name, keys) in enumerate(uk):
        aggs.append(
            F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias(
                f"__d{i}"
            )
        )
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__total").alias("total"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias(
                "violations"
            ),
        )
        for i, (name, _c) in enumerate(rules)
    ] + [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__total").alias("total"),
            (F.col("__total") - F.col(f"__d{i}")).cast("long").alias(
                "violations"
            ),
        )
        for i, (name, _k) in enumerate(uk)
    ]
    return (
        one.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.rule", "e.total", "e.violations")
        .withColumn("passed", F.col("violations") == 0)
    )


def enforce_rules(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    quarantine_col: str = "failed_rules",
) -> DataFrame:
    """Row-level enforcement: tag every row with the (sorted,
    comma-joined) names of the rules it VIOLATES — empty string means
    the row is clean.  The caller routes on it::

        tagged = enforce_rules(orders, RULES)
        good = tagged.filter(F.col("failed_rules") == "").drop("failed_rules")
        bad  = tagged.filter(F.col("failed_rules") != "")   # quarantine

    This is the load-time companion to :func:`check_rules`: the audit
    says WHETHER the load is clean, enforcement quarantines the rows
    that aren't (instead of failing the whole 100 TB job on one bad
    row).  NULL predicates count as violations, same convention as the
    audit.

    Scale: a pure narrow map — every rule is a column expression
    evaluated in the scan's projection; the tag is concat_ws over
    conditional literals.  No shuffle, no second pass; a partitioned
    write of good/bad is the only exchange downstream needs.
    """
    tags = [
        F.when(F.coalesce(cond, F.lit(False)), F.lit(None)).otherwise(
            F.lit(name)
        )
        for name, cond in rules
    ]
    # concat_ws skips NULLs, so only violated rule names appear; rule
    # order in `rules` is the (deterministic) tag order.
    return df.withColumn(quarantine_col, F.concat_ws(",", *tags))


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    on: list[tuple[str, str]],
    rule: str,
) -> DataFrame:
    """Referential-integrity expectation: count child rows whose key has
    no match in ``parent``.  Same ``(rule, total, violations, passed)``
    row shape as :func:`check_rules`, so audits union cleanly.

    Scale: ONE scan of the child — a left join against the parent's
    distinct keys (marked with a presence flag) feeds a single
    aggregate computing total and violations together as conditional
    counts, so the child table is never read twice.  The parent side
    is reduced to its distinct keys first (column pruning keeps the
    shuffle narrow), and AQE broadcasts it when the key set is small,
    making the check a map-side probe over the child scan.  A
    key-missing child row joins nothing (NULL flag) and counts as a
    violation — including NULL keys, same convention as check_rules.
    """
    join_cols = [c for c, _p in on]
    keys = (
        parent.select(*[F.col(p).alias(c) for c, p in on])
        .distinct()
        .withColumn("__present", F.lit(1))
    )
    counts = (
        child.join(keys, join_cols, "left")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                F.when(F.col("__present").isNull(), 1).otherwise(0)
            ).alias("violations"),
        )
    )
    return counts.select(
        F.lit(rule).alias("rule"),
        "total",
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias(
            "violations"
        ),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )


def k_anonymity_classes(
    df: DataFrame, quasi_cols: Sequence[Column | str], k: int = 5
) -> DataFrame:
    """k-anonymity audit [Sweeney 2002]: group rows into equivalence
    classes on the quasi-identifier columns and flag classes smaller
    than ``k`` — rows in those classes are re-identifiable by joining
    the quasi-identifiers against an external dataset, the exposure a
    privacy review checks before a table (or a training corpus's
    metadata) leaves the trust boundary.

    ONE hash aggregate (map-side combined); the class table is bounded
    by the quasi-identifier cardinality product, not the row count, so
    the audit output stays compact at any scale.

    Output: quasi columns + ``class_size`` (BIGINT) + ``at_risk``
    (class_size < k).
    """
    out = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return out.withColumn("at_risk", F.col("class_size") < F.lit(k))


def k_anonymity_generalize(
    df: DataFrame,
    id_col: str,
    levels: Sequence[Sequence[Column]],
    k: int = 5,
) -> DataFrame:
    """Per-record generalization ladder: assign each row the FINEST
    generalization level whose equivalence class reaches size ``k``
    (level 0 = full quasi-identifier detail; each subsequent level is
    a coarser cut, e.g. dropping the balance band, then the segment);
    rows that stay below ``k`` even at the coarsest level get level
    ``len(levels)`` — the suppression set.  This is the classic
    domain-generalization response to a failed k-anonymity audit:
    publish each record at the least-coarse level that hides it in a
    crowd of k.

    Plan shape: one window count per level (PARTITION BY the level's
    key expressions) — L corpus shuffles for L levels, the honest cost
    of exact per-class sizes at every rung; the level pick is then a
    narrow CASE chain.  All-integer output.

    Output: ``(id_col, gen_level BIGINT, class_size BIGINT)`` where
    class_size is the size of the chosen class (coarsest-level size
    for suppressed rows).
    """
    out = df
    sizes: list[Column] = []
    for i, cols in enumerate(levels):
        w = Window.partitionBy(*cols)
        out = out.withColumn(
            f"__s{i}", F.count(F.lit(1)).over(w).cast("long")
        )
        sizes.append(F.col(f"__s{i}"))
    lvl: Column = F.lit(len(levels))
    size: Column = sizes[-1]
    for i in reversed(range(len(levels))):
        lvl = F.when(sizes[i] >= k, F.lit(i)).otherwise(lvl)
        size = F.when(sizes[i] >= k, sizes[i]).otherwise(size)
    return out.select(
        F.col(id_col),
        lvl.cast("long").alias("gen_level"),
        size.cast("long").alias("class_size"),
    )


#: floor(log10(1 + 1/d) * 10^9) for d = 1..9 — Benford's-law first-digit
#: proportions in integer parts-per-billion, precomputed once so BOTH
#: engines consume identical literals (no cross-engine log10 in the path).
BENFORD_PPB = {
    1: 301029995, 2: 176091259, 3: 124938736, 4: 96910013,
    5: 79181246, 6: 66946789, 7: 57991946, 8: 51152522, 9: 45757490,
}


def benford_profile(df, amount_cents, min_cents: int = 100):
    """Benford's-law first-digit audit over a positive money column (in
    integer cents): per leading digit, the observed count, observed and
    expected proportions in parts-per-billion, and the absolute
    deviation — the classic fabricated-data / unit-mixing screen an
    ingest DQ gate runs on financial facts.

    ``amount_cents`` is a Column of integer cents; rows below
    ``min_cents`` (default: under one currency unit) are excluded, since
    sub-unit noise has no meaningful leading digit.  The leading digit
    is taken from the BIGINT's decimal string — exact and identical in
    any engine.  Output: ``(digit, n, obs_ppb, exp_ppb, dev_ppb)``,
    always 9 rows (digits with no observations report n = 0).

    Scale shape: one full scan + ONE hash aggregate to <= 9 groups
    (map-side combined, so the shuffle moves 9 rows per task); the
    9-row total/window algebra after it is free.  All arithmetic is
    integer (ppb = (n * 10^9) div total), so the audit is engine- and
    partitioning-exact.
    """
    counts = (
        df.select(amount_cents.cast("long").alias("__cents"))
        .filter(F.col("__cents") >= min_cents)
        .select(
            F.substring(F.col("__cents").cast("string"), 1, 1)
            .cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    digits = counts.sparkSession.range(1, 10).select(
        F.col("id").alias("digit")
    )
    full = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.partitionBy(F.lit(1))
    exp_map = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPB.items() for x in kv]
    )
    return (
        full.withColumn("__total", F.sum("n").over(w))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000000L) div __total").alias("obs_ppb"),
            exp_map[F.col("digit")].cast("long").alias("exp_ppb"),
        )
        .withColumn(
            "dev_ppb",
            F.abs(F.col("obs_ppb") - F.col("exp_ppb")).cast("long"),
        )
    )
