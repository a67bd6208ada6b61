"""Bloom-filter join pruning (operators/bloom.py).

Pins the three properties the operator's contract rests on:
no false negatives (ever), semantics preservation of the
prune-then-join composition, and the bounded false-positive rate at
the documented sizing.  Plus plan shape: the probe adds no Exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_contains,
    bloom_prune,
)


def test_no_false_negatives(spark):
    # every member key must pass, for several disjoint key sets
    for lo, hi in [(0, 50), (1000, 1100), (7, 8)]:
        keys = spark.range(lo, hi).withColumnRenamed("id", "k")
        words = bloom_build(keys, "k", m_words=64, k=3)
        passed = (
            spark.range(lo, hi)
            .where(bloom_contains(F.col("id"), words, k=3))
            .count()
        )
        assert passed == hi - lo


def test_prune_then_join_preserves_join_semantics(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("v")
    )
    keys = spark.range(0, 700, 13).withColumnRenamed("id", "k")
    plain = (
        fact.join(keys, fact.fk == keys.k)
        .agg(F.count(F.lit(1)), F.sum("v"))
        .collect()
    )
    pruned = (
        bloom_prune(fact, "fk", keys, "k", m_words=16, k=2)  # tiny → fp-heavy
        .join(keys, F.col("fk") == keys.k)
        .agg(F.count(F.lit(1)), F.sum("v"))
        .collect()
    )
    assert plain == pruned


def test_false_positive_rate_bounded(spark):
    import math

    n, m_words, k = 500, 512, 3
    keys = spark.range(0, n).withColumnRenamed("id", "k")
    words = bloom_build(keys, "k", m_words=m_words, k=k)
    # probe 20k keys strictly outside the member set
    probes = 20000
    fp = (
        spark.range(10**6, 10**6 + probes)
        .where(bloom_contains(F.col("id"), words, k=k))
        .count()
    )
    m = m_words * BITS_PER_WORD
    expect = (1 - math.exp(-k * n / m)) ** k
    # generous x3 envelope on the standard bound — failures here mean
    # the hash positions are not spreading, not statistical bad luck
    assert fp / probes <= 3 * expect + 1e-9
    assert fp > 0  # the tiny-m configuration must actually collide


def test_empty_key_set_passes_nothing(spark):
    keys = spark.range(0).withColumnRenamed("id", "k")
    words = bloom_build(keys, "k", m_words=32, k=3)
    assert words == [0] * 32
    assert (
        spark.range(0, 100)
        .where(bloom_contains(F.col("id"), words, k=3))
        .count()
        == 0
    )


def test_probe_is_exchange_free(spark):
    keys = spark.range(0, 100).withColumnRenamed("id", "k")
    words = bloom_build(keys, "k", m_words=64, k=3)
    plan = (
        spark.range(0, 1000)
        .where(bloom_contains(F.col("id"), words, k=3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # prefilter = pure in-row scan work
