"""Bloom-filter join pruning (runtime-filter technique, explicit form).

At 100 TB the dominant cost of a selective fact-dim join is the fact
scan + shuffle feeding rows that the join will discard.  Spark 3.3+ can
inject a bloom runtime filter itself
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``), but the
built-in form is planner-discretionary and its hash is not replayable in
another engine.  This module is the explicit, engine-portable version:

- ``bloom_build`` aggregates the (small, already-filtered) key side into
  a fixed-size bitset: k md5-derived hash positions per key, words
  combined with ``bit_or``.  The result is at most ``m_words`` int64
  rows, collected to the driver — the bounded scalar-broadcast pattern
  (the collect is O(m_words), never O(keys), and m_words is a
  constructor constant).
- ``bloom_contains`` is a pure in-row column expression over the word
  array literal: zero shuffle, zero join, codegen-clean.  Applied as a
  ``.where`` BEFORE the join, it prunes the fact scan to
  (matches + false positives); the exact join afterwards removes the
  false positives, so the composition is semantics-preserving for ANY
  hash quality — the bloom only moves work, never changes answers.

Bit layout: 63 usable bits per int64 word (bit index = h % 63) so no
mask ever needs bit 63 — ``1 << 63`` overflows to the sign bit and
engines disagree on semantics there; with 63-bit words every mask and
every ``&`` stays in non-negative int64 range in both Spark and DuckDB,
making the false-positive SET itself exactly replayable cross-engine.

Hashes are ``conv(substring(md5(key || ':' || i), 1, 15), 16, 10)``
(60-bit positive ints, the repo's portable-hash idiom) reduced mod
``m_words * 63``.

False-positive math (standard bloom bound): with n keys, m = 63 *
m_words bits and k probes, fp ~= (1 - e^(-k*n/m))^k.  Size m_words so
m/n >= ~10 at the expected key count; the default k=3 then gives fp
under ~2%, i.e. the fact shuffle shrinks to within 2% of its true
match volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Usable bits per int64 word (bit 63 avoided — see module docstring).
BITS_PER_WORD = 63


def _hash_positions(key: Column, m_words: int, k: int) -> list[Column]:
    """The k bit positions (0 .. m_words*63 - 1) probed for ``key``."""
    out = []
    for i in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(i)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        out.append(h % F.lit(m_words * BITS_PER_WORD))
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_words: int = 512, k: int = 3
) -> list[int]:
    """Aggregate ``keys[key_col]`` into a bloom bitset.

    One pass over the key side: explode each key into its k bit
    positions, ``bit_or`` the masks per word.  Returns the full dense
    word array (length ``m_words``, missing words zero-filled) as a
    Python list — bounded by construction, independent of |keys|.
    """
    pos = F.explode(F.array(*_hash_positions(F.col(key_col), m_words, k)))
    rows = (
        keys.select(pos.alias("__p"))
        .select(
            (F.col("__p") / F.lit(BITS_PER_WORD))
            .cast("long")
            .alias("word"),
            F.expr(
                f"shiftleft(cast(1 as bigint),"
                f" cast(__p % {BITS_PER_WORD} as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * m_words
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


def bloom_contains(
    key: Column, words: list[int], k: int = 3
) -> Column:
    """Boolean column: ``key`` possibly-in the set ``words`` encodes.

    Pure in-row expression (array literal + bit tests) — no shuffle, no
    join; safe to push below any join as a fact-scan prefilter.  May
    return true for non-members (bounded fp rate, see module docstring),
    never false for members.
    """
    m_words = len(words)
    arr = F.lit(words)
    # 63 single-bit masks as an int64 array literal: mask lookup stays
    # integral (no shiftleft-by-column, which PySpark's F.shiftleft
    # cannot express) and in-row.
    masks = F.lit([1 << b for b in range(BITS_PER_WORD)])
    cond = F.lit(True)
    for p in _hash_positions(key, m_words, k):
        word = (p / F.lit(BITS_PER_WORD)).cast("long")
        mask = F.element_at(
            masks, ((p % F.lit(BITS_PER_WORD)) + 1).cast("int")
        )
        cond = cond & (
            F.element_at(arr, (word + 1).cast("int")).bitwiseAND(mask)
            != 0
        )
    return cond


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    m_words: int = 512,
    k: int = 3,
) -> DataFrame:
    """``fact`` filtered to rows whose ``fact_key`` passes the bloom
    built from ``keys[key_col]`` — the one-call form of build + probe.

    The returned frame still contains false positives (bounded rate);
    follow with the exact join.  The point is that the rows REMOVED
    here never reach the join's shuffle.
    """
    words = bloom_build(keys, key_col, m_words=m_words, k=k)
    return fact.where(bloom_contains(F.col(fact_key), words, k=k))
