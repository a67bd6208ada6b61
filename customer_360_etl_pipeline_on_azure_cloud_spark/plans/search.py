"""Search-behavior trend pipeline — the reference's second half
(reference ETL_pipeline.py:148-196,301-349; SURVEY.md §3.2).

Input: a `log_search`-shaped DataFrame (``month, user_id, keyword``) and a
keyword->category mapping dimension.
Output: one row per user present in BOTH periods, with the most-searched
keyword per period, its category, and the trend columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import lookup
from ..operators.windows import top_k_per_group


def most_searched_per_period(
    df: DataFrame,
    period_col: str = "month",
    user_col: str = "user_id",
    term_col: str = "keyword",
) -> DataFrame:
    """Top-1 search term per (period, user) with a DETERMINISTIC
    tiebreak (count desc, then term asc) — the reference's bare
    ``row_number`` over count desc breaks ties arbitrarily
    (reference ETL_pipeline.py:153-158; SURVEY.md §0.1).
    """
    counts = df.groupBy(period_col, user_col, term_col).count()
    return top_k_per_group(
        counts,
        keys=[period_col, user_col],
        order_by=[F.col("count").desc(), F.col(term_col).asc()],
        k=1,
    ).select(period_col, user_col, term_col)


def period_pivot(
    top_terms: DataFrame,
    period_a,
    period_b,
    period_col: str = "month",
    user_col: str = "user_id",
    term_col: str = "keyword",
    prefix: str = "most_search_",
) -> DataFrame:
    """Two-period pivot of the top term, inner-joined on user
    (reference ETL_pipeline.py:160-168) — expressed as ONE aggregation
    instead of the reference's filter+filter+self-join: a conditional
    max per period shuffles the data once and needs no join at all.
    """
    a_name = f"{prefix}{period_a}"
    b_name = f"{prefix}{period_b}"
    pc, tc = F.col(period_col), F.trim(F.col(term_col))
    out = (
        top_terms.groupBy(user_col)
        .agg(
            F.max(F.when(pc == period_a, tc)).alias(a_name),
            F.max(F.when(pc == period_b, tc)).alias(b_name),
        )
        .filter(F.col(a_name).isNotNull() & F.col(b_name).isNotNull())
    )
    return out


def trend_columns(
    df: DataFrame, cat_a: str, cat_b: str
) -> DataFrame:
    """Trending_Type / Previous columns (reference ETL_pipeline.py:190-196).
    NULL categories compare as not-equal -> 'Changed', matching the
    reference's null semantics."""
    eq = F.col(cat_a) == F.col(cat_b)
    df = df.withColumn("Trending_Type", F.when(eq, "Unchanged").otherwise("Changed"))
    return df.withColumn(
        "Previous",
        F.when(eq, "Unchanged").otherwise(
            F.concat_ws(" -> ", F.col(cat_a), F.col(cat_b))
        ),
    )


def search_trends(
    log_search: DataFrame,
    mapping: DataFrame,
    period_a=6,
    period_b=7,
    period_col: str = "month",
) -> DataFrame:
    """Full §3.2 pipeline. ``mapping`` has columns (search, category) and
    is broadcast for both category lookups."""
    clean = log_search.filter(
        F.col("user_id").isNotNull() & F.col("keyword").isNotNull()
    ).filter(F.col(period_col).isin(period_a, period_b))

    top = most_searched_per_period(clean, period_col=period_col)
    pivoted = period_pivot(top, period_a, period_b, period_col=period_col)

    a_name = f"most_search_{period_a}"
    b_name = f"most_search_{period_b}"
    cat_a = f"category_{period_a}"
    cat_b = f"category_{period_b}"
    enriched = lookup(pivoted, mapping, a_name, "search", ["category"], alias=cat_a)
    enriched = lookup(enriched, mapping, b_name, "search", ["category"], alias=cat_b)
    return trend_columns(enriched, cat_a, cat_b)
