"""Interaction-feature pipeline — the reference's first half
(reference ETL_pipeline.py:235-294, §3.1 of SURVEY.md), as one declarative
composition over the engine's operators.

Input: a `log_content`-shaped DataFrame with columns
``Contract, Mac, AppName, TotalDuration, Date``.
Output: one row per Contract with the 11 interaction feature columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import (
    argmax_label,
    bucketize,
    conditional_concat,
    recode,
    row_sum,
)
from ..operators.aggregates import distinct_count, sum_pivot, two_pass_segment

#: AppName -> viewing category (reference ETL_pipeline.py:64-72).
APP_CATEGORY = {
    "CHANNEL": "Truyen_hinh",
    "DSHD": "Truyen_hinh",
    "KPLUS": "Truyen_hinh",
    "VOD": "Phim_truyen",
    "FIMS": "Phim_truyen",
    "SPORT": "The_thao",
    "RELAX": "Giai_tri",
    "CHILD": "Thieu_nhi",
}

#: Fixed category order — load-bearing for MostWatch tie-breaks and
#: CustomerTaste ordering (reference ETL_pipeline.py:90-95,100-106).
CATEGORIES = ("Truyen_hinh", "Phim_truyen", "The_thao", "Giai_tri", "Thieu_nhi")

#: Days-active -> Activeness buckets (reference ETL_pipeline.py:52-57).
ACTIVENESS_BUCKETS = (
    (1, 7, "very low"),
    (8, 14, "low"),
    (15, 21, "moderate"),
    (22, 28, "high"),
    (29, 31, "very high"),
)


def customer_type_case(cutoffs: list[float]):
    """CustomerType CASE over (Activeness, TotalDuration) given
    [Q1, median, Q3] (reference ETL_pipeline.py:135-143)."""
    q1, median, _q3 = cutoffs
    a, d = F.col("Activeness"), F.col("TotalDuration")
    return (
        F.when((a == "very low") & (d < q1), "leaving")
        .when((a == "low") & (d < median), "need attention")
        .when((a == "moderate") & (d < median), "normal")
        .when((a == "moderate") & (d >= median), "potential")
        .when((a == "high") & (d > q1), "loyal")
        .when((a == "very high") & (d > q1), "VIP")
        .otherwise("anomaly")
    )


def interaction_features(
    log_content: DataFrame,
    exact_quantiles: bool = True,
    quantile_accuracy: int = 10000,
) -> DataFrame:
    """Full §3.1 pipeline: devices + activeness + category pivot +
    MostWatch + CustomerTaste + CustomerType.

    Plan shape at scale: three aggregations over the same ``Contract``
    key (devices, activeness, pivot) — each one shuffle with map-side
    partial agg — then two joins back on ``Contract``. AQE turns the
    feature-table joins into broadcast joins when the aggregated sides
    are small relative to the fact table (they are: one row per
    customer).
    """
    devices = distinct_count(log_content, ["Contract"], "Mac", "TotalDevices")

    active_days = distinct_count(log_content, ["Contract"], "Date", "Days_Active")
    activeness = (
        active_days.withColumn(
            "Activeness", bucketize("Days_Active", ACTIVENESS_BUCKETS)
        )
        .filter(F.col("Activeness") != "error")
        .select("Contract", "Activeness")
    )

    categorized = (
        log_content.withColumn("Type", recode("AppName", APP_CATEGORY))
        .filter(F.col("Contract") != "0")
        .filter(F.col("Type") != "error")
        .select("Contract", "Type", "TotalDuration")
    )
    wide = sum_pivot(
        categorized,
        keys=["Contract"],
        pivot_col="Type",
        pivot_values=list(CATEGORIES),
        value_col="TotalDuration",
        fill=0,
    )

    wide = wide.withColumn("MostWatch", argmax_label([(c, c) for c in CATEGORIES]))
    wide = wide.withColumn(
        "CustomerTaste", conditional_concat("-", [(c, c) for c in CATEGORIES])
    )

    feats = wide.join(activeness, on=["Contract"], how="inner").join(
        devices, on=["Contract"], how="inner"
    )

    feats = feats.withColumn("TotalDuration", row_sum(*CATEGORIES))
    feats = two_pass_segment(
        feats,
        "TotalDuration",
        customer_type_case,
        exact=exact_quantiles,
        accuracy=quantile_accuracy,
        alias="CustomerType",
    )

    return feats.select(
        "Contract",
        *[F.col(c).alias(f"Total_{c}") for c in CATEGORIES],
        "TotalDevices",
        "MostWatch",
        "CustomerTaste",
        "Activeness",
        "CustomerType",
    )
