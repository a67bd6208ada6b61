"""Driver-contract queries: every SURVEY.md §2 operator cast onto the
testdata star schema (FIXTURES.md §B), each paired with an ANSI-SQL
oracle that DuckDB runs on the same parquet.

Cross-engine exactness rules used throughout (so the driver's
order-insensitive value hash can never drift):

* Money aggregates go through integer CENTS (``ROUND(x*100) -> BIGINT``)
  on BOTH engines before SUM — integer sums are associative, so they are
  bit-identical under any partitioning (and any engine). Dollars are
  reconstructed with the identical ``CAST(sum AS DOUBLE)/100.0`` tree.
* Ratio outputs use the identical expression tree on both sides, so IEEE
  evaluation matches bit-for-bit.
* Ranking/top-k always carries an explicit total order (tiebreak column).
* Row-number/size outputs are cast to BIGINT on the Spark side (Spark's
  row_number/size return int32; DuckDB's return int64).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scalar import (
    argmax_label,
    bucketize,
    conditional_concat,
    money_cents,
    recode,
)
from .operators.aggregates import distinct_count, quantile_cutoffs, sum_pivot
from .operators.cleaning import dedup_deterministic
from .operators.joins import lookup, positional_zip
from .operators.sets import union_by_name_all
from .operators.windows import top_k_per_group
from .operators.util import sf_tag
from .session import tune
from .sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# --- shared fragments -----------------------------------------------------

#: SQL twin of functions.scalar.money_cents — keep in lockstep.
def _cents_sql(col: str) -> str:
    return f"CAST(ROUND({col} * 100, 0) AS BIGINT)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark, shuffle_partitions=32)
    return load_table(spark, sf_dir, name)


#: Month-count buckets for the activeness analogues (reference buckets are
#: day-counts 1-31, ETL_pipeline.py:52-57; orders span calendar months 1-12).
MONTH_BUCKETS = (
    (1, 3, "very low"),
    (4, 6, "low"),
    (7, 8, "moderate"),
    (9, 10, "high"),
    (11, 12, "very high"),
)

DAY_BUCKETS = (
    (1, 7, "very low"),
    (8, 14, "low"),
    (15, 21, "moderate"),
    (22, 28, "high"),
    (29, 31, "very high"),
)

#: event_type -> category dimension for the trend queries (the analogue of
#: the reference's keyword->category mapping.csv; 'error' is deliberately
#: unmapped so NULL-category -> 'Changed' semantics get exercised,
#: reference ETL_pipeline.py:190-196).
EVENT_CATEGORY = (
    ("click", "engagement"),
    ("view", "content"),
    ("purchase", "commerce"),
    ("signup", "growth"),
)
EVENT_CATEGORY_SQL = (
    "(VALUES ('click','engagement'),('view','content'),"
    "('purchase','commerce'),('signup','growth')) AS m(etype, category)"
)


def _dim_event_category(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(EVENT_CATEGORY), ["etype", "category"])


def _dot(a, b):
    """Sequential-fold dot product over array<double> — same reduction
    order as the oracle's list_dot_product, so results match bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# --- S: scans + P: filters + A: aggregates --------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with exact money arithmetic.

    Covers P1/P4 (pushed filter), A3 (multi-key agg), F9/F10. The filter
    and the 7-column projection reach the parquet scan (PushedFilters +
    ReadSchema) — at 100 TB this is the difference between reading 7 and
    16 columns.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    base_c = money_cents("l_extendedprice")
    disc_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    charge_c = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100,
        0,
    ).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        (F.sum(base_c) / F.lit(100.0)).alias("sum_base"),
        (F.sum(disc_c) / F.lit(100.0)).alias("sum_disc_price"),
        (F.sum(charge_c) / F.lit(100.0)).alias("sum_charge"),
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(base_c) / F.lit(100.0) / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


SQL_PRICING_SUMMARY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
  CAST(SUM({_cents_sql('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
  SUM(l_quantity) / COUNT(*) AS avg_qty,
  CAST(SUM({_cents_sql('l_extendedprice')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: exact COUNT(DISTINCT) per group — the reference's TotalDevices
    (ETL_pipeline.py:41-44). Engine also exposes approx_count_distinct
    (HLL++) as the 100 TB path; the exact form is what the oracle checks.
    """
    li = _t(spark, sf_dir, "lineitem")
    return distinct_count(li, ["l_suppkey"], "l_partkey", "distinct_parts")


SQL_SUPPLIER_DISTINCT_PARTS = """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_suppkey
"""


def q_user_activeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+F1/F2: distinct active days per user, bucketed — the reference's
    Days_Active/Activeness (ETL_pipeline.py:46-60)."""
    ev = _t(spark, sf_dir, "events")
    days = ev.groupBy("user_id").agg(
        F.countDistinct(F.to_date("ts")).alias("days_active")
    )
    return days.withColumn(
        "activeness", bucketize("days_active", DAY_BUCKETS)
    ).filter(F.col("activeness") != "error")


SQL_USER_ACTIVENESS = """
WITH d AS (
  SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS days_active
  FROM events GROUP BY user_id
)
SELECT user_id, days_active,
  CASE WHEN days_active BETWEEN 1 AND 7 THEN 'very low'
       WHEN days_active BETWEEN 8 AND 14 THEN 'low'
       WHEN days_active BETWEEN 15 AND 21 THEN 'moderate'
       WHEN days_active BETWEEN 22 AND 28 THEN 'high'
       WHEN days_active BETWEEN 29 AND 31 THEN 'very high'
       ELSE 'error' END AS activeness
FROM d
WHERE (CASE WHEN days_active BETWEEN 1 AND 7 THEN 'very low'
       WHEN days_active BETWEEN 8 AND 14 THEN 'low'
       WHEN days_active BETWEEN 15 AND 21 THEN 'moderate'
       WHEN days_active BETWEEN 22 AND 28 THEN 'high'
       WHEN days_active BETWEEN 29 AND 31 THEN 'very high'
       ELSE 'error' END) <> 'error'
"""


def q_priority_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 recode + P4 sentinel-drop — the reference's AppName->Type chain
    with otherwise('error') then filter (ETL_pipeline.py:63-76).
    '5-LOW' is intentionally unmapped so the error-drop path is exercised.
    """
    o = _t(spark, sf_dir, "orders")
    mapping = {
        "1-URGENT": "urgent",
        "2-HIGH": "urgent",
        "3-MEDIUM": "normal",
        "4-NOT SPECIFIED": "low",
    }
    out = (
        o.withColumn("priority_class", recode("o_orderpriority", mapping))
        .filter(F.col("priority_class") != "error")
        .groupBy("priority_class")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(money_cents("o_totalprice")) / F.lit(100.0)).alias("revenue"),
        )
    )
    return out


SQL_PRIORITY_RECODE = f"""
WITH r AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
              WHEN o_orderpriority = '2-HIGH' THEN 'urgent'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
              WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'low'
              ELSE 'error' END AS priority_class,
         o_totalprice
  FROM orders
)
SELECT priority_class, COUNT(*) AS n_orders,
       CAST(SUM({_cents_sql('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue
FROM r WHERE priority_class <> 'error'
GROUP BY priority_class
"""


def q_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4+P8: sum + pivot with DECLARED values + fillna(0) — the
    reference's category-totals wide table (ETL_pipeline.py:79-86).
    Declared pivot values mean a single hash aggregate and no eager
    distinct-values job."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", money_cents("l_extendedprice")
    )
    wide = sum_pivot(
        li, ["l_suppkey"], "l_returnflag", ["A", "N", "R"], "cents", fill=0
    )
    return wide.select(
        "l_suppkey",
        (F.col("A") / F.lit(100.0)).alias("total_a"),
        (F.col("N") / F.lit(100.0)).alias("total_n"),
        (F.col("R") / F.lit(100.0)).alias("total_r"),
    )


def _pivot_cents_sql() -> str:
    c = _cents_sql("l_extendedprice")
    return f"""
  SELECT l_suppkey,
    COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN {c} END), 0) AS a,
    COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN {c} END), 0) AS n,
    COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN {c} END), 0) AS r
  FROM lineitem GROUP BY l_suppkey
"""


SQL_RETURNFLAG_PIVOT = f"""
WITH p AS ({_pivot_cents_sql()})
SELECT l_suppkey,
  CAST(a AS DOUBLE) / 100.0 AS total_a,
  CAST(n AS DOUBLE) / 100.0 AS total_n,
  CAST(r AS DOUBLE) / 100.0 AS total_r
FROM p
"""


def q_supplier_most_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 argmax with fixed-order tiebreak — the reference's MostWatch
    (ETL_pipeline.py:88-96): first column equal to greatest(...) wins."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", money_cents("l_extendedprice")
    )
    wide = sum_pivot(
        li, ["l_suppkey"], "l_returnflag", ["A", "N", "R"], "cents", fill=0
    )
    return wide.select(
        "l_suppkey",
        argmax_label([("A", "A"), ("N", "N"), ("R", "R")]).alias("most_flag"),
    )


SQL_SUPPLIER_MOST_FLAG = f"""
WITH p AS ({_pivot_cents_sql()})
SELECT l_suppkey,
  CASE WHEN a >= n AND a >= r THEN 'A'
       WHEN n >= a AND n >= r THEN 'N'
       ELSE 'R' END AS most_flag
FROM p
"""


def q_supplier_flag_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 conditional concat_ws (null parts skipped) — the reference's
    CustomerTaste (ETL_pipeline.py:98-107)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", money_cents("l_extendedprice")
    )
    wide = sum_pivot(
        li, ["l_suppkey"], "l_returnflag", ["A", "N", "R"], "cents", fill=0
    )
    return wide.select(
        "l_suppkey",
        conditional_concat("-", [("A", "A"), ("N", "N"), ("R", "R")]).alias(
            "flag_mix"
        ),
    )


SQL_SUPPLIER_FLAG_MIX = f"""
WITH p AS ({_pivot_cents_sql()})
SELECT l_suppkey,
  concat_ws('-',
    CASE WHEN a <> 0 THEN 'A' END,
    CASE WHEN n <> 0 THEN 'N' END,
    CASE WHEN r <> 0 THEN 'R' END) AS flag_mix
FROM p
"""


def q_customer_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 two-pass quantile segmentation + F1/F10 — the reference's
    CustomerType (ETL_pipeline.py:110-145): pass 1 collects ONE ROW of
    quantile scalars, pass 2 folds them into a CASE expression. Exact
    ``percentile`` here (the engine keeps percentile_approx with
    configurable accuracy as the 100 TB path; the reference hardcodes a
    coarse accuracy=100)."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(money_cents("o_totalprice")).alias("spend_cents"),
        F.countDistinct(F.month("o_orderdate")).alias("active_months"),
    )
    spend = spend.withColumn(
        "activeness", bucketize("active_months", MONTH_BUCKETS)
    )
    q1, median, _q3 = quantile_cutoffs(spend, "spend_cents", exact=True)
    a, d = F.col("activeness"), F.col("spend_cents")
    ctype = (
        F.when((a == "very low") & (d < q1), "leaving")
        .when((a == "low") & (d < median), "need attention")
        .when((a == "moderate") & (d < median), "normal")
        .when((a == "moderate") & (d >= median), "potential")
        .when((a == "high") & (d > q1), "loyal")
        .when((a == "very high") & (d > q1), "VIP")
        .otherwise("anomaly")
    )
    return spend.select(
        F.col("o_custkey").alias("custkey"),
        "activeness",
        ctype.alias("customer_type"),
    )


SQL_CUSTOMER_SEGMENTATION = f"""
WITH s AS (
  SELECT o_custkey,
         SUM({_cents_sql('o_totalprice')}) AS spend_cents,
         COUNT(DISTINCT MONTH(o_orderdate)) AS active_months
  FROM orders GROUP BY o_custkey
), b AS (
  SELECT o_custkey, spend_cents,
    CASE WHEN active_months BETWEEN 1 AND 3 THEN 'very low'
         WHEN active_months BETWEEN 4 AND 6 THEN 'low'
         WHEN active_months BETWEEN 7 AND 8 THEN 'moderate'
         WHEN active_months BETWEEN 9 AND 10 THEN 'high'
         WHEN active_months BETWEEN 11 AND 12 THEN 'very high'
         ELSE 'error' END AS activeness
  FROM s
), q AS (
  SELECT quantile_cont(spend_cents, [0.25, 0.5, 0.75]) AS qs FROM b
)
SELECT o_custkey AS custkey, activeness,
  CASE WHEN activeness = 'very low' AND spend_cents < qs[1] THEN 'leaving'
       WHEN activeness = 'low' AND spend_cents < qs[2] THEN 'need attention'
       WHEN activeness = 'moderate' AND spend_cents < qs[2] THEN 'normal'
       WHEN activeness = 'moderate' AND spend_cents >= qs[2] THEN 'potential'
       WHEN activeness = 'high' AND spend_cents > qs[1] THEN 'loyal'
       WHEN activeness = 'very high' AND spend_cents > qs[1] THEN 'VIP'
       ELSE 'anomaly' END AS customer_type
FROM b, q
"""


# --- W: windows + J: joins -------------------------------------------------


def _events_with_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn(
        "period", F.when(F.dayofmonth("ts") <= 15, "p1").otherwise("p2")
    )


PERIOD_SQL = "CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 'p1' ELSE 'p2' END"


def q_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+W1: top-1 per group with DETERMINISTIC tiebreak — the
    reference's most-searched keyword (ETL_pipeline.py:153-158) whose bare
    row_number breaks ties arbitrarily; here order is total:
    (count DESC, event_type ASC)."""
    ev = _events_with_period(spark, sf_dir)
    counts = ev.groupBy("period", "user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = top_k_per_group(
        counts,
        keys=["period", "user_id"],
        order_by=[F.col("n").desc(), F.col("event_type").asc()],
        k=1,
    )
    return top.select("period", "user_id", F.col("event_type").alias("top_event"), "n")


SQL_TOP_EVENT_PER_USER = f"""
WITH c AS (
  SELECT {PERIOD_SQL} AS period, user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT period, user_id, event_type AS top_event, n
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY period, user_id ORDER BY n DESC, event_type) = 1
"""


def q_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 period-pivot + J3 broadcast dim lookup x2 + Trending/Previous —
    the reference's full search-trend tail (ETL_pipeline.py:160-196).
    The top-1-per-(period,user) AND the two-period pivot are fused into
    ONE conditional hash aggregate (no window, no sort, no self-join):
    ``min(when(period=pX, struct(-n, event_type)))`` is the argmax with
    n DESC / event_type ASC tiebreak (min skips the NULLs of the other
    period), computed per user in the same pass that pivots. Two
    shuffles total — groupBy(period,user,etype) then groupBy(user) —
    both with map-side partial aggregation; the previous window form
    added a third shuffle plus a per-partition sort and regressed 3.3x
    under host noise (VERDICT r1). The category dim is broadcast.
    'error' events are unmapped -> NULL category -> 'Changed', matching
    reference NULL semantics."""
    ev = _events_with_period(spark, sf_dir)
    counts = ev.groupBy("period", "user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )

    def _top_for(period: str) -> Column:
        return F.min(
            F.when(
                F.col("period") == period,
                F.struct((-F.col("n")).alias("__neg_n"), F.col("event_type")),
            )
        )

    pivoted = (
        counts.groupBy("user_id")
        .agg(
            _top_for("p1")["event_type"].alias("most_p1"),
            _top_for("p2")["event_type"].alias("most_p2"),
        )
        .filter(F.col("most_p1").isNotNull() & F.col("most_p2").isNotNull())
    )
    dim = _dim_event_category(spark)
    out = lookup(pivoted, dim, "most_p1", "etype", ["category"], alias="category_p1")
    out = lookup(out, dim, "most_p2", "etype", ["category"], alias="category_p2")
    eq = F.col("category_p1") == F.col("category_p2")
    return out.withColumn(
        "trending_type", F.when(eq, "Unchanged").otherwise("Changed")
    ).withColumn(
        "previous",
        F.when(eq, "Unchanged").otherwise(
            F.concat_ws(" -> ", F.col("category_p1"), F.col("category_p2"))
        ),
    )


SQL_USER_TREND = f"""
WITH c AS (
  SELECT {PERIOD_SQL} AS period, user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
), top AS (
  SELECT period, user_id, event_type
  FROM c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY period, user_id ORDER BY n DESC, event_type) = 1
), piv AS (
  SELECT user_id,
         MAX(CASE WHEN period = 'p1' THEN event_type END) AS most_p1,
         MAX(CASE WHEN period = 'p2' THEN event_type END) AS most_p2
  FROM top GROUP BY user_id
), both_p AS (
  SELECT * FROM piv WHERE most_p1 IS NOT NULL AND most_p2 IS NOT NULL
), enr AS (
  SELECT b.user_id, b.most_p1, b.most_p2, m1.category AS category_p1, m2.category AS category_p2
  FROM both_p b
  LEFT JOIN {EVENT_CATEGORY_SQL.replace('m(etype', 'm1(etype')} ON b.most_p1 = m1.etype
  LEFT JOIN {EVENT_CATEGORY_SQL.replace('m(etype', 'm2(etype')} ON b.most_p2 = m2.etype
)
SELECT user_id, most_p1, most_p2, category_p1, category_p2,
  CASE WHEN category_p1 = category_p2 THEN 'Unchanged' ELSE 'Changed' END AS trending_type,
  CASE WHEN category_p1 = category_p2 THEN 'Unchanged'
       ELSE concat_ws(' -> ', category_p1, category_p2) END AS previous
FROM enr
"""


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: snowflake broadcast-join chain customer->nation->region with
    rollup — the reference's feature-join shape (ETL_pipeline.py:285-286)
    over proper dimensions. Both dims are broadcast: zero shuffle on the
    fact side until the final 5-group aggregate."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("customers"),
        F.countDistinct("n_name").alias("nations"),
        (F.sum(money_cents("c_acctbal")) / F.lit(100.0)).alias("total_acctbal"),
    )


SQL_REGION_ROLLUP = f"""
SELECT r_name, COUNT(*) AS customers, COUNT(DISTINCT n_name) AS nations,
       CAST(SUM({_cents_sql('c_acctbal')}) AS DOUBLE) / 100.0 AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 fixed: deterministic positional zip via row_number over an
    explicit total order — the well-defined replacement for the
    reference's monotonically_increasing_id pairing
    (ETL_pipeline.py:356-362; SURVEY.md §0.1)."""
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    wl = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    wr = Window.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    left = (
        c.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= 100)
        .select("c_custkey", "c_name")
    )
    right = (
        p.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 100)
        .select("p_partkey", "p_name")
    )
    return positional_zip(
        left,
        right,
        left_order=[F.col("c_name"), F.col("c_custkey")],
        right_order=[F.col("p_name"), F.col("p_partkey")],
        keep_index=True,
    ).select("zip_index", "c_custkey", "c_name", "p_partkey", "p_name")


SQL_POSITIONAL_ZIP = """
WITH lt AS (
  SELECT c_custkey, c_name FROM customer
  QUALIFY ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) <= 100
), rt AS (
  SELECT p_partkey, p_name FROM part
  QUALIFY ROW_NUMBER() OVER (ORDER BY p_retailprice DESC, p_partkey) <= 100
), li AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS zip_index, c_custkey, c_name FROM lt
), ri AS (
  SELECT ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS zip_index, p_partkey, p_name FROM rt
)
SELECT li.zip_index, c_custkey, c_name, p_partkey, p_name
FROM li JOIN ri USING (zip_index)
"""


def q_union_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of two projections with different column order —
    the reference's daily-union loop (ETL_pipeline.py:256-260) minus the
    per-iteration cache anti-pattern (a union is purely logical)."""
    ev = _t(spark, sf_dir, "events")
    a = (
        ev.filter(F.dayofmonth("ts") <= 15)
        .select("event_id", "user_id", "event_type")
        .withColumn("half", F.lit("h1"))
    )
    b = (
        ev.filter(F.dayofmonth("ts") > 15)
        .select("event_type", "event_id", "user_id")
        .withColumn("half", F.lit("h2"))
    )
    return union_by_name_all([a, b]).select(
        "event_id", "user_id", "event_type", "half"
    )


SQL_UNION_HALVES = """
SELECT event_id, user_id, event_type, 'h1' AS half FROM events WHERE EXTRACT(day FROM ts) <= 15
UNION ALL
SELECT event_id, user_id, event_type, 'h2' AS half FROM events WHERE EXTRACT(day FROM ts) > 15
"""


def q_dedup_user_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 deterministic dedup: keep the lowest-event_id row per
    (user_id, event_type) — replaces arbitrary-survivor
    dropDuplicates(subset) (ETL_pipeline.py:302; SURVEY.md §0.1)."""
    ev = _t(spark, sf_dir, "events")
    return dedup_deterministic(
        ev, ["user_id", "event_type"], order_by=["event_id"]
    ).select("event_id", "user_id", "event_type", "value")


SQL_DEDUP_USER_EVENT = """
SELECT event_id, user_id, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
"""


def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension surface: JSON property extraction over events.props
    (semi-structured column), aggregated per event type."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.sum("k").alias("k_sum"),
        F.max("k").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_PROPS_JSON = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --- flagship composite -----------------------------------------------------


def q_supplier_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full interaction-feature pipeline shape
    (§3.1 — pivot + argmax + taste + distinct-count + two-pass quantile
    segmentation + broadcast dim join), recast per-supplier.

    Plan shape: two aggregations over lineitem on the same l_suppkey key
    (pivot, distinct parts) + broadcast supplier-dim join + scalar
    quantile pass. Everything shuffles on one key; feature joins stay
    broadcast under AQE."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", money_cents("l_extendedprice")
    )
    wide = sum_pivot(
        li, ["l_suppkey"], "l_returnflag", ["A", "N", "R"], "cents", fill=0
    )
    wide = wide.withColumn(
        "most_flag", argmax_label([("A", "A"), ("N", "N"), ("R", "R")])
    ).withColumn(
        "flag_mix", conditional_concat("-", [("A", "A"), ("N", "N"), ("R", "R")])
    )
    wide = wide.withColumn(
        "total_cents", F.col("A") + F.col("N") + F.col("R")
    )
    parts = distinct_count(li, ["l_suppkey"], "l_partkey", "distinct_parts")
    feats = wide.join(parts, on=["l_suppkey"], how="inner")
    q1, median, q3 = quantile_cutoffs(feats, "total_cents", exact=True)
    band = (
        F.when(F.col("total_cents") < q1, "B1")
        .when(F.col("total_cents") < median, "B2")
        .when(F.col("total_cents") < q3, "B3")
        .otherwise("B4")
    )
    sup = _t(spark, sf_dir, "supplier")
    feats = lookup(feats, sup, "l_suppkey", "s_suppkey", ["s_name"])
    return feats.select(
        "l_suppkey",
        "s_name",
        (F.col("A") / F.lit(100.0)).alias("total_a"),
        (F.col("N") / F.lit(100.0)).alias("total_n"),
        (F.col("R") / F.lit(100.0)).alias("total_r"),
        "distinct_parts",
        "most_flag",
        "flag_mix",
        band.alias("revenue_band"),
    )


SQL_SUPPLIER_360 = f"""
WITH p AS ({_pivot_cents_sql()}
), parts AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS distinct_parts
  FROM lineitem GROUP BY l_suppkey
), feats AS (
  SELECT p.l_suppkey, p.a, p.n, p.r, (p.a + p.n + p.r) AS total_cents, parts.distinct_parts
  FROM p JOIN parts ON p.l_suppkey = parts.l_suppkey
), q AS (
  SELECT quantile_cont(total_cents, [0.25, 0.5, 0.75]) AS qs FROM feats
)
SELECT f.l_suppkey, s.s_name,
  CAST(f.a AS DOUBLE) / 100.0 AS total_a,
  CAST(f.n AS DOUBLE) / 100.0 AS total_n,
  CAST(f.r AS DOUBLE) / 100.0 AS total_r,
  f.distinct_parts,
  CASE WHEN f.a >= f.n AND f.a >= f.r THEN 'A'
       WHEN f.n >= f.a AND f.n >= f.r THEN 'N'
       ELSE 'R' END AS most_flag,
  concat_ws('-',
    CASE WHEN f.a <> 0 THEN 'A' END,
    CASE WHEN f.n <> 0 THEN 'N' END,
    CASE WHEN f.r <> 0 THEN 'R' END) AS flag_mix,
  CASE WHEN f.total_cents < qs[1] THEN 'B1'
       WHEN f.total_cents < qs[2] THEN 'B2'
       WHEN f.total_cents < qs[3] THEN 'B3'
       ELSE 'B4' END AS revenue_band
FROM feats f
LEFT JOIN supplier s ON f.l_suppkey = s.s_suppkey
CROSS JOIN q
"""


#: name -> (spark_fn, oracle_sql | None)
CORE_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "supplier_distinct_parts": (
        q_supplier_distinct_parts,
        SQL_SUPPLIER_DISTINCT_PARTS,
    ),
    "user_activeness": (q_user_activeness, SQL_USER_ACTIVENESS),
    "priority_recode": (q_priority_recode, SQL_PRIORITY_RECODE),
    "returnflag_pivot": (q_returnflag_pivot, SQL_RETURNFLAG_PIVOT),
    "supplier_most_flag": (q_supplier_most_flag, SQL_SUPPLIER_MOST_FLAG),
    "supplier_flag_mix": (q_supplier_flag_mix, SQL_SUPPLIER_FLAG_MIX),
    "customer_segmentation": (q_customer_segmentation, SQL_CUSTOMER_SEGMENTATION),
    "top_event_per_user": (q_top_event_per_user, SQL_TOP_EVENT_PER_USER),
    "user_trend": (q_user_trend, SQL_USER_TREND),
    "region_rollup": (q_region_rollup, SQL_REGION_ROLLUP),
    "positional_zip": (q_positional_zip, SQL_POSITIONAL_ZIP),
    "union_halves": (q_union_halves, SQL_UNION_HALVES),
    "dedup_user_event": (q_dedup_user_event, SQL_DEDUP_USER_EVENT),
    "props_json": (q_props_json, SQL_PROPS_JSON),
    "supplier_360": (q_supplier_360, SQL_SUPPLIER_360),
}


# --- LLM-pipeline extensions: text analysis, dedup, similarity --------------

from .operators.dedup import (  # noqa: E402
    cross_dedup_contract,
    dedup_exact,
    exact_cross_pairs,
    jaccard_pairs,
    minhash_index,
    minhash_lsh_join,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash_table,
)
from .operators.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from .operators.text import LANG_STOPWORDS, fingerprint, text_profile  # noqa: E402


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: one-pass per-document profile (token counts,
    BPE-ish subword estimate, punctuation load, heuristic language ID,
    quality class, normalized fingerprint). All built-in expressions —
    a narrow map, no shuffle, codegen-friendly at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    return text_profile(docs)


def _stop_hits_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),"
        f" x -> x IN ({lst}))) AS BIGINT)"
    )


def _doc_profile_sql() -> str:
    en = _stop_hits_sql(LANG_STOPWORDS["en"])
    de = _stop_hits_sql(LANG_STOPWORDS["de"])
    es = _stop_hits_sql(LANG_STOPWORDS["es"])
    fr = _stop_hits_sql(LANG_STOPWORDS["fr"])
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_extract_all(lower(text), '[a-z]{{1,6}}|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subwords,
    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS n_non_alnum,
    {en} AS en_h, {de} AS de_h, {es} AS es_h, {fr} AS fr_h,
    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM documents
)
SELECT doc_id, n_tokens, n_chars, n_subwords, n_non_alnum,
  CASE WHEN en_h >= de_h AND en_h >= es_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
       WHEN de_h >= es_h AND de_h >= fr_h AND de_h > 0 THEN 'de'
       WHEN es_h >= fr_h AND es_h > 0 THEN 'es'
       WHEN fr_h > 0 THEN 'fr'
       ELSE 'unknown' END AS pred_lang,
  CASE WHEN n_tokens < 10 THEN 'fragment'
       WHEN en_h * 100 >= n_tokens * 10 THEN 'fluent'
       ELSE 'ok' END AS quality,
  fp
FROM base
"""


SQL_DOC_PROFILE = _doc_profile_sql()


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the normalized fingerprint: one hash aggregate,
    deterministic keeper (min doc_id) — the linear-cost first stage of
    any corpus dedup cascade."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_exact(docs, fingerprint(F.col("text")), id_col="doc_id")


SQL_DOC_EXACT_DEDUP = """
SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection, exact path: word-trigram Jaccard >= 30% via
    shared-shingle self-join (integer-only similarity math). The LSH
    MinHash variant (rows-only query) is the 100 TB path; this exact
    form doubles as its verification oracle."""
    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, n=3, threshold_pct=30, exact=True)


SQL_DOC_JACCARD_PAIRS = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
        FROM toks WHERE len(t) >= 3)
),
sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter, (sa.nsh + sb.nsh - inter) AS uni
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 100 >= (sa.nsh + sb.nsh - inter) * 30
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, exact baseline: brute-force cosine top-5 for
    10 query vectors (vec_id < 10) against the full corpus. Queries are
    broadcast; ranks only in the output (floats stay internal)."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id < 10
), n AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ne,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
  FROM embeddings
), s AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qe, ne) / (qn * nn) AS cos
  FROM q, n WHERE neighbor_id <> query_id
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk,
       neighbor_id
FROM s
QUALIFY rk <= 5
"""


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup, scale path: banded MinHash-LSH (32 hashes, 8 bands)
    candidates, EXACT-verified (operators/dedup.py exact_verify_pairs
    — the production cascade: banding proposes, exact Jaccard
    disposes), stated as the contract the cascade GUARANTEES at every
    scale factor (VERDICT r8 item 2; the former oracle asserted the
    exact pair set, which held only by a pinned-corpus coincidence —
    banding recall is 96.7% on the sf1 corpus, so it was excluded
    there instead of asserted).

    Three-part contract, all DuckDB-assertable at any SF:

    - **exact echo** (strong): one row per EXACT 3-gram Jaccard >= 30%
      pair (operators/dedup.py jaccard_pairs, the shared-shingle
      exact join) — DuckDB recomputes the same set independently, so
      the exact pair machinery is hash-checked at full strength.
    - **precision sentinel** (-1, -1): zero verified-LSH pairs fall
      outside the exact set.  True BY CONSTRUCTION (exact
      verification), so it cross-checks the two independent exact-
      Jaccard implementations (self-join vs broadcast-candidate) at
      every SF — unlike signature-level verification, which can pass
      boundary pairs the exact ratio rejects.
    - **recall-floor sentinel** (-2, -2): >= 90% of HIGH-confidence
      exact pairs (Jaccard >= 80%) are found by banding.  Theory: a
      J=0.8 pair misses all 8 bands w.p. (1-0.8^4)^8 ~ 1.5%, so the
      10% allowance holds with huge margin at any corpus size
      (measured: 100% at sf0.01/sf0.1, 96.7% over ALL >=30% pairs at
      sf1 where the misses are boundary-J pairs the floor deliberately
      excludes).  Zero recall = gate FAILURE, in the oracle itself.
    """
    from .operators.dedup import exact_verify_pairs

    docs = _t(spark, sf_dir, "documents")
    exact = jaccard_pairs(docs, exact=True).localCheckpoint(eager=True)
    cand = minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, verify_threshold_pct=None, exact=True
    ).select("id_a", "id_b")
    found = exact_verify_pairs(docs, cand, threshold_pct=30).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=True)
    per_row = exact.select("id_a", "id_b", F.lit(True).alias("legal"))
    spurious = found.join(
        exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    )
    precision_row = spurious.agg(
        (F.count(F.lit(1)) == 0).alias("legal")
    ).select(
        F.lit(-1).cast("long").alias("id_a"),
        F.lit(-1).cast("long").alias("id_b"),
        "legal",
    )
    high = exact.filter(F.col("inter") * 100 >= F.col("uni") * 80)
    marked = high.join(
        found.withColumn("__f", F.lit(1)), ["id_a", "id_b"], "left"
    )
    floor_row = marked.agg(
        (
            F.coalesce(F.sum("__f"), F.lit(0)) * 10
            >= F.count(F.lit(1)) * 9
        ).alias("legal")
    ).select(
        F.lit(-2).cast("long").alias("id_a"),
        F.lit(-2).cast("long").alias("id_b"),
        "legal",
    )
    return per_row.unionByName(precision_row).unionByName(floor_row)


SQL_MINHASH_NEAR_DUP = f"""
SELECT id_a, id_b, TRUE AS legal FROM ({SQL_DOC_JACCARD_PAIRS}) t
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), TRUE  -- precision sentinel
UNION ALL
SELECT CAST(-2 AS BIGINT), CAST(-2 AS BIGINT), TRUE  -- recall floor (high-J)
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash blocking COMPLETENESS check, restated as a violation set.

    Chunk blocking over max_hamming+1 chunks is provably complete for
    Hamming <= max_hamming (pigeonhole), so the symmetric difference
    between the blocked pairs and brute-force all-pairs Hamming <= 3 is
    empty BY THEOREM, at any scale factor — which makes it expressible
    as an empty-set oracle and turns the former rows-only check into a
    driver-visible one. The pair-level output itself (17 pairs at
    sf0.01) is pinned by tests/test_extensions.py; the brute-force side
    is a broadcast nested-loop join, acceptable here because it IS the
    verification path, never the scale path."""
    from .operators.util import finalize

    docs = _t(spark, sf_dir, "documents")
    sim = simhash_table(docs).persist()
    blocked = simhash_near_pairs(sim, max_hamming=3).select("id_a", "id_b")
    a, b = sim.alias("a"), sim.alias("b")
    brute = (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .filter(F.col("hamming") <= 3)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    missed = brute.subtract(blocked).withColumn("problem", F.lit("missed"))
    spurious = blocked.subtract(brute).withColumn("problem", F.lit("spurious"))
    return finalize(missed.unionByName(spurious), sim)


SQL_SIMHASH_NEAR_DUP = """
SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
       CAST(NULL AS VARCHAR) AS problem
WHERE FALSE
"""


def _topk_vs_exact_summary(approx: DataFrame, exact_topn: DataFrame) -> DataFrame:
    """Per-query recall summary of an approximate top-k against the exact
    top-N (N > k): (query_id, n_found, n_violations) where a violation is
    an approximate entry absent from the exact top-N. Fully deterministic
    on fixed data + fixed seeds, so the oracle is a plain SELECT."""
    hits = exact_topn.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    marked = approx.join(hits, ["query_id", "neighbor_id"], "left")
    return marked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_found"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias("n_violations"),
    )


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, scale path: SRP-LSH bucketed top-5, restated
    as a per-query quality summary the driver can oracle-check: every
    query returns exactly 5 neighbors and every returned neighbor sits
    inside the EXACT top-20 (worst observed exact rank on this corpus:
    9). The raw top-5 listing is exercised by the same call;
    tests/test_extensions.py additionally gates recall@5 vs exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    lsh = cosine_topk_lsh(emb, queries, dim=64, k=5, nbits=4, tables=8)
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(lsh, exact20)


SQL_ANN_SUMMARY = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_found,
       CAST(0 AS BIGINT) AS n_violations
FROM embeddings WHERE vec_id < 10
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table SRP buckets
    + exact verification, on a corpus with PLANTED near-duplicates.

    The raw embeddings table is pure noise (max pairwise cos ~0.51 at
    sf0.01), so a 0.95-threshold near-dup query is vacuously empty. Here
    the corpus is the table plus a deterministic perturbed copy of the
    first 50 vectors (id + 1_000_000, per-dimension sin offsets):
    planted pairs have cos ~0.99, every other pair stays far below the
    0.9 threshold (64-dim noise cosine concentrates ~N(0, 1/64);
    crossing 0.9 is a >7-sigma event, ~3e-13/pair).

    Stated as the contract the SRP cascade GUARANTEES at every scale
    factor (VERDICT r8 item 2; the former oracle asserted the full
    planted pair set, which is only theory-APPROXIMATE — the per-pair
    multi-table miss probability ~2e-6 is tiny but nonzero, so the
    query sat excluded from the sf1 sweep instead of asserting there):

    - **planted echo**: one row per planted pair (i, i+1M), i < 50 —
      the deterministic key set a plain SQL oracle states.
    - **precision sentinel** (-1, -1): zero found pairs outside the
      planted set (exact-cosine verification inside the operator +
      the noise-concentration bound above).
    - **recall-floor sentinel** (-2, -2): >= 48 of the 50 planted
      pairs found — the semantic_dedup pattern; zero recall is a gate
      FAILURE while the theory-bounded stray miss stays legal."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    planted = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + 0.02 * F.sin(F.col("vec_id") * 31 + i),
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    found = embedding_near_dup_pairs(
        corpus, threshold=0.9, dim=64, nbits=10, tables=6
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    expected = base.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + 1_000_000).alias("id_b"),
    )
    per_row = expected.select("id_a", "id_b", F.lit(True).alias("legal"))
    precision_row = found.join(
        expected, ["id_a", "id_b"], "left_anti"
    ).agg((F.count(F.lit(1)) == 0).alias("legal")).select(
        F.lit(-1).cast("long").alias("id_a"),
        F.lit(-1).cast("long").alias("id_b"),
        "legal",
    )
    floor_row = expected.join(
        found.withColumn("__f", F.lit(1)), ["id_a", "id_b"], "left"
    ).agg(
        (F.coalesce(F.sum("__f"), F.lit(0)) >= F.lit(48)).alias("legal")
    ).select(
        F.lit(-2).cast("long").alias("id_a"),
        F.lit(-2).cast("long").alias("id_b"),
        "legal",
    )
    return per_row.unionByName(precision_row).unionByName(floor_row)


SQL_EMBEDDING_NEAR_DUP = """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, TRUE AS legal
FROM embeddings WHERE vec_id < 50
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), TRUE  -- precision sentinel
UNION ALL
SELECT CAST(-2 AS BIGINT), CAST(-2 AS BIGINT), TRUE  -- recall floor
"""


EXTENSION_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "doc_profile": (q_doc_profile, SQL_DOC_PROFILE),
    "doc_exact_dedup": (q_doc_exact_dedup, SQL_DOC_EXACT_DEDUP),
    "doc_jaccard_pairs": (q_doc_jaccard_pairs, SQL_DOC_JACCARD_PAIRS),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "minhash_near_dup": (q_minhash_near_dup, SQL_MINHASH_NEAR_DUP),
    "simhash_near_dup": (q_simhash_near_dup, SQL_SIMHASH_NEAR_DUP),
    "ann_topk_lsh": (q_ann_topk_lsh, SQL_ANN_SUMMARY),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
}

CORE_QUERIES.update(EXTENSION_QUERIES)


# --- join/window/set completions (semi/anti, as-of, rollup, analytics) ------

from .operators.joins import asof_join_backward  # noqa: E402
from .operators.windows import sessionize  # noqa: E402


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 fixed: deterministic global top-n (orderBy + limit compiles to
    TakeOrderedAndProject — a distributed top-k, no global sort) —
    replaces the reference's unordered limit(250) (SURVEY §0.1)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti joins (free via df.join modes, SURVEY §2.3 note):
    customers WITH an urgent order (left_semi) and WITHOUT one
    (left_anti), rolled up per market segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("has_urgent", F.lit("yes"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("has_urgent", F.lit("no"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "has_urgent", "n")


SQL_SEMI_ANTI_CUSTOMERS = """
WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT c_mktsegment, 'yes' AS has_urgent, COUNT(*) AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM u)
GROUP BY c_mktsegment
UNION ALL
SELECT c_mktsegment, 'no' AS has_urgent, COUNT(*) AS n
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM u)
GROUP BY c_mktsegment
"""


def q_returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (engine exposes Spark's native
    rollup/cube/groupingSets; absent from the reference but part of the
    complete aggregation surface)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_RETURNFLAG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_users_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: users who both clicked and purchased."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


SQL_USERS_CLICK_AND_PURCHASE = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_users_click_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: users who clicked but never purchased."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    # subtract = set EXCEPT (exceptAll is bag-difference: a user with two
    # clicks would survive the removal of one occurrence)
    return clicks.subtract(buys)


SQL_USERS_CLICK_NOT_PURCHASE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): for every click,
    the latest purchase by the same user at or before the click.
    Implemented as the scalable union-window merge (one shuffle), see
    operators/joins.py:asof_join_backward."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    out = asof_join_backward(
        clicks, buys, by="user_id", left_ts="ts", right_ts="pts",
        right_values=["purchase_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("pts_asof")).alias("last_purchase_us"),
        F.col("purchase_id_asof").alias("last_purchase_id"),
    )


SQL_ASOF_LAST_PURCHASE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), buys AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
  (SELECT epoch_us(MAX(b.ts)) FROM buys b
    WHERE b.user_id = c.user_id AND b.ts <= c.ts) AS last_purchase_us,
  (SELECT b.event_id FROM buys b
    WHERE b.user_id = c.user_id AND b.ts <= c.ts
    ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS last_purchase_id
FROM clicks c
"""


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/joins.py asof_join_forward, r8):
    for every click, the EARLIEST purchase by the same user at or
    after the click — the mirror of asof_last_purchase, completing
    pandas merge_asof's direction surface (backward/forward) with the
    same one-shuffle union-window construction.  Tiebreak at equal
    timestamps: smallest purchase_id (struct-min convention, the
    mirror of backward's struct-max), stated identically in the
    oracle."""
    from .operators.joins import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    out = asof_join_forward(
        clicks, buys, by="user_id", left_ts="ts", right_ts="pts",
        right_values=["purchase_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("pts_asof")).alias("next_purchase_us"),
        F.col("purchase_id_asof").alias("next_purchase_id"),
    )


SQL_ASOF_NEXT_PURCHASE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), buys AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
  (SELECT epoch_us(MIN(b.ts)) FROM buys b
    WHERE b.user_id = c.user_id AND b.ts >= c.ts) AS next_purchase_us,
  (SELECT b.event_id FROM buys b
    WHERE b.user_id = c.user_id AND b.ts >= c.ts
    ORDER BY b.ts ASC, b.event_id ASC LIMIT 1) AS next_purchase_id
FROM clicks c
"""


def q_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (operators/joins.py asof_join_nearest, r8):
    for every click, the purchase by the same user closest in time,
    ties toward the at-or-before side — pandas merge_asof
    direction='nearest', completing the backward/forward/nearest trio.
    One shuffle + one sort: both direction frames ride the same
    union-window pass.  Tiebreaks are total orders stated identically
    in the oracle: distance first, backward-beats-forward at equal
    distance, then each side's struct-order convention (backward:
    largest purchase_id; forward: smallest)."""
    from .operators.joins import asof_join_nearest

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    out = asof_join_nearest(
        clicks, buys, by="user_id", left_ts="ts", right_ts="pts",
        right_values=["purchase_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("pts_asof")).alias("nearest_purchase_us"),
        F.col("purchase_id_asof").alias("nearest_purchase_id"),
    )


SQL_ASOF_NEAREST_PURCHASE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), buys AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), pick AS (
  SELECT c.event_id, c.user_id,
    (SELECT epoch_us(b.ts) FROM buys b WHERE b.user_id = c.user_id
      ORDER BY abs(epoch_us(b.ts) - epoch_us(c.ts)) ASC,
               (b.ts > c.ts) ASC,
               CASE WHEN b.ts <= c.ts THEN -b.event_id
                    ELSE b.event_id END ASC
      LIMIT 1) AS nearest_purchase_us,
    (SELECT b.event_id FROM buys b WHERE b.user_id = c.user_id
      ORDER BY abs(epoch_us(b.ts) - epoch_us(c.ts)) ASC,
               (b.ts > c.ts) ASC,
               CASE WHEN b.ts <= c.ts THEN -b.event_id
                    ELSE b.event_id END ASC
      LIMIT 1) AS nearest_purchase_id
  FROM clicks c
)
SELECT event_id, user_id, nearest_purchase_us, nearest_purchase_id FROM pick
"""


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window (lag): microsecond gap to the previous event per
    user — integer epoch arithmetic, engine-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return ev.select("event_id", "user_id", gap.alias("gap_us"))


SQL_EVENT_GAPS = """
SELECT event_id, user_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


def q_sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag -> boundary ->
    running sum, one shuffle. The batch twin of streaming session
    windows."""
    ev = _t(spark, sf_dir, "events")
    out = sessionize(
        ev, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    )
    return out.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


SQL_SESSIONIZED_EVENTS = """
WITH g AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), b AS (
  SELECT user_id, event_id,
         CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END AS boundary,
         ts
  FROM g
), s AS (
  SELECT user_id, event_id,
         CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM b
)
SELECT user_id, session_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
FROM s GROUP BY user_id, session_id
"""


def q_event_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time bucketing (the batch twin of the streaming windowed
    count): 6-hour buckets via integer epoch arithmetic so both engines
    bucket identically."""
    ev = _t(spark, sf_dir, "events")
    bucket_us = 6 * 3600 * 1_000_000
    b = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % bucket_us)
    return ev.groupBy(
        b.alias("bucket_start_us"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))


SQL_EVENT_TIME_BUCKETS = """
SELECT epoch_us(ts) - epoch_us(ts) % CAST(21600000000 AS BIGINT) AS bucket_start_us,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_supplier_distinct_parts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 scale path: HyperLogLog++ distinct count (one shuffle, merged
    sketches, fixed memory), restated as a driver-checkable accuracy
    statement: every group's sketch estimate lands within 10% of the
    exact count (5x the requested rsd=0.02 — observed max deviation on
    this data is 3.1%). Sketch values are engine-specific so the raw
    estimates can't be oracle-hashed, but the per-group bound can."""
    li = _t(spark, sf_dir, "lineitem")
    approx = distinct_count(
        li, ["l_suppkey"], "l_partkey", "approx_parts", approx=True, rsd=0.02
    )
    exact = distinct_count(li, ["l_suppkey"], "l_partkey", "exact_parts")
    return approx.join(exact, "l_suppkey").select(
        "l_suppkey",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.1 * F.col("exact_parts")
        ).alias("within_10pct"),
    )


SQL_SUPPLIER_DISTINCT_PARTS_APPROX = """
SELECT DISTINCT l_suppkey, TRUE AS within_10pct FROM lineitem
"""


MORE_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "semi_anti_customers": (q_semi_anti_customers, SQL_SEMI_ANTI_CUSTOMERS),
    "returnflag_rollup": (q_returnflag_rollup, SQL_RETURNFLAG_ROLLUP),
    "users_click_and_purchase": (
        q_users_click_and_purchase,
        SQL_USERS_CLICK_AND_PURCHASE,
    ),
    "users_click_not_purchase": (
        q_users_click_not_purchase,
        SQL_USERS_CLICK_NOT_PURCHASE,
    ),
    "asof_last_purchase": (q_asof_last_purchase, SQL_ASOF_LAST_PURCHASE),
    "asof_next_purchase": (q_asof_next_purchase, SQL_ASOF_NEXT_PURCHASE),
    "asof_nearest_purchase": (
        q_asof_nearest_purchase,
        SQL_ASOF_NEAREST_PURCHASE,
    ),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "sessionized_events": (q_sessionized_events, SQL_SESSIONIZED_EVENTS),
    "event_time_buckets": (q_event_time_buckets, SQL_EVENT_TIME_BUCKETS),
    "supplier_distinct_parts_approx": (
        q_supplier_distinct_parts_approx,
        SQL_SUPPLIER_DISTINCT_PARTS_APPROX,
    ),
}

CORE_QUERIES.update(MORE_QUERIES)


# --- full three-stage pipeline + streaming ---------------------------------


def q_customer360_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's COMPLETE three-stage flow (SURVEY §3.1+§3.2+§3.3)
    on driver tables: interaction features (supplier_360) MERGED with
    trend features (user_trend) — using the keyed-join semantics the
    reference's README claims, with the deterministic positional-zip
    variant available via merge_feature_tables (§0.1 J4)."""
    feats = q_supplier_360(spark, sf_dir)
    trends = q_user_trend(spark, sf_dir)
    # key the two feature tables: supplier key modulo the user domain
    # plays the role of the shared customer key in the reference merge
    left = feats.withColumn("join_key", F.col("l_suppkey") % 150)
    right = trends.withColumnRenamed("user_id", "join_key")
    merged = left.join(right, on="join_key", how="inner")
    return merged.select(
        "join_key",
        "l_suppkey",
        "total_a",
        "total_n",
        "total_r",
        "distinct_parts",
        "most_flag",
        "flag_mix",
        "revenue_band",
        "most_p1",
        "most_p2",
        "category_p1",
        "category_p2",
        "trending_type",
        "previous",
    )


SQL_CUSTOMER360_MERGED = f"""
WITH p AS ({_pivot_cents_sql()}
), parts AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS distinct_parts
  FROM lineitem GROUP BY l_suppkey
), feats AS (
  SELECT p.l_suppkey, p.a, p.n, p.r, (p.a + p.n + p.r) AS total_cents, parts.distinct_parts
  FROM p JOIN parts ON p.l_suppkey = parts.l_suppkey
), q AS (
  SELECT quantile_cont(total_cents, [0.25, 0.5, 0.75]) AS qs FROM feats
), sup360 AS (
  SELECT f.l_suppkey,
    CAST(f.a AS DOUBLE) / 100.0 AS total_a,
    CAST(f.n AS DOUBLE) / 100.0 AS total_n,
    CAST(f.r AS DOUBLE) / 100.0 AS total_r,
    f.distinct_parts,
    CASE WHEN f.a >= f.n AND f.a >= f.r THEN 'A'
         WHEN f.n >= f.a AND f.n >= f.r THEN 'N'
         ELSE 'R' END AS most_flag,
    concat_ws('-',
      CASE WHEN f.a <> 0 THEN 'A' END,
      CASE WHEN f.n <> 0 THEN 'N' END,
      CASE WHEN f.r <> 0 THEN 'R' END) AS flag_mix,
    CASE WHEN f.total_cents < qs[1] THEN 'B1'
         WHEN f.total_cents < qs[2] THEN 'B2'
         WHEN f.total_cents < qs[3] THEN 'B3'
         ELSE 'B4' END AS revenue_band
  FROM feats f CROSS JOIN q
), c AS (
  SELECT {PERIOD_SQL} AS period, user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
), top AS (
  SELECT period, user_id, event_type
  FROM c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY period, user_id ORDER BY n DESC, event_type) = 1
), piv AS (
  SELECT user_id,
         MAX(CASE WHEN period = 'p1' THEN event_type END) AS most_p1,
         MAX(CASE WHEN period = 'p2' THEN event_type END) AS most_p2
  FROM top GROUP BY user_id
), both_p AS (
  SELECT * FROM piv WHERE most_p1 IS NOT NULL AND most_p2 IS NOT NULL
), trends AS (
  SELECT b.user_id, b.most_p1, b.most_p2, m1.category AS category_p1, m2.category AS category_p2,
    CASE WHEN m1.category = m2.category THEN 'Unchanged' ELSE 'Changed' END AS trending_type,
    CASE WHEN m1.category = m2.category THEN 'Unchanged'
         ELSE concat_ws(' -> ', m1.category, m2.category) END AS previous
  FROM both_p b
  LEFT JOIN {EVENT_CATEGORY_SQL.replace('m(etype', 'm1(etype')} ON b.most_p1 = m1.etype
  LEFT JOIN {EVENT_CATEGORY_SQL.replace('m(etype', 'm2(etype')} ON b.most_p2 = m2.etype
)
SELECT s.l_suppkey % 150 AS join_key, s.l_suppkey,
       s.total_a, s.total_n, s.total_r, s.distinct_parts, s.most_flag,
       s.flag_mix, s.revenue_band,
       t.most_p1, t.most_p2, t.category_p1, t.category_p2,
       t.trending_type, t.previous
FROM sup360 s
JOIN trends t ON (s.l_suppkey % 150) = t.user_id
"""


def q_streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming through the contract: availableNow file
    stream over events.parquet -> watermarked 6h windowed counts ->
    in-memory sink, returned as a DataFrame. availableNow over a static
    file with complete output mode is DETERMINISTIC (the watermark never
    drops rows — all data arrives before the terminal micro-batch), so
    the batch-twin 6h bucket SQL is a full oracle; batch/stream
    equivalence is additionally proven in
    tests/test_multimodal_streaming.py."""
    import os
    import tempfile

    from .streaming.incremental import run_incremental, windowed_counts

    tune(spark, shuffle_partitions=32)
    path = os.path.join(sf_dir, "events.parquet")
    # file-stream sources require a DIRECTORY; stream the sf dir with a
    # glob filter selecting just the events file
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    from .sources.tables import event_ts

    stream = event_ts(stream)
    agg = windowed_counts(stream, window="6 hours", watermark="1 hour")
    ckpt = tempfile.mkdtemp(prefix="c360_q_stream_")
    # unique sink name: memory-sink query names are session-global and a
    # finished query's name cannot be reused by a new start
    name = f"stream_counts_{os.path.basename(ckpt).split('_')[-1]}"
    # state_partitions=8: the 6h x event_type state is ~600 groups, and
    # streaming state cost is per-partition-per-batch fixed overhead —
    # measured 4.4s @ 32 parts vs 2.2s @ 8 at sf0.1 (NOTES_r10; this was
    # the r9 "unexplained drift" query, VERDICT r9 item 5). Size state
    # partitions to state cardinality, not to the batch shuffle conf.
    run_incremental(
        agg, os.path.join(ckpt, "ckpt"), name, mode="complete",
        state_partitions=8,
    )
    return spark.table(name).select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n",
    )


SQL_STREAMING_EVENT_COUNTS = """
SELECT epoch_us(ts) - epoch_us(ts) % CAST(21600000000 AS BIGINT) AS window_start_us,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


FINAL_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "customer360_merged": (q_customer360_merged, SQL_CUSTOMER360_MERGED),
    "streaming_event_counts": (q_streaming_event_counts, SQL_STREAMING_EVENT_COUNTS),
}

CORE_QUERIES.update(FINAL_QUERIES)


# --- edit distance + multimodal contract queries ---------------------------


def q_near_dup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification layer on the near-dup cascade:
    levenshtein over 64-char prefixes, computed ONLY for the (small)
    exact-Jaccard candidate pairs — the standard pattern of running an
    expensive exact measure on a pre-filtered candidate set, never
    all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, n=3, threshold_pct=30, exact=True)
    pa = docs.select(
        F.col("doc_id").alias("id_a"),
        F.substring(F.col("text"), 1, 64).alias("ta"),
    )
    pb = docs.select(
        F.col("doc_id").alias("id_b"),
        F.substring(F.col("text"), 1, 64).alias("tb"),
    )
    return (
        pairs.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("ta"), F.col("tb")).cast("long").alias("prefix_edit"),
        )
    )


SQL_NEAR_DUP_EDIT_DISTANCE = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
        FROM toks WHERE len(t) >= 3)
),
sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
keep AS (
  SELECT id_a, id_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE inter * 100 >= (sa.nsh + sb.nsh - inter) * 30
)
SELECT k.id_a, k.id_b,
       CAST(levenshtein(substring(da.text, 1, 64), substring(db.text, 1, 64)) AS BIGINT) AS prefix_edit
FROM keep k
JOIN documents da ON da.doc_id = k.id_a
JOIN documents db ON db.doc_id = k.id_b
"""


def q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing through the contract: documents wrapped as
    binary media rows -> Arrow-batched decode (stub codec, deterministic
    digest features) -> per-media feature row. The stub decode is a
    sha256 digest, which DuckDB can compute too, so even the stubbed
    path gets a full value-level oracle (bright_first compares the first
    digest byte: b/255.0 > 0.5 <=> b >= 128, integer math on both
    engines — no float-hash hazard). The Spark-side schema/batching/
    pruning is what is being exercised — see operators/multimodal.py."""
    from .operators.multimodal import decode_image_features, documents_as_media

    docs = _t(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    feats = decode_image_features(media)
    return feats.select(
        "media_id",
        F.size(F.col("feature")).cast("long").alias("feat_dim"),
        (F.element_at(F.col("feature"), 1) > 0.5).alias("bright_first"),
    )


SQL_MEDIA_DECODE_FEATURES = """
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS feat_dim,
       (('0x' || substring(sha256(text), 1, 2))::INTEGER >= 128) AS bright_first
FROM documents
"""


FINAL_QUERIES_2: dict[str, tuple[QueryFn, str | None]] = {
    "near_dup_edit_distance": (q_near_dup_edit_distance, SQL_NEAR_DUP_EDIT_DISTANCE),
    "media_decode_features": (q_media_decode_features, SQL_MEDIA_DECODE_FEATURES),
}

CORE_QUERIES.update(FINAL_QUERIES_2)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, IVF scale path: k-means coarse quantizer
    (deterministic ordered sample) + nprobe cell probing + exact
    re-rank — restated, like ann_topk_lsh, as the per-query summary
    (5 found, 0 outside the exact top-20). tests/test_extensions.py
    gates recall@5.  nprobe=10 is the measured >= 0.85-recall default
    (r7 verdict item 4, curve in ANN_RECALL_r8.json); at it the
    top-20 claim holds on the reseeded sf1 noise corpus too (worst
    exact rank 7), so this query is also sf1-exact."""
    from .operators.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ivf = cosine_topk_ivf(emb, queries, k=5, n_centroids=16, nprobe=10)
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(ivf, exact20)


CORE_QUERIES["ann_topk_ivf"] = (q_ann_topk_ivf, SQL_ANN_SUMMARY)


def q_ann_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index form of ann_topk_ivf: build the on-disk IVF
    inverted file (operators/similarity.py write_ivf_index — cell-
    bucketed assignments with stored norms, driver-sized centroid
    table), reopen it, and probe — corpus embeddings are never
    re-normalized or re-assigned at query time, and the probed-cell
    filter is bucket-prunable.  Results are bit-identical to the
    in-memory form (pytest-pinned), so this SHARES ann_topk_ivf's
    oracle summary.  The vector-side sibling of
    incremental_corpus_dedup_indexed."""
    from .operators.similarity import (
        cosine_topk_ivf_indexed,
        read_ivf_index,
        write_ivf_index,
    )

    from .phases import phase

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    name = f"q_ivf_idx_{sf_tag(sf_dir)}"
    # 8 buckets at demo SF (same sizing rule as
    # incremental_corpus_dedup_indexed: per-file overhead dominates tiny
    # buckets); a real corpus sizes buckets to executor-memory-fit cells.
    with phase("build"):
        write_ivf_index(emb, name, n_centroids=16, num_buckets=8)
        idx = read_ivf_index(spark, name)
    ivf = cosine_topk_ivf_indexed(idx, queries, k=5, nprobe=6)
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(ivf, exact20)


CORE_QUERIES["ann_topk_ivf_indexed"] = (q_ann_topk_ivf_indexed, SQL_ANN_SUMMARY)


def q_streaming_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector search AS A STREAM: query vectors arrive as files in a
    watched directory and foreachBatch probes each micro-batch against
    the STANDING persisted IVF index — the serving shape of embedding
    search over a fixed corpus (the vector sibling of
    streaming_index_dedup).

    Per-query top-k depends only on the query and the index, so the
    union over micro-batches equals the one-shot probe and this SHARES
    ann_topk_ivf's oracle summary; the per-batch probe broadcasts only
    that batch's queries and reads the probed cells' buckets.

    Batch sizing (r10 verdict item 3, guide §2.2's fixed-overhead
    lesson applied to micro-batches): every micro-batch pays the full
    fixed probe cost — stream trigger, query broadcast, bucketed cell
    scan, sink append, checkpoint commit — so availableNow is left to
    FUSE all pending arrival files into one batch (no
    maxFilesPerTrigger cap) instead of forcing one batch per file;
    the result is the same union by construction (isolated probe cost
    here: ~2x for 2 files when capped at 1/batch).  The
    one-batch-per-file shape stays demonstrated (and pinned) by
    streaming_index_dedup / streaming_dq_gate, where per-batch
    sequencing is the point.

    Though this query's per-batch output is bounded (|queries| x k),
    it uses the same scale-safe sink recipe as streaming_dq_gate /
    streaming_index_dedup — per-batch results parquet-written, read
    back as one FileScan — so all three registered streaming
    foreachBatch demos share the pattern a user should copy."""
    import os
    import tempfile

    from .operators.similarity import (
        cosine_topk_ivf_indexed,
        read_ivf_index,
        write_ivf_index,
    )

    from .phases import phase

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    name = f"q_ivf_stream_{sf_tag(sf_dir)}"
    with phase("build"):
        write_ivf_index(emb, name, n_centroids=16, num_buckets=8)
        idx = read_ivf_index(spark, name)

    tmp = tempfile.mkdtemp(prefix="c360_stream_ann_")
    arrivals = os.path.join(tmp, "arrivals")
    queries.filter(F.col("vec_id") < 5).coalesce(1).write.mode(
        "append"
    ).parquet(arrivals)
    queries.filter(F.col("vec_id") >= 5).coalesce(1).write.mode(
        "append"
    ).parquet(arrivals)

    from .streaming.incremental import (
        read_batch_sink,
        sink_foreach_batch,
        stream_file_source,
    )

    stream = stream_file_source(spark, arrivals, emb.schema)
    sink = os.path.join(tmp, "topk")

    def probe(batch_df: DataFrame) -> DataFrame:
        return cosine_topk_ivf_indexed(idx, batch_df, k=5, nprobe=6).select(
            "query_id", "rk", "neighbor_id"
        )

    sink_foreach_batch(stream, os.path.join(tmp, "ckpt"), sink, probe)
    ivf = read_batch_sink(spark, sink).select("query_id", "rk", "neighbor_id")
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(ivf, exact20)


CORE_QUERIES["streaming_ann_probe"] = (q_streaming_ann_probe, SQL_ANN_SUMMARY)


def q_returnflag_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 2^2 grouping combinations in one pass
    (complements ROLLUP; both are native Spark exposures)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_RETURNFLAG_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_value_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: classify event values against a banded dim via
    a non-equi (BETWEEN) join condition. The band dim is tiny and
    broadcast -> BroadcastNestedLoopJoin, the right physical plan for a
    small-dim range join (a large-large range join would use a banding/
    bucketing rewrite instead)."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 5.0, "low"), (5.0, 15.0, "mid"), (15.0, 1e9, "high")],
        ["lo", "hi", "band"],
    )
    joined = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
        "inner",
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("users"),
    )


SQL_VALUE_RANGE_JOIN = """
SELECT b.band, COUNT(*) AS n, COUNT(DISTINCT e.user_id) AS users
FROM events e
JOIN (VALUES (0.0, 5.0, 'low'), (5.0, 15.0, 'mid'), (15.0, 1e9, 'high'))
     AS b(lo, hi, band)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
"""


CORE_QUERIES["returnflag_cube"] = (q_returnflag_cube, SQL_RETURNFLAG_CUBE)
CORE_QUERIES["value_range_join"] = (q_value_range_join, SQL_VALUE_RANGE_JOIN)


def q_range_join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large range join via banding (operators/joins.py
    banded_range_join): every lineitem whose extendedprice falls within
    +-5 of an order's total price, counted per order. NEITHER side is
    broadcastable at scale — the banding rewrite turns the interval
    predicate into a co-partitioned hash equi-join on a band id (the
    broadcast-dim case is value_range_join; this is the fact-fact
    companion the r1 verdict asked for). The plan must contain no
    BroadcastNestedLoopJoin / CartesianProduct — pinned in
    tests/test_plan_shape.py."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") - 5.0).alias("lo"),
        (F.col("o_totalprice") + 5.0).alias("hi"),
    )
    from .operators.joins import banded_range_join

    pairs = banded_range_join(
        li, o, value_col="l_extendedprice", lo_col="lo", hi_col="hi", band_width=10.0
    )
    return pairs.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_close"))


SQL_RANGE_JOIN_FACT_FACT = """
SELECT o.o_orderkey, COUNT(*) AS n_close
FROM orders o
JOIN lineitem l
  ON l.l_extendedprice BETWEEN o.o_totalprice - 5.0 AND o.o_totalprice + 5.0
GROUP BY o.o_orderkey
"""


CORE_QUERIES["range_join_fact_fact"] = (q_range_join_fact_fact, SQL_RANGE_JOIN_FACT_FACT)


# --- Reference pipelines end-to-end on reference-shaped data ---------------
#
# The three plans/ modules reproduce the reference's own pipelines
# (ETL_pipeline.py:41-196,235-366) on its NATIVE schemas (log_content /
# log_search / mapping, FIXTURES.md par.A). The driver's oracle only sees
# the ten pre-registered tables, so the reference-shaped inputs are DERIVED
# from `events` with deterministic, engine-portable expressions (integer
# mod / lpad / floor — no float rounding, no hash functions) that both
# Spark and DuckDB evaluate identically. This gives the full reference
# flow — interaction features + search trends + keyed merge, 17 output
# columns — a single driver-visible rows+schema+hash check.

#: keyword -> category mapping dim (A3): suffix-2 keywords and 'error_*'
#: are deliberately unmapped -> NULL category -> Trending_Type='Changed'
#: (reference ETL_pipeline.py:190-196 NULL semantics).
REF_KEYWORD_MAPPING = tuple(
    (f"{et}_{sfx}", cat)
    for et, cat in (
        ("click", "engagement"),
        ("view", "content"),
        ("purchase", "commerce"),
        ("signup", "growth"),
    )
    for sfx in (0, 1)
)


def _ref_log_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> log_content shape (A1): Contract/Mac/AppName/
    TotalDuration/Date. user_id%50==0 rows get the reference's '0'
    sentinel contract; 2 of 10 AppName values are unknown -> recoded to
    'error' and dropped downstream — both filters get exercised."""
    ev = _t(spark, sf_dir, "events")
    apps = ["CHANNEL", "DSHD", "KPLUS", "VOD", "FIMS", "SPORT", "RELAX",
            "CHILD", "MYTV", "HBO"]
    contract = F.when(F.col("user_id") % 50 == 0, F.lit("0")).otherwise(
        F.concat(F.lit("CT"), F.lpad(F.col("user_id").cast("string"), 6, "0"))
    )
    return ev.select(
        contract.alias("Contract"),
        F.concat(F.lit("MAC"), (F.col("event_id") % 7).cast("string")).alias("Mac"),
        F.element_at(
            F.array(*[F.lit(a) for a in apps]),
            (F.col("event_id") % 10 + 1).cast("int"),
        ).alias("AppName"),
        F.floor(F.col("value") * 100).cast("long").alias("TotalDuration"),
        F.to_date("ts").alias("Date"),
    )


def _ref_log_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> log_search shape (A2): the January days split into
    pseudo-months 6/7; ~1% NULL user_ids (filtered); keywords are
    event_type x (event_id%3) with ~9% leading-space variants (top-1
    counting groups the UNtrimmed string, trim applies at pivot —
    reference ETL_pipeline.py:149-166)."""
    ev = _t(spark, sf_dir, "events")
    kw = F.concat_ws("_", F.col("event_type"), (F.col("event_id") % 3).cast("string"))
    return ev.select(
        F.when(F.dayofmonth("ts") <= 15, F.lit(6)).otherwise(F.lit(7)).alias("month"),
        F.when(F.col("event_id") % 101 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.when(F.col("event_id") % 11 == 0, F.concat(F.lit(" "), kw))
        .otherwise(kw)
        .alias("keyword"),
    )


def q_reference_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference flow on its native schemas through the
    engine's plan modules: plans/interaction.interaction_features (11
    features) + plans/search.search_trends (6 trend columns) merged with
    plans/merge.merge_feature_tables on the customer KEY (the join the
    reference's README claims; its positional zip is reproduced
    separately by q_positional_zip). Exact quantiles are opted into for
    oracle bit-equality (the library default is the percentile_approx
    sketch)."""
    from .plans.interaction import interaction_features
    from .plans.merge import merge_feature_tables
    from .plans.search import search_trends

    feats = interaction_features(
        _ref_log_content(spark, sf_dir), exact_quantiles=True
    )
    mapping = spark.createDataFrame(list(REF_KEYWORD_MAPPING), ["search", "category"])
    trends = search_trends(
        _ref_log_search(spark, sf_dir), mapping, period_a=6, period_b=7
    )
    trends = trends.withColumn(
        "Contract",
        F.concat(F.lit("CT"), F.lpad(F.col("user_id").cast("string"), 6, "0")),
    ).drop("user_id")
    return merge_feature_tables(feats, trends, on="Contract", how="inner")


SQL_REFERENCE_E2E = """
WITH lc AS (
  SELECT CASE WHEN user_id % 50 = 0 THEN '0'
              ELSE 'CT' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS contract,
         'MAC' || CAST(event_id % 7 AS VARCHAR) AS mac,
         list_extract(['CHANNEL','DSHD','KPLUS','VOD','FIMS','SPORT','RELAX',
                       'CHILD','MYTV','HBO'],
                      CAST(event_id % 10 AS INTEGER) + 1) AS appname,
         CAST(FLOOR(value * 100) AS BIGINT) AS dur,
         CAST(ts AS DATE) AS d
  FROM events
), devices AS (
  SELECT contract, COUNT(DISTINCT mac) AS totaldevices FROM lc GROUP BY 1
), activeness AS (
  SELECT contract,
    CASE WHEN days_active BETWEEN 1 AND 7 THEN 'very low'
         WHEN days_active BETWEEN 8 AND 14 THEN 'low'
         WHEN days_active BETWEEN 15 AND 21 THEN 'moderate'
         WHEN days_active BETWEEN 22 AND 28 THEN 'high'
         WHEN days_active BETWEEN 29 AND 31 THEN 'very high'
         ELSE 'error' END AS activeness
  FROM (SELECT contract, COUNT(DISTINCT d) AS days_active FROM lc GROUP BY 1)
), catf AS (
  SELECT contract, dur, type FROM (
    SELECT contract, dur,
      CASE appname WHEN 'CHANNEL' THEN 'Truyen_hinh' WHEN 'DSHD' THEN 'Truyen_hinh'
        WHEN 'KPLUS' THEN 'Truyen_hinh' WHEN 'VOD' THEN 'Phim_truyen'
        WHEN 'FIMS' THEN 'Phim_truyen' WHEN 'SPORT' THEN 'The_thao'
        WHEN 'RELAX' THEN 'Giai_tri' WHEN 'CHILD' THEN 'Thieu_nhi'
        ELSE 'error' END AS type
    FROM lc WHERE contract <> '0'
  ) WHERE type <> 'error'
), wide AS (
  SELECT contract,
    CAST(SUM(CASE WHEN type='Truyen_hinh' THEN dur ELSE 0 END) AS BIGINT) AS t_th,
    CAST(SUM(CASE WHEN type='Phim_truyen' THEN dur ELSE 0 END) AS BIGINT) AS t_pt,
    CAST(SUM(CASE WHEN type='The_thao'    THEN dur ELSE 0 END) AS BIGINT) AS t_tt,
    CAST(SUM(CASE WHEN type='Giai_tri'    THEN dur ELSE 0 END) AS BIGINT) AS t_gt,
    CAST(SUM(CASE WHEN type='Thieu_nhi'   THEN dur ELSE 0 END) AS BIGINT) AS t_tn
  FROM catf GROUP BY 1
), wide3 AS (
  SELECT contract, t_th, t_pt, t_tt, t_gt, t_tn,
    CASE WHEN t_th = mx THEN 'Truyen_hinh' WHEN t_pt = mx THEN 'Phim_truyen'
         WHEN t_tt = mx THEN 'The_thao'    WHEN t_gt = mx THEN 'Giai_tri'
         ELSE 'Thieu_nhi' END AS mostwatch,
    concat_ws('-',
      CASE WHEN t_th <> 0 THEN 'Truyen_hinh' END,
      CASE WHEN t_pt <> 0 THEN 'Phim_truyen' END,
      CASE WHEN t_tt <> 0 THEN 'The_thao' END,
      CASE WHEN t_gt <> 0 THEN 'Giai_tri' END,
      CASE WHEN t_tn <> 0 THEN 'Thieu_nhi' END) AS customertaste
  FROM (SELECT *, greatest(t_th, t_pt, t_tt, t_gt, t_tn) AS mx FROM wide)
), feats AS (
  SELECT w.*, a.activeness, dv.totaldevices,
         (t_th + t_pt + t_tt + t_gt + t_tn) AS totaldur
  FROM wide3 w
  JOIN (SELECT * FROM activeness WHERE activeness <> 'error') a
    ON w.contract = a.contract
  JOIN devices dv ON w.contract = dv.contract
), q AS (
  SELECT quantile_cont(totaldur, [0.25, 0.5, 0.75]) AS qs FROM feats
), itable AS (
  SELECT f.contract, t_th, t_pt, t_tt, t_gt, t_tn, totaldevices, mostwatch,
         customertaste, activeness,
    CASE WHEN activeness = 'very low'  AND totaldur <  qs[1] THEN 'leaving'
         WHEN activeness = 'low'       AND totaldur <  qs[2] THEN 'need attention'
         WHEN activeness = 'moderate'  AND totaldur <  qs[2] THEN 'normal'
         WHEN activeness = 'moderate'  AND totaldur >= qs[2] THEN 'potential'
         WHEN activeness = 'high'      AND totaldur >  qs[1] THEN 'loyal'
         WHEN activeness = 'very high' AND totaldur >  qs[1] THEN 'VIP'
         ELSE 'anomaly' END AS customertype
  FROM feats f, q
), clean AS (
  SELECT * FROM (
    SELECT CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 6 ELSE 7 END AS month,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE user_id END AS user_id,
           CASE WHEN event_id % 11 = 0
                THEN ' ' || (event_type || '_' || CAST(event_id % 3 AS VARCHAR))
                ELSE event_type || '_' || CAST(event_id % 3 AS VARCHAR)
           END AS keyword
    FROM events
  ) WHERE user_id IS NOT NULL AND keyword IS NOT NULL AND month IN (6, 7)
), top AS (
  SELECT month, user_id, keyword
  FROM (SELECT month, user_id, keyword, COUNT(*) AS n FROM clean GROUP BY 1,2,3)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY month, user_id
                             ORDER BY n DESC, keyword) = 1
), pivf AS (
  SELECT * FROM (
    SELECT user_id,
      MAX(CASE WHEN month = 6 THEN trim(keyword) END) AS ms6,
      MAX(CASE WHEN month = 7 THEN trim(keyword) END) AS ms7
    FROM top GROUP BY 1
  ) WHERE ms6 IS NOT NULL AND ms7 IS NOT NULL
), mapping AS (
  SELECT * FROM (VALUES
    ('click_0','engagement'),('click_1','engagement'),
    ('view_0','content'),('view_1','content'),
    ('purchase_0','commerce'),('purchase_1','commerce'),
    ('signup_0','growth'),('signup_1','growth')) AS m(search, category)
), s AS (
  SELECT 'CT' || lpad(CAST(p.user_id AS VARCHAR), 6, '0') AS contract,
    p.ms6, p.ms7, m1.category AS c6, m2.category AS c7,
    CASE WHEN m1.category = m2.category THEN 'Unchanged'
         ELSE 'Changed' END AS trending_type,
    CASE WHEN m1.category = m2.category THEN 'Unchanged'
         ELSE concat_ws(' -> ', m1.category, m2.category) END AS previous
  FROM pivf p
  LEFT JOIN mapping m1 ON p.ms6 = m1.search
  LEFT JOIN mapping m2 ON p.ms7 = m2.search
)
SELECT i.contract AS "Contract",
  t_th AS "Total_Truyen_hinh", t_pt AS "Total_Phim_truyen",
  t_tt AS "Total_The_thao", t_gt AS "Total_Giai_tri", t_tn AS "Total_Thieu_nhi",
  totaldevices AS "TotalDevices", mostwatch AS "MostWatch",
  customertaste AS "CustomerTaste", activeness AS "Activeness",
  customertype AS "CustomerType",
  ms6 AS "most_search_6", ms7 AS "most_search_7",
  c6 AS "category_6", c7 AS "category_7",
  trending_type AS "Trending_Type", previous AS "Previous"
FROM itable i JOIN s ON i.contract = s.contract
"""


CORE_QUERIES["reference_e2e"] = (q_reference_e2e, SQL_REFERENCE_E2E)


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator through the driver contract:
    availableNow file stream over events.parquet ->
    applyInPandasWithState gap sessionization (streaming/stateful.py) ->
    closed sessions in an in-memory sink.

    The emitted set is deterministic, so a full rows+schema+hash oracle
    applies: a session is CLOSED (hence emitted) iff a later event of
    the same user exists (data path — the single data micro-batch closes
    it in-batch), or its end + gap lies below the final watermark
    (timeout path — Spark's terminal no-data micro-batch fires
    event-time timeouts after the watermark advances to max(ts) -
    delay; behavior probed empirically, see tests). Each user's tail
    session beyond that stays OPEN and is correctly absent. Timestamps
    carry full microsecond precision, so the ms-boundary equality case
    (where timeout strictness would matter) cannot occur in this data —
    asserted impossible for gap=6h/delay=1h at all shipped SFs."""
    import os
    import tempfile

    from .streaming.incremental import run_incremental
    from .streaming.stateful import stateful_sessionize

    tune(spark, shuffle_partitions=32)
    path = os.path.join(sf_dir, "events.parquet")
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    from .sources.tables import event_ts

    stream = event_ts(stream)
    sessions = stateful_sessionize(
        stream, key_col="user_id", ts_col="ts",
        gap_seconds=6 * 3600, watermark="1 hour",
    )
    ckpt = tempfile.mkdtemp(prefix="c360_q_sess_")
    name = f"stream_sessions_{os.path.basename(ckpt).split('_')[-1]}"
    # Measured: state_partitions=8 is a no-op here (2.79 vs 2.84 s
    # min-of-3 at sf0.1) — cost is the applyInPandasWithState Arrow
    # walk itself, not per-partition state-store fixed overhead.
    run_incremental(sessions, os.path.join(ckpt, "ckpt"), name, mode="append")
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        F.unix_micros(F.col("session_end")).alias("session_end_us"),
        "n_events",
    )


SQL_STREAMING_SESSIONS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), b AS (
  SELECT user_id, us,
    CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 21600000000
         THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
), s AS (
  SELECT user_id, us,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING)
      AS sid
  FROM b
), agg AS (
  SELECT user_id,
    MIN(us) AS session_start_us, MAX(us) AS session_end_us,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    MAX(MAX(us)) OVER (PARTITION BY user_id) AS user_last_us
  FROM s GROUP BY user_id, sid
), wm AS (
  SELECT MAX(us) // 1000 - 3600000 AS wm_ms FROM e
)
SELECT user_id, session_start_us, session_end_us, n_events
FROM agg, wm
WHERE session_end_us < user_last_us
   OR session_end_us // 1000 + 21600000 < wm_ms
"""


CORE_QUERIES["streaming_sessions"] = (q_streaming_sessions, SQL_STREAMING_SESSIONS)


def _dedup_clusters_contract(
    docs: DataFrame, algorithm: str
) -> DataFrame:
    """Scale-valid contract for the LSH->components dedup cascade
    (VERDICT r8 item 2, the semantic_dedup pattern):

    - **exact labels** (strong): (component, is_survivor) computed
      over the EXACT Jaccard >= 30% pair graph — DuckDB restates them
      with an independent recursive-CTE min-reachable-id, so the
      connected-components machinery is hash-checked at full strength
      at EVERY scale factor (the former oracle fed the CTE the exact
      pairs but Spark the LSH pairs, a pinned-corpus coincidence that
      breaks at sf1 where banding recall is 96.7%).
    - **refinement legality** per doc: the doc's LSH-derived component
      (banding candidates, exact-verified) maps into exactly ONE exact
      component.  Since exact-verified LSH pairs are a SUBSET of the
      exact pair graph, refinement holds BY THEOREM — the column
      cross-checks the two CC runs against each other.
    - **recall-floor sentinel** (doc_id = -1): >= 90% of docs with a
      HIGH-confidence partner (exact Jaccard >= 80%) are clustered by
      the LSH cascade (per-pair banding miss at J=0.8 is ~1.5%, so
      the 10% allowance holds at any corpus size).
    """
    from .operators.dedup import exact_verify_pairs
    from .operators.graph import dedup_survivors

    exact = jaccard_pairs(docs, exact=True).localCheckpoint(eager=True)
    cand = minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, verify_threshold_pct=None, exact=True
    ).select("id_a", "id_b")
    mh = exact_verify_pairs(docs, cand, threshold_pct=30).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=True)
    exact_cc = dedup_survivors(
        exact.select("id_a", "id_b"), docs.select("doc_id"),
        algorithm=algorithm,
    )
    mh_cc = dedup_survivors(mh, docs.select("doc_id"), algorithm=algorithm)
    j = exact_cc.select(
        F.col("id").alias("doc_id"), "component", "is_survivor"
    ).join(
        mh_cc.select(
            F.col("id").alias("doc_id"), F.col("component").alias("__mc")
        ),
        "doc_id",
    )
    consist = j.groupBy("__mc").agg(
        (F.countDistinct("component") == 1).alias("__ok")
    )
    per_row = j.join(consist, "__mc").select(
        "doc_id", "component", "is_survivor", F.col("__ok").alias("legal")
    )
    high = exact.filter(F.col("inter") * 100 >= F.col("uni") * 80)
    high_ids = (
        high.select(F.col("id_a").alias("doc_id"))
        .unionByName(high.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    linked = (
        mh.select(F.col("id_a").alias("doc_id"))
        .unionByName(mh.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__f", F.lit(1))
    )
    floor_row = high_ids.join(linked, "doc_id", "left").agg(
        (
            F.coalesce(F.sum("__f"), F.lit(0)) * 10
            >= F.count(F.lit(1)) * 9
        ).alias("legal")
    ).select(
        F.lit(-1).cast("long").alias("doc_id"),
        F.lit(-1).cast("long").alias("component"),
        F.lit(True).alias("is_survivor"),
        "legal",
    )
    return per_row.unionByName(floor_row)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL 100 TB dedup cascade: MinHash-LSH candidate pairs
    (EXACT-verified, operators/dedup.py exact_verify_pairs) ->
    connected components (operators/graph.py, hash-min label
    propagation) -> one survivor per cluster (min doc_id). A~B and B~C
    collapse into one cluster even though (A,C) was never compared —
    the transitive closure pair-finding alone cannot express.
    Restated as the scale-valid contract (see
    :func:`_dedup_clusters_contract`): exact-graph labels the DuckDB
    recursive CTE restates independently + per-doc refinement legality
    of the LSH cascade + a recall-floor sentinel, all assertable at
    every SF (VERDICT r8 item 2)."""
    docs = _t(spark, sf_dir, "documents")
    return _dedup_clusters_contract(docs, algorithm="hash_min")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({SQL_DOC_JACCARD_PAIRS}) t
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(v, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.v, e.v FROM reach JOIN e ON reach.r = e.u
)
SELECT v AS doc_id, MIN(r) AS component, (v = MIN(r)) AS is_survivor
FROM reach GROUP BY v
"""


#: Contract form (VERDICT r8 item 2): exact-graph labels + always-TRUE
#: refinement legality + the recall-floor sentinel row.
SQL_DEDUP_CLUSTERS_CONTRACT = f"""
SELECT doc_id, component, is_survivor, TRUE AS legal
FROM ({SQL_DEDUP_CLUSTERS}) c
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), TRUE, TRUE  -- recall floor
"""


CORE_QUERIES["dedup_clusters"] = (q_dedup_clusters, SQL_DEDUP_CLUSTERS_CONTRACT)


def q_dedup_clusters_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dedup-cascade contract as dedup_clusters, but closing BOTH
    pair graphs with the large-star/small-star algorithm
    (operators/graph.py connected_components(algorithm="two_phase"),
    Kiveris et al. 2014) — O(log^2 n) rounds on ANY component shape,
    including the adversarial long-chain clusters (a doc edited daily)
    that cost hash-min diameter rounds. Identical labeling by
    construction, so both queries share one oracle; the fixpoint
    equality is additionally pinned on random + path graphs in
    tests/test_operators_more.py."""
    docs = _t(spark, sf_dir, "documents")
    return _dedup_clusters_contract(docs, algorithm="two_phase")


CORE_QUERIES["dedup_clusters_twophase"] = (
    q_dedup_clusters_twophase,
    SQL_DEDUP_CLUSTERS_CONTRACT,
)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (operators/similarity.py
    semantic_dedup): k-means cells -> within-cell exact-cosine pairs ->
    components -> min-id survivors, on the same PLANTED corpus as
    embedding_near_dup (raw embeddings are noise, max pairwise cos
    ~0.51; a perturbed copy of the first 50 vectors at id+1M plants
    cos ~0.99 pairs).

    Restated (r6 verdict item 2) as the contract the nprobe=1
    sample-fit path actually GUARANTEES at every SF: precision is
    exact (within-cell pairs are verified by exact cosine, so no
    noise pair ever merges and every original stays its own
    survivor), while recall is cell-coincidence-approximate (a
    planted pair straddling a k-means cell boundary is legally
    missed, leaving the copy a self-survivor).  The query therefore
    emits, per corpus member, whether its (component, is_survivor)
    state is one of the legal outcomes — originals must be their own
    surviving component; copies either link to their source as
    non-survivors (pair co-celled) or fall back to self-survivor
    (boundary miss).  The oracle asserts `legal` for every row —
    exact at EVERY SF.  The previous exact-grouping oracle asserted
    FULL recall, which nprobe=1 does not guarantee (it hash-missed
    at sf0.1 on one boundary pair); that stronger contract lives on
    the nprobe=2 siblings semantic_dedup_distributed /
    semantic_dedup_hierarchical, which remain exact-grouping.

    Recall FLOOR (ADVICE r7): per-row legality alone would accept a
    dedup that merges NOTHING (every copy legally self-surviving), so
    the result also carries one sentinel row (vec_id = -1) whose
    `legal` asserts that >= 48 of the 50 planted copies actually
    linked to their source — the observed worst case is ONE boundary
    miss, so the floor keeps a 2-pair allowance while making zero
    recall a gate FAILURE, in the gate oracle itself rather than only
    in pytest."""
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + 0.02 * F.sin(F.col("vec_id") * 31 + i),
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    # two consumers below (per-row legality + the recall-floor
    # aggregate); the result is corpus-row-sized and the dedup itself
    # is the expensive part, so materialize once
    res = semantic_dedup(corpus, threshold=0.9).localCheckpoint(eager=True)
    legal = F.when(
        F.col("id") < 1_000_000,
        (F.col("component") == F.col("id")) & F.col("is_survivor"),
    ).otherwise(
        (
            (F.col("component") == F.col("id") - 1_000_000)
            & ~F.col("is_survivor")
        )
        | ((F.col("component") == F.col("id")) & F.col("is_survivor"))
    )
    per_row = res.select(F.col("id").alias("vec_id"), legal.alias("legal"))
    floor_row = (
        res.filter(
            (F.col("id") >= 1_000_000)
            & ~F.col("is_survivor")
            & (F.col("component") == F.col("id") - 1_000_000)
        )
        .agg((F.count(F.lit(1)) >= F.lit(48)).alias("legal"))
        .select(F.lit(-1).cast("long").alias("vec_id"), "legal")
    )
    return per_row.unionByName(floor_row)


SQL_SEMANTIC_DEDUP = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(vec_id AS BIGINT) AS component,
       TRUE AS is_survivor
FROM embeddings
UNION ALL
SELECT CAST(vec_id + 1000000 AS BIGINT) AS vec_id,
       CAST(vec_id AS BIGINT) AS component,
       FALSE AS is_survivor
FROM embeddings WHERE vec_id < 50
"""


SQL_SEMANTIC_DEDUP_LEGAL = """
SELECT CAST(vec_id AS BIGINT) AS vec_id, TRUE AS legal FROM embeddings
UNION ALL
SELECT CAST(vec_id + 1000000 AS BIGINT) AS vec_id, TRUE AS legal
FROM embeddings WHERE vec_id < 50
UNION ALL
SELECT CAST(-1 AS BIGINT) AS vec_id, TRUE AS legal  -- recall floor row
"""


CORE_QUERIES["semantic_dedup"] = (q_semantic_dedup, SQL_SEMANTIC_DEDUP_LEGAL)


def q_doc_rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-based OOV/quality stats (operators/text.py
    rare_token_stats): tokens outside the corpus top-20 vocabulary are
    'rare'. top_k_vocab=20 deliberately lands INSIDE this corpus'
    ~30-word vocabulary so the cutoff boundary (count-desc, token-asc
    ties) is exercised, not vacuous. Pass 1 is a posting aggregate +
    TakeOrderedAndProject (driver sees K strings); pass 2 is a narrow
    map with the vocab folded in as an InSet literal — no second
    corpus shuffle. BIGINT-only output."""
    from .operators.text import rare_token_stats

    docs = _t(spark, sf_dir, "documents")
    return rare_token_stats(docs, top_k_vocab=20)


SQL_DOC_RARE_TOKEN_STATS = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c
    FROM (SELECT unnest(t) AS tok FROM toks)
    GROUP BY tok
    ORDER BY c DESC, tok
    LIMIT 20
  )
),
vl AS (SELECT list(tok) AS v FROM vocab)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(t, x -> NOT list_contains(v, x))) AS BIGINT)
         AS n_rare,
       CAST(len(list_distinct(list_filter(t, x -> NOT list_contains(v, x))))
            AS BIGINT) AS n_distinct_rare
FROM toks CROSS JOIN vl
"""


CORE_QUERIES["doc_rare_token_stats"] = (
    q_doc_rare_token_stats,
    SQL_DOC_RARE_TOKEN_STATS,
)


def q_doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (overlap-coefficient) near-dup pairs
    (operators/dedup.py containment_pairs): inter / min(|A|,|B|) >= 80%
    over 3-gram shingles — the quote/excerpt detector. A short doc fully
    inside a long one scores ~100% here while its Jaccard stays tiny, so
    this catches the partial-scrape/boilerplate-inclusion class that
    jaccard_pairs is blind to. Integer-only threshold math; exact
    semantics (exact=True) for the oracle."""
    from .operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    return containment_pairs(docs, n=3, threshold_pct=80, exact=True)


SQL_DOC_CONTAINMENT_PAIRS = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
        FROM toks WHERE len(t) >= 3)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter, sa.nsh AS n_a, sb.nsh AS n_b
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 100 >= LEAST(sa.nsh, sb.nsh) * 80
"""


CORE_QUERIES["doc_containment_pairs"] = (
    q_doc_containment_pairs,
    SQL_DOC_CONTAINMENT_PAIRS,
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language corpus rebalancing
    (operators/sampling.py): keep-rate by stratum via md5 hash-gating —
    partitioning-independent, auditable per row, engine-portable (the
    DuckDB oracle replays the exact selection). The shape every
    training-data mix step needs; df.sample() cannot give any of those
    properties."""
    from .operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs,
        key_col="doc_id",
        strata_col="lang",
        rates={"en": 0.25, "de": 0.5, "es": 0.75, "fr": 1.0},
        default_rate=0.1,
    )
    return out.select("doc_id", "lang", "source")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
  CASE lang
    WHEN 'fr' THEN 'g'
    WHEN 'es' THEN 'c0000000'
    WHEN 'de' THEN '80000000'
    WHEN 'en' THEN '40000000'
    ELSE '19999999' END
"""


CORE_QUERIES["stratified_sample"] = (q_stratified_sample, SQL_STRATIFIED_SAMPLE)


def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py): documents walked per
    language in doc_id order, greedily packed into 500-token context
    windows — restated as a SCALE-VALID CONTRACT (VERDICT r9 item 3,
    the pattern that retired the other 12 sf1 exclusions in r9).

    The previous oracle replayed the walk with a one-row-per-step
    recursive CTE — exact, but sequential and quadratic in DuckDB at
    50k+ rows, so doc_packing was the registry's last sf1 exclusion.
    This contract is equally COMPLETE: for a fixed order and budget,
    the greedy assignment is the UNIQUE per-group contiguous
    segmentation in which (a) every multi-doc pack fits the budget and
    (b) every pack boundary is forced (the next pack's first doc could
    not have fit). Proof sketch: walk the segments in order — (b)
    forces each segment to end exactly where greedy ends it, (a) rules
    out ending earlier than greedy only if the boundary were unforced.
    So the four sentinels below jointly pin the full per-doc pack_id
    the old oracle echoed, while every oracle aggregate stays linear:

    - conservation_docs / conservation_tokens: per-lang doc and token
      totals of the PACKED output — the oracle recomputes both from
      the raw table (items neither lost nor invented);
    - capacity: every pack with >= 2 docs fits the 500-token budget
      (an oversized single doc legally gets its own pack);
    - contiguous: walking docs in doc_id order, pack_id starts at 0
      and steps by 0 or 1 — packs are contiguous, ordered intervals;
    - boundary_forced: for every pack after the first, the previous
      pack's total plus this pack's first doc exceeds the budget.

    The per-doc semantics additionally stay pinned engine-side by the
    hypothesis property test (tests/test_scalar_properties.py
    test_pack_sequences_matches_reference_walk) against an independent
    reference walk."""
    from .operators.packing import pack_sequences

    budget = 500
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    # Four contract branches read the packed output; materialize the
    # Arrow walk ONCE (family style: eager localCheckpoint) instead of
    # letting plan inlining re-run it per branch.
    packed = pack_sequences(
        docs, group_col="lang", order_col="doc_id",
        token_col="n_tokens", budget=budget,
    ).select("lang", "doc_id", "n_tokens", "pack_id").localCheckpoint(
        eager=True
    )

    conservation = packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    cons_docs = conservation.select(
        "lang", F.lit("conservation_docs").alias("chk"),
        F.col("n_docs").cast("long").alias("val"), F.lit(True).alias("legal"),
    )
    cons_toks = conservation.select(
        "lang", F.lit("conservation_tokens").alias("chk"),
        F.col("sum_tokens").cast("long").alias("val"),
        F.lit(True).alias("legal"),
    )

    packs = packed.groupBy("lang", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.count(F.lit(1)).alias("n_in_pack"),
        F.min_by("n_tokens", "doc_id").alias("first_tokens"),
    )
    capacity = packs.groupBy("lang").agg(
        F.min(
            (F.col("n_in_pack") == 1) | (F.col("pack_tokens") <= budget)
        ).alias("legal")
    ).select(
        "lang", F.lit("capacity").alias("chk"),
        F.lit(0).cast("long").alias("val"), "legal",
    )

    w = Window.partitionBy("lang").orderBy("doc_id")
    steps = packed.select(
        "lang",
        F.col("pack_id").alias("pid"),
        F.lag("pack_id").over(w).alias("prev_pid"),
    )
    contiguous = steps.groupBy("lang").agg(
        F.min(
            F.when(F.col("prev_pid").isNull(), F.col("pid") == 0).otherwise(
                (F.col("pid") - F.col("prev_pid")).isin(0, 1)
            )
        ).alias("legal")
    ).select(
        "lang", F.lit("contiguous").alias("chk"),
        F.lit(0).cast("long").alias("val"), "legal",
    )

    wp = Window.partitionBy("lang").orderBy("pack_id")
    forced = packs.select(
        "lang", "pack_id", "first_tokens",
        F.lag("pack_tokens").over(wp).alias("prev_tokens"),
    ).groupBy("lang").agg(
        F.min(
            F.when(F.col("prev_tokens").isNull(), F.lit(True)).otherwise(
                F.col("prev_tokens") + F.col("first_tokens") > budget
            )
        ).alias("legal")
    ).select(
        "lang", F.lit("boundary_forced").alias("chk"),
        F.lit(0).cast("long").alias("val"), "legal",
    )

    return (
        cons_docs.unionByName(cons_toks)
        .unionByName(capacity)
        .unionByName(contiguous)
        .unionByName(forced)
    )


SQL_DOC_PACKING = """
WITH d AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang, 'conservation_docs' AS chk, CAST(COUNT(*) AS BIGINT) AS val,
       TRUE AS legal
FROM d GROUP BY lang
UNION ALL
SELECT lang, 'conservation_tokens', CAST(SUM(n_tokens) AS BIGINT), TRUE
FROM d GROUP BY lang
UNION ALL
SELECT lang, 'capacity', CAST(0 AS BIGINT), TRUE FROM d GROUP BY lang
UNION ALL
SELECT lang, 'contiguous', CAST(0 AS BIGINT), TRUE FROM d GROUP BY lang
UNION ALL
SELECT lang, 'boundary_forced', CAST(0 AS BIGINT), TRUE FROM d GROUP BY lang
"""


CORE_QUERIES["doc_packing"] = (q_doc_packing, SQL_DOC_PACKING)


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-20 for the query terms
    ('spark','hash','join') with rational RSJ idf (operators/text.py
    bm25_topk) — every score op is IEEE +,-,*,/ so the DuckDB twin is
    bit-identical; subexpressions shared with the oracle (k1+1, 1-b,
    avgdl) are COMPUTED, never re-written as rounded literals."""
    from .operators.text import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, terms=["spark", "hash", "join"], k=20)


SQL_BM25_SEARCH = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS dl,
         CAST(len(list_filter(tk, x -> x = 'spark')) AS BIGINT) AS tf0,
         CAST(len(list_filter(tk, x -> x = 'hash'))  AS BIGINT) AS tf1,
         CAST(len(list_filter(tk, x -> x = 'join'))  AS BIGINT) AS tf2
  FROM toks
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
         CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM base
)
SELECT doc_id,
  -- every literal ::DOUBLE: bare decimals are DECIMAL-typed in DuckDB
  -- and decimal arithmetic rounds differently from IEEE doubles
  (((n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE)) * ((tf0 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      (tf0 + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE) + 0.75::DOUBLE * (dl / avgdl)))))
  + (((n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE)) * ((tf1 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      (tf1 + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE) + 0.75::DOUBLE * (dl / avgdl)))))
  + (((n - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE)) * ((tf2 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      (tf2 + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE) + 0.75::DOUBLE * (dl / avgdl)))))
  AS score
FROM base, stats
ORDER BY score DESC, doc_id
LIMIT 20
"""


CORE_QUERIES["bm25_search"] = (q_bm25_search, SQL_BM25_SEARCH)


def q_returnflag_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long inverse of the reference's pivot (A4): the cents-exact
    category-totals wide table melted back to (key, flag, total) with
    native ``DataFrame.unpivot`` — a narrow map over the aggregated
    wide table (no shuffle beyond the pivot's own aggregate)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", money_cents("l_extendedprice")
    )
    wide = sum_pivot(
        li, ["l_suppkey"], "l_returnflag", ["A", "N", "R"], "cents", fill=0
    )
    return wide.unpivot(
        ids=["l_suppkey"],
        values=["A", "N", "R"],
        variableColumnName="returnflag",
        valueColumnName="total_cents",
    )


SQL_RETURNFLAG_UNPIVOT = f"""
UNPIVOT (
  -- CAST each branch to BIGINT: DuckDB SUM(BIGINT) is HUGEINT (INT128),
  -- which value-hashes differently from Spark's BIGINT even when every
  -- value is identical (verified r3: row sets equal, hash mismatched).
  SELECT l_suppkey,
    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN {_cents_sql("l_extendedprice")} END), 0) AS BIGINT) AS "A",
    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN {_cents_sql("l_extendedprice")} END), 0) AS BIGINT) AS "N",
    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN {_cents_sql("l_extendedprice")} END), 0) AS BIGINT) AS "R"
  FROM lineitem GROUP BY l_suppkey
) ON "A", "N", "R" INTO NAME returnflag VALUE total_cents
"""


CORE_QUERIES["returnflag_unpivot"] = (q_returnflag_unpivot, SQL_RETURNFLAG_UNPIVOT)


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP exact quantiles (the global form backs segmentation;
    this is the grouped companion): quartiles of l_quantity per return
    flag. Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    same linear-interpolation definition, so values hash-match exactly.
    Library scale default stays percentile_approx (plan-test pinned);
    exact is the oracle opt-in."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit([0.25, 0.5, 0.75])).alias("qs")
    )
    return q.select(
        "l_returnflag",
        F.col("qs")[0].alias("q25"),
        F.col("qs")[1].alias("q50"),
        F.col("qs")[2].alias("q75"),
    )


SQL_GROUP_QUANTILES = """
SELECT l_returnflag,
       qs[1] AS q25, qs[2] AS q50, qs[3] AS q75
FROM (
  SELECT l_returnflag,
         quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS qs
  FROM lineitem GROUP BY l_returnflag
)
"""


CORE_QUERIES["group_quantiles"] = (q_group_quantiles, SQL_GROUP_QUANTILES)


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming dedup: availableNow stream ->
    dropDuplicatesWithinWatermark on (user_id, event_type) — the
    at-least-once-source -> exactly-once-sink pattern. The watermark
    delay (35 d) exceeds the data's 30-day span, so every duplicate
    falls within the dedup window and each key emits exactly once;
    projecting the key columns (not the nondeterministic surviving
    row's timestamp) makes the output deterministic = DISTINCT keys.
    State is bounded by the watermark at streaming scale (keys older
    than the delay are evicted)."""
    import os
    import tempfile

    from .streaming.incremental import run_incremental

    tune(spark, shuffle_partitions=32)
    path = os.path.join(sf_dir, "events.parquet")
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    from .sources.tables import event_ts

    stream = event_ts(stream)
    deduped = (
        stream.select("user_id", "event_type", "ts")
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    ckpt = tempfile.mkdtemp(prefix="c360_q_sdedup_")
    name = f"stream_dedup_{os.path.basename(ckpt).split('_')[-1]}"
    # state_partitions=8: ~7.5k (user, event_type) dedup keys at the
    # bench SF — fixed per-partition state-store cost dominates at 32.
    # Measured min-of-3 at sf0.1: 1.52 s at 32 parts, 1.19 s at 8.
    run_incremental(
        deduped, os.path.join(ckpt, "ckpt"), name, mode="append",
        state_partitions=8,
    )
    return spark.table(name)


SQL_STREAMING_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
"""


CORE_QUERIES["streaming_dedup"] = (q_streaming_dedup, SQL_STREAMING_DEDUP)


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimates for the five known event
    types, joined against exact counts (operators/aggregates.py
    cms_frequencies). Oracle: the CMS guarantee is estimate >= exact
    ALWAYS; with eps=0.001 the sketch is 2719 counters wide and the 5
    keys are collision-free, so estimates EQUAL exact counts at every
    shipped SF (verified; the >= theorem itself is pinned in pytest
    with a deliberately-narrow sketch that does collide). The sketch
    is one mergeable global aggregate — partitioning-independent for a
    fixed seed."""
    from .operators.aggregates import cms_frequencies

    ev = _t(spark, sf_dir, "events")
    cands = ["click", "error", "purchase", "signup", "view"]
    est = cms_frequencies(ev, "event_type", cands, eps=0.001, seed=42)
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type", "n", "cms_n"
    )


SQL_HEAVY_HITTERS_CMS = """
SELECT event_type, COUNT(*) AS n, COUNT(*) AS cms_n
FROM events
WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
GROUP BY event_type
"""


CORE_QUERIES["heavy_hitters_cms"] = (q_heavy_hitters_cms, SQL_HEAVY_HITTERS_CMS)


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global token frequencies, top-50 with a
    total order (n DESC, token ASC). explode -> two-level aggregate
    (partial map-side combine carries one row per (task, token), so the
    shuffle is vocabulary-sized, not corpus-sized) ->
    TakeOrderedAndProject. The corpus-prep step before any tokenizer
    training."""
    from .operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(50)
    )


SQL_VOCAB_TOPK = """
SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents)
GROUP BY t
ORDER BY n DESC, token
LIMIT 50
"""


CORE_QUERIES["vocab_topk"] = (q_vocab_topk, SQL_VOCAB_TOPK)


def q_dedup_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: near-dup components with the
    LONGEST member kept (priority = n_chars, id-ascending tiebreak) —
    the "keep the best copy" rule real corpus dedup wants, computed as
    one hash-aggregate argmax per component (no window). Oracle:
    recursive-CTE components + ROW_NUMBER over (n_chars DESC, doc_id).

    The pair graph is the EXACT Jaccard >= 30% set
    (operators/dedup.py jaccard_pairs), so the oracle asserts at every
    scale factor (VERDICT r8 item 2: the former minhash input made
    this an sf-coincidence oracle that measurably FAILED at sf1).  The
    operator under test here is the survivor-selection aggregate; the
    LSH->components composition keeps its own scale-valid contract in
    dedup_clusters."""
    from .operators.graph import dedup_survivors

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, exact=True).select("id_a", "id_b")
    out = dedup_survivors(
        pairs, docs.select("doc_id", "n_chars"), priority_col="n_chars"
    )
    return out.select(
        F.col("id").alias("doc_id"), "component", "is_survivor"
    )


SQL_DEDUP_BEST_SURVIVORS = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({SQL_DOC_JACCARD_PAIRS}) t
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(v, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.v, e.v FROM reach JOIN e ON reach.r = e.u
), comp AS (
  SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v
), ranked AS (
  SELECT c.doc_id, c.component,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT doc_id, component, (rk = 1) AS is_survivor FROM ranked
"""


CORE_QUERIES["dedup_best_survivors"] = (
    q_dedup_best_survivors,
    SQL_DEDUP_BEST_SURVIVORS,
)


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.py
    sample_frames): each media row expands to its 1-per-second frame
    timestamps from METADATA ONLY — the blob column is never read
    (pruning pinned in tests/test_plan_shape.py for the media path).
    documents are adapted as media rows (duration = n_chars*10 ms), so
    the expansion is fully deterministic and the oracle replays it with
    generate_series. Frame counts agree exactly: Spark truncates the
    double quotient (floor for positives; correctly-rounded division of
    exact integers can never cross the next whole number) while the
    oracle uses DuckDB integer division — a plain double->INT cast
    would NOT work there (DuckDB rounds half-even, Spark truncates)."""
    from .operators.multimodal import documents_as_media, sample_frames

    docs = _t(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_media(docs), every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_ts_ms",
    )


SQL_MEDIA_FRAME_SAMPLE = """
SELECT media_id, frame_idx, frame_idx * 1000 AS frame_ts_ms
FROM (
  SELECT doc_id AS media_id,
         unnest(generate_series(0, (n_chars * 10) // 1000 - 1)) AS frame_idx
  FROM documents
  WHERE (n_chars * 10) // 1000 > 0
)
"""


CORE_QUERIES["media_frame_sample"] = (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest validation (operators/aggregates.py profile_columns):
    rows/nulls/exact-distinct for three orders columns in ONE aggregate
    job (multi-countDistinct plans as a single Expand+agg scan, never a
    scan per column)."""
    from .operators.aggregates import profile_columns

    o = _t(spark, sf_dir, "orders")
    return profile_columns(o, ["o_custkey", "o_orderstatus", "o_orderpriority"])


SQL_TABLE_PROFILE = """
SELECT 'o_custkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
FROM orders
"""


CORE_QUERIES["table_profile"] = (q_table_profile, SQL_TABLE_PROFILE)


# --- classic warehouse analytics (TPC-H-shaped joins + window metrics) ------

from .analytics_queries import ANALYTICS_QUERIES  # noqa: E402

CORE_QUERIES.update(ANALYTICS_QUERIES)


# --- training-data curation (splits, PII, repetition, contamination) --------

from .curation_queries import CURATION_QUERIES  # noqa: E402

CORE_QUERIES.update(CURATION_QUERIES)


def q_incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the daily-ingest shape: dedup a NEW
    batch of documents (doc_id % 5 == 0) against the standing corpus
    (the rest) via a precomputed MinHash index, without re-reading or
    re-shingling the corpus text. The new batch's band rows are
    broadcast, so the corpus is scanned once and never shuffled
    (operators/dedup.py minhash_index / minhash_lsh_join).

    Restated as the scale-valid probe contract (VERDICT r8 item 2, see
    :func:`cross_dedup_contract`): exact cross-pair echo + precision
    sentinel over the EXACT-verified candidates + banding recall-floor
    sentinel — the former oracle asserted the exact cross set against
    the signature-verified probe, a pinned-corpus coincidence that
    breaks at sf1 (banding recall 96.7%)."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = minhash_index(corpus)
    cand = minhash_lsh_join(
        new, idx, num_hashes=32, bands=8, verify_threshold_pct=None
    ).select("new_id", "corpus_id")
    exact_cross = exact_cross_pairs(
        docs, (F.col("doc_id") % 5 == 0).cast("int")
    )
    return cross_dedup_contract(docs, exact_cross, cand)


SQL_INCREMENTAL_CORPUS_DEDUP = """
-- Scale-valid contract oracle (VERDICT r8 item 2): the exact
-- cross-split 3-gram Jaccard >= 30% pairs (computed independently
-- here) as the legality echo, plus the probe's precision and
-- recall-floor sentinel rows, which the Spark side computes and this
-- oracle asserts TRUE — valid at EVERY scale factor (the former form
-- asserted the exact set against the signature-verified probe, a
-- pinned-corpus coincidence).
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
        FROM toks WHERE len(t) >= 3)
),
sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
  GROUP BY 1, 2
)
SELECT new_id, corpus_id, TRUE AS legal
FROM pairs
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = corpus_id
WHERE inter * 100 >= (sa.nsh + sb.nsh - inter) * 30
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), TRUE  -- precision sentinel
UNION ALL
SELECT CAST(-2 AS BIGINT), CAST(-2 AS BIGINT), TRUE  -- recall floor (high-J)
"""


CORE_QUERIES["incremental_corpus_dedup"] = (
    q_incremental_corpus_dedup,
    SQL_INCREMENTAL_CORPUS_DEDUP,
)


def q_incremental_corpus_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dedup as incremental_corpus_dedup, but probing the PERSISTED
    on-disk index form (operators/dedup.py write_minhash_index /
    read_minhash_index): the corpus signature table bucketed by id and
    the pre-exploded band-rows table bucketed by (band, bhash). The
    batch probe reads corpus band rows straight from their buckets —
    zero Exchange on the corpus side, no re-shingling, no band-hash
    recompute per batch (VERDICT r4 item 1; plan pinned in
    tests/test_extensions.py). Results must be identical to the
    in-memory form, so both queries share one oracle."""
    from .operators.dedup import read_minhash_index, write_minhash_index
    from .phases import phase

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # num_buckets sizes to the corpus: 8 at bench SF (32 buckets paid 2x
    # in per-file overhead for these row counts, measured 7.2s -> 3.3s);
    # a real corpus sizes buckets to ~executor-memory-fit partitions.
    with phase("build"):
        idx_name = f"mh_corpus_idx_{sf_tag(sf_dir)}"
        write_minhash_index(
            corpus, idx_name, num_hashes=32, bands=8, num_buckets=8
        )
        idx = read_minhash_index(spark, idx_name)
    cand = minhash_lsh_join(new, idx, verify_threshold_pct=None).select(
        "new_id", "corpus_id"
    )
    exact_cross = exact_cross_pairs(
        docs, (F.col("doc_id") % 5 == 0).cast("int")
    )
    return cross_dedup_contract(docs, exact_cross, cand)


CORE_QUERIES["incremental_corpus_dedup_indexed"] = (
    q_incremental_corpus_dedup_indexed,
    SQL_INCREMENTAL_CORPUS_DEDUP,
)


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 (terms 'spark hash join')
    fused with exact cosine top-20 for query vector 0 by reciprocal-rank
    fusion (k=60) — the standard lexical+vector retrieval shape for
    training-data curation and RAG corpus construction.

    Exactness: both component rankings are deterministic integer ranks
    (rational-idf BM25, tie-broken cosine); the RRF score
    1/(60+rank) sums two IEEE doubles computed from small integers, so
    Spark and DuckDB order identically; the OUTPUT carries only BIGINT
    ranks (-1 for absent), never floats. The fusion windows run over
    <= 40 pre-reduced rows (both inputs are already top-20), so the
    unpartitioned row_numbers are driver-trivial at any corpus size —
    the heavy lifting stays in bm25_topk's TakeOrderedAndProject and
    the broadcast-query cosine scan."""
    from .operators.similarity import cosine_topk_bruteforce
    from .operators.text import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    lex = bm25_topk(docs, terms=["spark", "hash", "join"], k=20)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = lex.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("lex_rank")
    )
    vec = cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=20
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("vec_rank"))

    fused = lex.join(vec, "doc_id", "full_outer")
    rrf = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(60) + F.col("lex_rank")),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("vec_rank").isNotNull(),
        F.lit(1.0) / (F.lit(60) + F.col("vec_rank")),
    ).otherwise(F.lit(0.0))
    wf = Window.orderBy(F.col("__rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("__rrf", rrf)
        .withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(-1)).cast("long").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(-1)).cast("long").alias("vec_rank"),
            "fused_rank",
        )
    )


SQL_HYBRID_SEARCH_RRF = f"""
WITH lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
  FROM ({SQL_BM25_SEARCH}) bm
), vec AS (
  SELECT neighbor_id AS doc_id, CAST(rk AS BIGINT) AS vec_rank FROM (
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qe,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id = 0
    ), n AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ne,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
      FROM embeddings WHERE vec_id <> 0
    ), s AS (
      SELECT neighbor_id, list_dot_product(qe, ne) / (qn * nn) AS cos FROM n, q
    )
    SELECT neighbor_id, ROW_NUMBER() OVER (ORDER BY cos DESC, neighbor_id) AS rk
    FROM s QUALIFY rk <= 20
  )
), fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         COALESCE(l.lex_rank, -1) AS lex_rank,
         COALESCE(v.vec_rank, -1) AS vec_rank,
         (CASE WHEN l.lex_rank IS NULL THEN 0.0::DOUBLE
               ELSE 1.0::DOUBLE / (60 + l.lex_rank) END
        + CASE WHEN v.vec_rank IS NULL THEN 0.0::DOUBLE
               ELSE 1.0::DOUBLE / (60 + v.vec_rank) END) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= 10
"""


CORE_QUERIES["hybrid_search_rrf"] = (q_hybrid_search_rrf, SQL_HYBRID_SEARCH_RRF)


#: The literal query set for the multi-query hybrid retrieval demo:
#: three queries over the testdata vocabulary, 2-3 terms each.
_HYBRID_MULTI_QUERIES: dict[int, list[str]] = {
    0: ["spark", "hash", "join"],
    1: ["stream", "window"],
    2: ["merge", "sort", "batch"],
}


def q_hybrid_search_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query hybrid retrieval (VERDICT r4 item 5): BM25 top-20 per
    query from ONE shared posting build (operators/text.py
    bm25_topk_multi) fused with per-query cosine top-20
    (cosine_topk_bruteforce) by reciprocal-rank fusion partitioned by
    query_id (operators/fusion.py rrf_fuse). Three literal queries here;
    the plan shape is query-count-independent — posting joins broadcast
    the query terms, every window is partitioned by query_id, so the
    same plan serves thousands of queries.

    Exactness: BM25 doubles are folded in pinned term order (matching
    the oracle's list_reduce over an ORDER BY term_idx list), cosine
    ties break on neighbor_id, fusion consumes only BIGINT ranks —
    output is BIGINT-only."""
    from .operators.fusion import rrf_fuse
    from .operators.similarity import cosine_topk_bruteforce
    from .operators.text import bm25_topk_multi

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk_multi(docs, _HYBRID_MULTI_QUERIES, k=20)
    vec = cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id").isin(list(_HYBRID_MULTI_QUERIES))), k=20
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk").alias("rank"),
    )
    return rrf_fuse({"lex": lex, "vec": vec}, keys=["query_id"], topn=5)


SQL_HYBRID_SEARCH_MULTI = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
q(query_id, term_idx, term) AS (
  VALUES (0::BIGINT, 0, 'spark'), (0::BIGINT, 1, 'hash'), (0::BIGINT, 2, 'join'),
         (1::BIGINT, 0, 'stream'), (1::BIGINT, 1, 'window'),
         (2::BIGINT, 0, 'merge'), (2::BIGINT, 1, 'sort'), (2::BIGINT, 2, 'batch')
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
post AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN (SELECT DISTINCT term FROM q)
  GROUP BY doc_id, tok
),
tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM post GROUP BY term),
contrib AS (
  SELECT q.query_id, p.doc_id, q.term_idx,
         ((st.n - tdf.df_t + 0.5::DOUBLE) / (tdf.df_t + 0.5::DOUBLE))
         * ((p.tf::DOUBLE * (1.2::DOUBLE + 1.0::DOUBLE))
            / (p.tf::DOUBLE + 1.2::DOUBLE *
               (0.25::DOUBLE + 0.75::DOUBLE * (dl.dl / (st.sumdl::DOUBLE / st.n))))) AS c
  FROM post p
  JOIN q ON q.term = p.term
  JOIN tdf ON tdf.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN st
),
sc AS (
  SELECT query_id, doc_id,
         list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term_idx)),
                     (a, b) -> a + b) AS score
  FROM contrib GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
  FROM sc QUALIFY rnk <= 20
),
qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
nv AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ne,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
  FROM embeddings
),
s AS (
  SELECT query_id, neighbor_id, list_dot_product(qe, ne) / (qn * nn) AS cos
  FROM nv CROSS JOIN qv WHERE neighbor_id <> query_id
),
vec AS (
  SELECT query_id, neighbor_id AS doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
  FROM s QUALIFY rnk <= 20
),
fused AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         COALESCE(l.rnk, -1) AS rank_lex,
         COALESCE(v.rnk, -1) AS rank_vec,
         (CASE WHEN l.rnk IS NULL THEN 0.0::DOUBLE
               ELSE 1.0::DOUBLE / (60 + l.rnk) END
        + CASE WHEN v.rnk IS NULL THEN 0.0::DOUBLE
               ELSE 1.0::DOUBLE / (60 + v.rnk) END) AS rrf
  FROM lex l FULL OUTER JOIN vec v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(rank_lex AS BIGINT) AS rank_lex,
       CAST(rank_vec AS BIGINT) AS rank_vec,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
FROM fused QUALIFY fused_rank <= 5
"""


CORE_QUERIES["hybrid_search_multi"] = (q_hybrid_search_multi, SQL_HYBRID_SEARCH_MULTI)


def q_semantic_dedup_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup with the DISTRIBUTED centroid fit
    (operators/similarity.py kmeans_distributed: k-means||-style
    hash-derived seeding + integer-exact distributed Lloyd rounds —
    VERDICT r5 item 2): the whole corpus fits the quantizer instead of
    a 2000-row driver sample, so n_centroids="auto" keeps scaling k
    with corpus size past the sample cap (k <= sample_size/2) that
    bounded the sample fit at ~256k vectors.  Same planted corpus and
    same exact oracle as semantic_dedup; nprobe=2 closes the
    cell-boundary miss class, so this row is exact at every SF.
    Determinism under any partitioning is pinned in
    tests/test_extensions.py (integer sums, no float accumulation)."""
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + 0.02 * F.sin(F.col("vec_id") * 31 + i),
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    # 3 Lloyd rounds / 2 seed rounds: the fit is JOB-count-bound at demo
    # SF (each round is one small Spark job); cluster quality for the
    # planted corpus saturates well before the 5/3 defaults.
    return semantic_dedup(
        corpus,
        threshold=0.9,
        centroid_fit="distributed",
        nprobe=2,
        centroid_fit_opts={"iters": 3, "seed_rounds": 2},
    ).select(F.col("id").alias("vec_id"), "component", "is_survivor")


CORE_QUERIES["semantic_dedup_distributed"] = (
    q_semantic_dedup_distributed,
    SQL_SEMANTIC_DEDUP,
)


def q_semantic_dedup_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup with the TWO-LEVEL hierarchical centroid fit
    (operators/similarity.py kmeans_hierarchical): a coarse
    kmeans_distributed fit places ceil(sqrt(k)) cells, then every cell
    refits its own sub-centroids executor-side inside applyInPandas —
    the large-k path that removes kmeans_distributed's remaining
    driver-side bound (the O(k * candidates * d) weighted seeding
    reduction).  The driver touches only the final k x d matrix, so k
    is bounded by the broadcast centroid matrix alone (millions of
    cells).  Same planted corpus and same exact oracle as
    semantic_dedup; nprobe=2 closes the cell-boundary miss class, so
    this row is exact at every SF.  Bit-identity of the fit under any
    partitioning is pinned in tests/test_extensions.py (exact
    fixed-point cell membership + per-cell pure-function refit)."""
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + 0.02 * F.sin(F.col("vec_id") * 31 + i),
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    # 2 coarse seed rounds / 2 coarse Lloyd rounds: the coarse fit only
    # places sqrt(k) cells; per-cell refits do the real quantizer work.
    return semantic_dedup(
        corpus,
        threshold=0.9,
        centroid_fit="hierarchical",
        nprobe=2,
        centroid_fit_opts={"coarse_opts": {"iters": 2, "seed_rounds": 2}},
    ).select(F.col("id").alias("vec_id"), "component", "is_survivor")


CORE_QUERIES["semantic_dedup_hierarchical"] = (
    q_semantic_dedup_hierarchical,
    SQL_SEMANTIC_DEDUP,
)


def q_incremental_ann_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE across ingest days (VERDICT r5 item 3 —
    the vector sibling of incremental_index_update): day 0 builds the
    persisted index from the standing corpus (3/4 of the embeddings),
    the day's arrivals (the remaining 1/4) are APPENDED with
    append_ivf_index — assigned to the STORED centroids in one Arrow
    pass over the batch only, landing as per-bucket file appends; the
    standing corpus rows are never re-read or re-assigned and the
    quantizer tables are untouched.  The post-append probe then serves
    the FULL corpus.

    Restated as the per-query recall summary (5 found, 0 outside the
    full-corpus exact top-20) so it SHARES ann_topk_ivf's oracle.
    Probe bit-identity across compact_ivf_index, bucket-spec
    preservation across append, and the ivf_cell_cohesion drift audit
    are pinned in tests/test_extensions.py."""
    from .operators.similarity import (
        append_ivf_index,
        cosine_topk_ivf_indexed,
        read_ivf_index,
        write_ivf_index,
    )

    from .phases import phase

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    standing = emb.filter(F.col("vec_id") % 4 != 3)
    arrivals = emb.filter(F.col("vec_id") % 4 == 3)
    name = f"q_ivf_incr_{sf_tag(sf_dir)}"
    with phase("build"):
        write_ivf_index(standing, name, n_centroids=16, num_buckets=8)
        append_ivf_index(arrivals, name)
        idx = read_ivf_index(spark, name)
    ivf = cosine_topk_ivf_indexed(idx, queries, k=5, nprobe=8)
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(ivf, exact20)


CORE_QUERIES["incremental_ann_index_update"] = (
    q_incremental_ann_index_update,
    SQL_ANN_SUMMARY,
)


def q_ivf_cohesion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health invariants over the persisted IVF index, restated
    as violation rows (empty when correct — the simhash_near_dup
    pattern): after a fresh build over the embeddings corpus, (a) cell
    populations must sum to exactly the corpus size (no row lost or
    duplicated by assignment/append), and (b) every cell's mean
    member-to-centroid cosine (operators/similarity.py
    ivf_cell_cohesion — the centroid-drift audit) must lie in (-1, 1].
    One scan of the cells table; the raw corpus is touched only for
    the size check."""
    from .operators.similarity import ivf_cell_cohesion, write_ivf_index
    from .phases import phase

    emb = _t(spark, sf_dir, "embeddings")
    name = f"q_ivf_audit_{sf_tag(sf_dir)}"
    with phase("build"):
        write_ivf_index(emb, name, n_centroids=16, num_buckets=8)
    coh = ivf_cell_cohesion(spark, name)
    n_total = emb.count()
    bad_mass = (
        coh.agg(F.sum("n_members").alias("tot"))
        .filter(F.col("tot") != n_total)
        .select(
            F.lit(-1).cast("long").alias("cell"),
            F.lit("lost_rows").alias("problem"),
        )
    )
    bad_cos = coh.filter(
        (F.col("mean_cos") <= -1.0) | (F.col("mean_cos") > 1.0)
        | F.col("mean_cos").isNull()
    ).select(
        F.col("cell").cast("long").alias("cell"),
        F.lit("cohesion_out_of_range").alias("problem"),
    )
    return bad_mass.unionByName(bad_cos)


SQL_IVF_COHESION_AUDIT = """
SELECT CAST(NULL AS BIGINT) AS cell, CAST(NULL AS VARCHAR) AS problem
WHERE FALSE
"""

CORE_QUERIES["ivf_cohesion_audit"] = (
    q_ivf_cohesion_audit,
    SQL_IVF_COHESION_AUDIT,
)


# --- training-prep extension queries (leakage-safe split, Gopher rules,
# BPE pairs, duplicated passages, unigram-LM perplexity, int8 quant) ---------

from .trainprep_queries import build_trainprep_queries  # noqa: E402

CORE_QUERIES.update(
    build_trainprep_queries(
        SQL_DEDUP_CLUSTERS,
        SQL_DOC_JACCARD_PAIRS,
        SQL_INCREMENTAL_CORPUS_DEDUP,
    )
)


# --- canonical registry order ----------------------------------------------
#
# The external driver's correctness gate checks the FIRST 50 registered
# queries, so registration order decides which operators get the strong
# (driver-run, oracle-hashed) check vs the local-pytest-only check.
#
# r11 rotation (VERDICT r10 items 1+5): the two r10 hash-mismatch
# queries stay in the window so the driver re-gates their r11
# engine-agnostic pinning (item 1 — the round's only gate blocker);
# the other 48 slots rotate to never-gated names (86 remained after
# r10: 84 + the two r10 additions). 40 are taken in registry order;
# 6 swap ahead of simpler aggregate queries because their multi-
# operator paths (streaming gates, classifier scoring, curve layout,
# weighted graph routing) carry more cross-engine divergence risk
# than single-shuffle rollups; the final 2 are the r10 additions the
# r10 verdict (item 8) requires gated. Rotated-out and still-deferred
# queries (38 remain never-gated) keep full oracle coverage via
# correctness_full.py / tests/test_oracle_parity.py, the committed
# full-registry sweeps, and the fresh-process vanilla driver-sim.

DRIVER_WINDOW: list[str] = [
    # r10-verdict item 1: the two driver-env hash mismatches, re-gated
    # after the r11 arithmetic pinning
    "token_budget_fill", "embedding_quantization",
    # never-gated backlog, registry order
    "doc_rare_token_stats", "vocab_topk", "media_frame_sample",
    "table_profile", "shipping_priority", "returned_item_revenue",
    "late_ship_priority", "running_revenue", "rolling_event_value",
    "scd2_snapshot", "incremental_pricing", "skew_salted_segments",
    "value_outliers", "zorder_layout", "session_error_overlap",
    "priority_grouping_sets", "value_histogram", "segment_event_chisq",
    "cheapest_supplier_per_part", "embedding_norms",
    "top3_parts_per_supplier", "order_value_quartiles",
    "orders_change_feed", "funnel_stages", "weighted_doc_sample",
    "referential_integrity", "daily_value_gapfill",
    "sliding_active_users", "cumulative_unique_users",
    "event_transitions", "shard_balance", "dq_expectations",
    "orders_quarantine", "above_avg_idle_customers", "basket_rules",
    "streaming_dq_gate", "sketch_rollup_users", "k_anonymity_audit",
    "part_pareto_front", "benford_audit",
    # higher-divergence-risk multi-operator paths, pulled forward
    "streaming_quality_gate", "streaming_holt_by_type",
    "quality_classifier_gd_score", "hybrid_search_multi",
    "layout_curve_compare", "part_affinity_route",
    # r10 additions (verdict item 8: must be driver-gated)
    "mmr_diverse_rerank", "coreset_kcenter",
]
# NOTE: the actual reorder (window first, tail after) runs at the END
# of this module, after every registration — see _apply_driver_window().


def _apply_driver_window() -> None:
    """Reorder CORE_QUERIES so DRIVER_WINDOW is the first 50 entries
    (the external driver's gate records exactly the first 50 in
    registration order). Called once at the very end of this module so
    window members may be registered anywhere above."""
    _missing = [n for n in DRIVER_WINDOW if n not in CORE_QUERIES]
    assert not _missing, f"DRIVER_WINDOW names not registered: {_missing}"
    assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)) == 50
    _tail = [n for n in CORE_QUERIES if n not in set(DRIVER_WINDOW)]
    _snapshot = dict(CORE_QUERIES)
    CORE_QUERIES.clear()
    CORE_QUERIES.update({n: _snapshot[n] for n in (*DRIVER_WINDOW, *_tail)})


def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, COMPRESSED-DOMAIN path (operators/similarity
    pq_topk — Jégou et al. 2011 product quantization): per-subspace
    codebooks quantize each vector to m=8 small codes (~64x less
    scan-resident state than raw vectors), the ADC scan scores the
    corpus by pure table-gather adds with map-side per-batch top-R,
    and the per-query shortlist is re-ranked by the exact cosine.
    Completes the ANN family: brute force / SRP-LSH / IVF / PQ.

    Restated as the per-query recall summary (5 found, 0 outside the
    full-corpus exact top-20) so it SHARES ann_topk_lsh/ivf's oracle.
    Every selection orders by (score, neighbor_id) — a total order —
    so the result is identical under any batch/partition split
    (pinned in tests/test_extensions.py along with recall vs exact).

    Fit amortization (r7 verdict item 1): the ad-hoc form uses the
    FAISS-standard sample fit — whole-corpus distributed training is
    an INDEX-BUILD cost (write_ivfpq_index's default, amortized over
    every probe), not something a 100 TB deployment pays per query.
    pq_topk also accepts ``codebooks=`` to reuse any precomputed fit.

    m=16 subspaces (r8): subspace COUNT, not centroid count, is the
    ADC resolution knob — on the 20k-row structure-free noise corpus
    m=16/ksub=16 measures recall@5 0.92 vs 0.54 at m=8/ksub=16 while
    ksub=256 at m=8 only reaches 0.90 at 2x the latency
    (ANN_RECALL_r8.json); codes are 16 bytes/vector (32x compression
    of the raw 64-dim doubles)."""
    from .operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = pq_topk(emb, queries, k=5, m=16)
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(approx, exact20)


CORE_QUERIES["ann_topk_pq"] = (q_ann_topk_pq, SQL_ANN_SUMMARY)


def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL FAISS IVFPQ construction (operators/similarity
    cosine_topk_ivfpq — Jégou et al. 2011): coarse cells prune
    candidates to ~nprobe/n_centroids of the corpus BEFORE scoring,
    residual product-quantization scores the survivors from m-byte
    codes via per-(query, cell) ADC tables, exact cosine re-ranks the
    shortlist — the composition of ann_topk_ivf's pruning with
    ann_topk_pq's compressed-domain scan, and the construction that
    serves billion-vector corpora in practice.

    Restated as the per-query recall summary (5 found, 0 outside the
    full-corpus exact top-20), sharing the ANN family's oracle.
    Split-invariance and recall vs brute force are pinned in
    tests/test_extensions.py.

    Fit amortization (r7 verdict item 1): ad-hoc probes use the
    FAISS-standard sample fit; the whole-corpus distributed trainer
    remains the default where it belongs — write_ivfpq_index, whose
    one-time cost every subsequent probe amortizes
    (ann_topk_ivfpq_indexed exercises that path).  cosine_topk_ivfpq
    also accepts ``quantizers=(centroids, books)`` to reuse any
    precomputed pair.

    m=16/ksub=64 residual books + nprobe=10 (r8): measured recall@5
    on 20k-row structure-free noise 0.92 (vs 0.50 at the old
    m=8/ksub=16/nprobe=6) with every returned neighbor inside the
    exact top-8 on all four measured corpora — curve in
    ANN_RECALL_r8.json."""
    from .operators.similarity import cosine_topk_ivfpq

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = cosine_topk_ivfpq(
        emb, queries, k=5, n_centroids=16, nprobe=10, m=16, ksub=64
    )
    exact20 = cosine_topk_bruteforce(emb, queries, k=20)
    return _topk_vs_exact_summary(approx, exact20)


CORE_QUERIES["ann_topk_ivfpq"] = (q_ann_topk_ivfpq, SQL_ANN_SUMMARY)


def q_ann_topk_ivfpq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ index LIFECYCLE (operators/similarity write_ivfpq_index /
    append_ivfpq_index / cosine_topk_ivfpq_indexed): day 0 builds the
    persisted compressed index from the standing corpus (3/4 of the
    embeddings — m-byte residual codes bucketed by coarse cell, raw
    vectors deliberately NOT stored), the day's arrivals are APPENDED
    under the STORED quantizers (one Arrow pass over the batch only,
    per-bucket file appends, quantizer tables untouched), and the
    post-append probe ADC-scans the probed cells' code buckets before
    exact-cosine refinement against the raw table.  The compressed
    sibling of incremental_ann_index_update.

    Restated as the per-query recall summary, sharing the ANN family
    oracle.  Probe bit-identity to the in-memory form, bit-identity
    across compact_ivfpq_index, and append coverage are pinned in
    tests/test_extensions.py."""
    from .operators.similarity import (
        append_ivfpq_index,
        cosine_topk_ivfpq_indexed,
        write_ivfpq_index,
    )
    from .phases import phase

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    standing = emb.filter(F.col("vec_id") % 4 != 3)
    arrivals = emb.filter(F.col("vec_id") % 4 == 3)
    name = f"q_ivfpq_incr_{sf_tag(sf_dir)}"
    with phase("build"):
        # m=16/ksub=64 residual books (r8 measured resolution point —
        # see ann_topk_ivfpq); the fused distributed trainer's corpus
        # passes are independent of m, so the build cost is unchanged
        write_ivfpq_index(standing, name, n_centroids=16, m=16, ksub=64)
        append_ivfpq_index(arrivals, name)
    with phase("probe"):
        approx = cosine_topk_ivfpq_indexed(name, emb, queries, k=5, nprobe=10)
        exact20 = cosine_topk_bruteforce(emb, queries, k=20)
        return _topk_vs_exact_summary(approx, exact20)


CORE_QUERIES["ann_topk_ivfpq_indexed"] = (q_ann_topk_ivfpq_indexed, SQL_ANN_SUMMARY)


def q_mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity selection: MMR-rerank (operators/similarity.py
    mmr_rerank — Carbonell & Goldstein 1998) the exact-cosine top-50
    shortlist for query vector 0 down to 10 picks with lambda = 0.70 —
    the redundancy-penalized retrieval RAG context assembly and
    diverse-batch curation run after ANN, completing the retrieval
    family (brute force / LSH / IVF / PQ / RRF fusion / MMR).

    Exactness: relevance and pairwise sims are sequential-fold doubles
    (bitwise list_dot_product parity); lambda enters as 70.0/100.0 and
    the penalty weight as 1.0 - (70.0/100.0) IN BOTH ENGINES (the
    latter is NOT the double nearest 0.3 — replaying the expression,
    not the decimal, is what keeps every greedy comparison identical);
    the oracle unrolls the 10 greedy steps like part_pagerank's rounds.
    Output is BIGINT-only: (mmr_rank, vec_id, rel_e9)."""
    from .operators.similarity import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb.filter(F.col("vec_id") != 0),
        emb.filter(F.col("vec_id") == 0),
        k=10,
        lam_pct=70,
        shortlist=50,
    )


def _mmr_oracle_sql(k: int = 10, shortlist: int = 50, lam: str = "70.0 / 100.0") -> str:
    """Unrolled-greedy MMR oracle (one CTE pair per pick, the
    part_pagerank unrolling pattern): pick_i = argmax over unselected
    shortlist members of lam*rel - (1-lam)*max(sim to selected),
    ties to the lower vec_id."""
    head = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qe,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
  FROM embeddings WHERE vec_id = 0
), sc AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         list_dot_product(embedding::DOUBLE[], qe)
           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * qn)
           AS rel
  FROM embeddings, q WHERE vec_id <> 0
), cand AS MATERIALIZED (
  -- MATERIALIZED: referenced once per unrolled pick; inlined, DuckDB
  -- re-opens the parquet per reference and exhausts file handles
  SELECT vec_id, e, nrm, rel FROM sc ORDER BY rel DESC, vec_id LIMIT {shortlist}
), sims AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
p1 AS MATERIALIZED (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM p1)"""
    # every p_i / sel_i is MATERIALIZED: sel_i references sel_{i-1}
    # twice, so inlined expansion is 2^k plan copies (measured: the
    # 10-step inlined form never finishes and exhausts file handles
    # re-opening the scan at the leaves; materialized it's millisecond)
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
p{i} AS MATERIALIZED (
  SELECT c.vec_id, c.rel FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  ORDER BY ({lam}) * c.rel - (1.0 - ({lam})) * (
      SELECT max(sim) FROM sims
      WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM sel{i - 1})
    ) DESC, c.vec_id
  LIMIT 1
),
sel{i} AS MATERIALIZED (
  SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM p{i})""")
    picks = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS mmr_rank, CAST(vec_id AS BIGINT) AS vec_id,"
        f" CAST(floor(rel * 1000000000.0) AS BIGINT) AS rel_e9 FROM p{i}"
        for i in range(1, k + 1)
    )
    return head + "".join(steps) + "\n" + picks


SQL_MMR_DIVERSE_RERANK = _mmr_oracle_sql()

CORE_QUERIES["mmr_diverse_rerank"] = (q_mmr_diverse_rerank, SQL_MMR_DIVERSE_RERANK)


def q_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity/coverage selection over the WHOLE corpus: greedy
    k-center (operators/similarity.py kcenter_select — Gonzalez 1985)
    picks 8 embeddings, each the farthest-in-cosine from everything
    picked before — eval-set construction and labeling-budget
    allocation, the corpus-sized complement of mmr_diverse_rerank's
    shortlist greedy (there the state is 50 rows on the driver; here
    it is a distributed best-cos column updated by one narrow map per
    round, O(1) rows to the driver per pick).

    Exactness: sequential-fold cosines, and the oracle replays the
    incremental greatest() fold verbatim (not a from-scratch max over
    centers — same values either way, but the replay keeps every
    comparison bitwise-identical by construction). Output BIGINT-only:
    (pick_round, vec_id, maxcos_e9); round 1 carries the -2.0 init
    sentinel (-2000000000)."""
    from .operators.similarity import kcenter_select

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_select(emb, k=8)


def _kcenter_oracle_sql(k: int = 8) -> str:
    """Unrolled greedy k-center oracle: pick_i = argmin over unselected
    of the running max-cos state st_{i-1}; st_i folds the new center in
    with the same greatest() the operator uses. All step CTEs are
    MATERIALIZED (see _mmr_oracle_sql: inlined recursive references
    explode exponentially)."""
    head = """
WITH base AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
pick1 AS MATERIALIZED (
  SELECT vec_id, -2.0::DOUBLE AS bc FROM base ORDER BY vec_id LIMIT 1
),
sel1 AS MATERIALIZED (SELECT vec_id FROM pick1),
st1 AS MATERIALIZED (
  SELECT p.vec_id, p.e, p.nrm,
         greatest(-2.0::DOUBLE,
                  list_dot_product(p.e, c.e) / (p.nrm * c.nrm)) AS bc
  FROM base p,
       (SELECT e, nrm FROM base
        WHERE vec_id = (SELECT vec_id FROM pick1)) c
)"""
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
pick{i} AS MATERIALIZED (
  SELECT vec_id, bc FROM st{i - 1}
  WHERE vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  ORDER BY bc, vec_id LIMIT 1
),
sel{i} AS MATERIALIZED (
  SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM pick{i}
)""")
        if i < k:  # the last state table feeds no further pick
            steps.append(f""",
st{i} AS MATERIALIZED (
  SELECT p.vec_id, p.e, p.nrm,
         greatest(p.bc, list_dot_product(p.e, c.e) / (p.nrm * c.nrm)) AS bc
  FROM st{i - 1} p,
       (SELECT e, nrm FROM base
        WHERE vec_id = (SELECT vec_id FROM pick{i})) c
)""")
    picks = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS pick_round,"
        f" CAST(vec_id AS BIGINT) AS vec_id,"
        f" CAST(floor(bc * 1000000000.0) AS BIGINT) AS maxcos_e9 FROM pick{i}"
        for i in range(1, k + 1)
    )
    return head + "".join(steps) + "\n" + picks


SQL_CORESET_KCENTER = _kcenter_oracle_sql()

CORE_QUERIES["coreset_kcenter"] = (q_coreset_kcenter, SQL_CORESET_KCENTER)


_apply_driver_window()
