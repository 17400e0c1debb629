"""Standard relational operator surface.

The reference implements none of this (SURVEY.md §2.5 — single-input
MapReduce jobs only); our engine exposes the full built-in Spark
relational surface, one oracle-verified query per operator family.
Every query is declarative DataFrame/SQL so Catalyst supplies
predicate pushdown, column pruning, partial aggregation, join
selection, and whole-stage codegen.

Scale posture (100 TB):
- Dimension joins: nation/region are hard-broadcast (bounded tiny);
  customer/supplier/part go through `catalog.gated_broadcast`, which
  hints only while the dim's file is under a size cap — at 100 TB
  those dims are tens of GB and the hint would OOM, so the site
  degrades to letting Catalyst/AQE choose the strategy.
- Fact-fact joins (orders x lineitem) shuffle on the join key; AQE
  (enabled in the session factory) coalesces post-shuffle partitions
  and splits skewed ones.
- Double-typed aggregates are rounded in-query (both engines) so
  results are hash-stable across accumulation orders — at 1000
  executors the reduction tree order is nondeterministic.
- Top-k uses orderBy+limit (planned as TakeOrderedAndProject: per
  partition heap + driver merge of k rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import gated_broadcast, load_table, register_views
from dfs_w_mapreduce_spark.registry import QuerySpec


def _r2(c):
    return F.round(c, 2)


def _dsum(c, scale=2):
    """Order-independent money sum: accumulate as DECIMAL(18,4) — exact
    and associative — so rounding to cents cannot diverge with partition
    count or engine accumulation order. Double sums are order-dependent
    in the last bits, and round-to-2 amplifies that to a visible cent
    (round-1 driver hash fails on window_running / tpch_q7). Cast back
    to double so the registry schema stays float-typed on both engines.

    DuckDB twin: CAST(round(sum(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE).
    """
    if isinstance(c, str):
        c = F.col(c)
    return F.round(F.sum(c.cast("decimal(18,4)")), scale).cast("double")


def _dsum_over(c, w, scale=2):
    """Windowed variant of _dsum (running / sliding frames)."""
    if isinstance(c, str):
        c = F.col(c)
    return F.round(F.sum(c.cast("decimal(18,4)")).over(w), scale).cast("double")


def _dsumx(c, scale=2):
    """round(sum(c), scale)::double for an ALREADY-decimal expression.

    _dsum's cast is only cross-engine-safe on *source* columns, whose
    stored doubles are 2-decimal by construction (nearest decimal is the
    intended value on both engines). Casting a *derived* double (a
    product) diverges: Spark rounds the shortest decimal representation
    (BigDecimal.valueOf), DuckDB the binary value — a 1-ulp product like
    x.56785 vs x.5678499... rounds to different cents. Build derived
    money in decimal arithmetic instead (see _dec_revenue) and sum here.
    """
    return F.round(F.sum(c), scale).cast("double")


def _dsumx_over(c, w, scale=2):
    return F.round(F.sum(c).over(w), scale).cast("double")


def _dec_revenue():
    """Exact-decimal l_extendedprice * (1 - l_discount).

    Source columns recover exactly into narrow decimals ((12,2) price,
    (4,2) one-minus-discount); the decimal product (17,4) is then exact
    and associative on both engines. DuckDB twin:
    CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)).
    """
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    )


# ------------------------------------------------------------ aggregates


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-heavy groupBy with 8 aggregates.
    Catalyst plans partial+final HashAggregate; the shipdate filter is
    pushed to the parquet scan (PushedFilters).

    Bench note (r2->r3 regression, adjudicated r4): the money sums run
    in DECIMAL, measured 3.3x the double-sum plan at sf0.1 (0.41s ->
    1.33s isolated min-of-3). Accepted deliberately: double sums
    hash-diverge across engines under reduction-order differences (the
    r02 red-row class), and integer-cents-in-long/double overflows at
    ~1e9-row groups — 128-bit decimal is the only accumulator that is
    both order-exact and 100 TB-safe. The plan itself is unchanged
    (pushed filter, partial+final agg, one exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec_revenue()  # exact decimal(17,4)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsumx(disc_price).alias("sum_disc_price"),
            _dsumx(disc_price * (F.lit(1.0) + F.col("l_tax")).cast("decimal(4,2)")).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


TPCH_Q1_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery per market segment."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        _dsum("c_acctbal").alias("sum_bal"),
    )


AGG_STATS_ORACLE = """
    SELECT c_mktsegment, count(*) AS n,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(stddev_samp(c_acctbal), 4) AS sd_bal,
           round(var_samp(c_acctbal), 4) AS var_bal,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY c_mktsegment
"""


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE with a deterministic tie-break — the categorical
    central-tendency aggregate (Spark's native mode() leaves ties
    unspecified, so the portable form is count + rank, which is also
    how you get the mode's frequency and share out of the same pass).
    Two hash aggregates and a WindowGroupLimit rank; no global sort."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    tot = W.partitionBy("o_orderstatus")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .withColumn("grp_n", F.sum("n").over(tot))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
            F.col("grp_n").alias("grp_n"),
            F.round(F.col("n") / F.col("grp_n"), 4).alias("mode_share"),
        )
    )


AGG_MODE_ORACLE = """
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority) AS rk,
               CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS grp_n
        FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           n AS mode_n, grp_n,
           round(n * 1.0 / grp_n, 4) AS mode_share
    FROM ranked WHERE rk = 1
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
        F.count("*").alias("n_rows"),
    )


AGG_DISTINCT_ORACLE = """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping-null markers."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsum("l_quantity").alias("qty"))
    )


AGG_ROLLUP_ORACLE = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), _dsum("o_totalprice").alias("total")
    )


AGG_CUBE_ORACLE = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_ORACLE = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 10)
    )


HAVING_ORACLE = """
    SELECT o_custkey, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey HAVING count(*) >= 10
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) + median."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
    )


PERCENTILES_ORACLE = """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
    FROM orders GROUP BY o_orderstatus
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct. The sketch estimate itself is
    engine-specific, so the hash-checkable output is the exact count
    plus an in-query bounded-error verdict: |approx-exact|/exact <= 5%
    with the sketch run at 1% rsd (5-sigma headroom). The oracle
    computes the exact counts and asserts TRUE — a green row proves
    the sketch ran AND landed within tolerance, which is the checkable
    contract of an approximate operator."""
    li = load_table(spark, sf_dir, "lineitem")
    # Two separate aggregations joined on the tiny group key: putting
    # countDistinct (Expand over every (flag,partkey) pair) and the HLL
    # sketch in ONE agg makes each expanded partial-agg row carry the
    # multi-KB sketch buffer — OOMs the sort-fallback path at sf0.1.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("_ap"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("_ao"),
    )
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            (F.abs(F.col("_ap") - F.col("exact_parts"))
             <= 0.05 * F.col("exact_parts")).alias("parts_within_tol"),
            (F.abs(F.col("_ao") - F.col("exact_orders"))
             <= 0.05 * F.col("exact_orders")).alias("orders_within_tol"),
        )
    )


APPROX_DISTINCT_ORACLE = """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol
    FROM lineitem GROUP BY l_returnflag
"""


# ----------------------------------------------------------------- joins


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: broadcast dim join + fact-fact
    shuffle join + agg + deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsumx(_dec_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


TPCH_Q3_ORACLE = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: five-way join through the dimension chain with
    every dimension broadcast; only lineitem ever shuffles."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(gated_broadcast(s, sf_dir, "supplier"), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsumx(_dec_revenue()).alias("revenue"))
    )


TPCH_Q5_ORACLE = """
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers with at least one open order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_ORACLE = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_ORACLE = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers without orders (null side
    aggregated with count of non-null keys)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


JOIN_OUTER_ORACLE = """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(coalesce(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2), 0) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
"""


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two smallest dims (region x nation) — the
    only safe cardinality for a cartesian product; anything larger is
    an error at scale, which is why Spark gates it behind crossJoin."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


JOIN_CROSS_ORACLE = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / scalar subqueries via the SQL API."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
          AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


IN_SUBQUERY_ORACLE = """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


# --------------------------------------------------------------- windows


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — the window top-k
    pattern (rank inside partition, filter k). Deterministic tiebreak
    on p_partkey."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", _r2(F.col("p_retailprice")).alias("price"), "rk")
    )


WINDOW_TOPK_ORACLE = """
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, CAST(rk AS INT) AS rk
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rk
          FROM part)
    WHERE rk <= 3
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per supplier ordered by ship date;
    ROWS frame with a unique composite order key for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the sf0.1 fixture
    # (generator collisions), so the value columns are the final
    # tiebreak — without them the running sum at colliding rows is
    # order-dependent and engine-specific.
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber",
                 "l_extendedprice", "l_discount")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        _dsumx_over(_dec_revenue(), w).alias(
            "running_rev"
        ),
    )


WINDOW_RUNNING_ORACLE = """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_discount
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_rev
    FROM lineitem
"""


def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/dense_rank/ntile battery over orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


WINDOW_ANALYTIC_ORACLE = """
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey, 1) OVER w AS prev_order,
           lead(o_orderkey, 1) OVER w AS next_order,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ------------------------------------------------- sorts / limits / sets


def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (orderBy+limit -> TakeOrderedAndProject: per-
    partition heaps, driver merges k rows — no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", _r2(F.col("o_totalprice")).alias("price"))
    )


TOPK_GLOBAL_ORACLE = """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation keys of customers vs
    suppliers, tagged by which set op produced the row."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    union = c.union(s).distinct().withColumn("op", F.lit("union"))
    inter = c.intersect(s).withColumn("op", F.lit("intersect"))
    diff = c.exceptAll(s).distinct().withColumn("op", F.lit("except"))
    return union.unionByName(inter).unionByName(diff)


SET_OPS_ORACLE = """
    SELECT nationkey, 'union' AS op FROM
      (SELECT c_nationkey AS nationkey FROM customer
       UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nationkey, 'intersect' AS op FROM
      (SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT DISTINCT nationkey, 'except' AS op FROM
      (SELECT c_nationkey AS nationkey FROM customer
       EXCEPT ALL SELECT s_nationkey FROM supplier)
"""


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup of a two-column slice)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_ROWS_ORACLE = """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------- scalar fns / projection


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery: string/date/math/conditional — the
    library the reference's jobs hand-roll in Go (split, concat,
    contains, Atoi) plus what they lack."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("uname"),
        F.lower(F.col("p_brand")).alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").contains("a").cast("int").alias("has_a"),
        F.round(F.sqrt(F.abs(F.col("p_retailprice"))), 4).alias("sqrt_price"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.when(F.col("p_size") > 25, "large")
        .when(F.col("p_size") > 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


SCALAR_FUNCS_ORACLE = """
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           CAST(length(p_name) AS INT) AS name_len,
           substring(p_name, 1, 5) AS prefix,
           p_brand || '-' || p_type AS brand_type,
           CAST(contains(p_name, 'a') AS INT) AS has_a,
           round(sqrt(abs(p_retailprice)), 4) AS sqrt_price,
           p_size % 5 AS size_mod,
           CASE WHEN p_size > 25 THEN 'large'
                WHEN p_size > 10 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over order dates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


DATE_FUNCS_ORACLE = """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
    FROM orders
"""


def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + posexplode (UDTF shape): part-name tokens
    with position — the lateral-view surface."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "token")
    )


EXPLODE_ARRAY_ORACLE = """
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos, toks[CAST(i AS INT)] AS token
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part) t,
         LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS i) g
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns per returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_dsum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


PIVOT_ORACLE = """
    SELECT l_returnflag,
           CAST(round(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_open,
           CAST(round(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
"""


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery: nullif/coalesce/null-safe equality.
    Fixtures have no nulls, so nullif manufactures them."""
    c = load_table(spark, sf_dir, "customer")
    neg_bal = F.when(F.col("c_acctbal") < 0, F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(neg_bal, F.lit(0.0)).alias("neg_or_zero"),
        neg_bal.isNull().cast("int").alias("is_nonneg"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
    )


NULL_HANDLING_ORACLE = """
    SELECT c_custkey,
           coalesce(CASE WHEN c_acctbal < 0 THEN c_acctbal END, 0.0) AS neg_or_zero,
           CAST(CASE WHEN c_acctbal < 0 THEN c_acctbal END IS NULL AS INT) AS is_nonneg,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue: the pushdown showcase — three
    range predicates reach the parquet scan, then a single global agg
    (two-stage partial/final, no groupBy shuffle of rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsumx(F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast("decimal(4,2)")).alias("revenue"))
    )


TPCH_Q6_ORACLE = """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-part numeric columns to long form."""
    p = load_table(spark, sf_dir, "part")
    return p.unpivot(
        "p_partkey",
        [F.col("p_size").cast("double").alias("size"),
         F.col("p_retailprice").alias("retailprice")],
        "measure",
        "val",
    ).select("p_partkey", "measure", _r2(F.col("val")).alias("val"))


UNPIVOT_ORACLE = """
    SELECT p_partkey, measure, round(val, 2) AS val
    FROM (
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice', p_retailprice FROM part
    )
"""


N_SALT = 8


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: the kv fixture's 'hot' key holds ~75%
    of rows, so a plain key join puts 75% of the shuffle on one
    reducer. Salt the hot side into 8 sub-keys and explode the small
    side 8x; result is identical to the plain join (same oracle), but
    the hot key's work spreads across 8 tasks. AQE's skew-join does
    this automatically mid-flight; the explicit form is for engines/
    stages where AQE can't see the skew."""
    from dfs_w_mapreduce_spark.sources.readers import kv_pairs

    kv = kv_pairs(spark, sf_dir).withColumn(
        "salt", (F.col("value").cast("long") % N_SALT)
    )
    dim = spark.createDataFrame(
        [("hot", "HOT-KEY"), ("click", "CLICK"), ("view", "VIEW"),
         ("error", "ERROR"), ("purchase", "PURCHASE"), ("signup", "SIGNUP")],
        "key string, label string",
    ).crossJoin(spark.range(N_SALT).select(F.col("id").cast("long").alias("salt")))
    joined = kv.join(F.broadcast(dim), ["key", "salt"])
    return joined.groupBy("key", "label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("long")).alias("total"),
    )


JOIN_SALTED_ORACLE = """
    SELECT key, label, count(*) AS n,
           CAST(sum(CAST(value AS BIGINT)) AS BIGINT) AS total
    FROM (SELECT CASE WHEN event_id % 4 <> 0 THEN 'hot' ELSE event_type END AS key,
                 CAST(event_id % 100 AS VARCHAR) AS value
          FROM events)
    JOIN (VALUES ('hot', 'HOT-KEY'), ('click', 'CLICK'), ('view', 'VIEW'),
                 ('error', 'ERROR'), ('purchase', 'PURCHASE'), ('signup', 'SIGNUP'))
         AS dim(key, label) USING (key)
    GROUP BY key, label
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking: EXISTS-driven count per
    priority (left-semi join, no row multiplication)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    # TPC-H's l_commitdate < l_receiptdate predicate has no fixture
    # columns; use "has any lineitem" as the EXISTS condition.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


TPCH_Q4_ORACLE = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    GROUP BY o_orderpriority
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipmode/priority cross-tab: join + conditional
    aggregation (high/low priority line counts per return flag)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


TPCH_Q12_ORACLE = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promo revenue: broadcast part join + ratio of
    conditional to total aggregate in one pass."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    return (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100 * F.sum(F.when(promo, rev).otherwise(0.0)) / F.sum(rev), 4
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_ORACLE = """
    SELECT round(100 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q_scalar_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar battery 2: regex, trim/pad, translate, array and map
    construction/access — the rest of the function catalog."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract(F.col("p_type"), "([A-Z]+)", 1).alias("first_word"),
        F.trim(F.lpad(F.col("p_brand"), 12, "*")).alias("padded"),
        F.translate(F.col("p_brand"), "Brand#", "brand_").alias("translated"),
        F.array_contains(words, "widget").cast("int").alias("has_widget"),
        F.size(words).alias("n_words"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.slice(words, 1, 2), "_").alias("first_two"),
        F.element_at(
            F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")),
            F.lit("type"),
        ).alias("from_map"),
    )


SCALAR_FUNCS2_ORACLE = """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           trim(lpad(p_brand, 12, '*')) AS padded,
           translate(p_brand, 'Brand#', 'brand_') AS translated,
           CAST(list_contains(string_split(p_name, ' '), 'widget') AS INT) AS has_widget,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           string_split(p_name, ' ')[-1] AS last_word,
           array_to_string(string_split(p_name, ' ')[1:2], '_') AS first_two,
           map(['brand', 'type'], [p_brand, p_type])['type'][1] AS from_map
    FROM part
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: revenue flowing between two
    nation pairs (supplier nation -> customer nation) per year. Two
    independent dimension chains joined to the same fact row — both
    broadcast."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsumx(_dec_revenue()).alias("revenue"))
    )


TPCH_Q7_ORACLE = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY 1, 2, 3
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in a quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsumx(_dec_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


TPCH_Q10_ORACLE = """
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: outer join so
    zero-order customers count, then a distribution over the counts
    (two stacked aggregations)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("5")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


TPCH_Q13_ORACLE = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
        GROUP BY c_custkey
    )
    GROUP BY c_count
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds a threshold (aggregate as semi-join filter), joined back
    for reporting."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _r2(F.col("o_totalprice")).alias("price"),
            _r2(F.col("total_qty")).alias("total_qty"),
        )
    )


TPCH_Q18_ORACLE = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS price,
           round(CAST(total_qty AS DOUBLE), 2) AS total_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
    JOIN orders ON big.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
"""


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery: RANGE frame (peers aggregate together),
    sliding ROWS frame, first/nth value, percent_rank/cume_dist."""
    o = load_table(spark, sf_dir, "orders")
    base = W.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    rng = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 0)
    )
    sliding = base.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count("*").over(rng).alias("n_within_1k_below"),
        _dsum_over("o_totalprice", sliding).alias("sum_last3"),
        F.first("o_orderkey").over(base).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(base).alias("second_key"),
        F.round(F.percent_rank().over(base), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(base), 6).alias("cume"),
    )


WINDOW_FRAMES_ORACLE = """
    SELECT o_orderkey, o_orderstatus,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k_below,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                    PARTITION BY o_orderstatus
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS sum_last3,
           first_value(o_orderkey) OVER w AS first_key,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey)
"""


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / exists /
    forall / aggregate (fold) over token arrays — the expression-level
    loop constructs that keep per-element logic out of Python."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    # word_lens is serialized to CSV: driver canonicalizer can't hash
    # array-valued cells (round-1 CORRECTNESS kv_group_values error).
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(words, lambda w: F.length(w).cast("string")), ","
        ).alias("word_lens"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
        F.exists(words, lambda w: w == F.lit("spark")).cast("int").alias("has_spark"),
        F.forall(words, lambda w: F.length(w) < 20).cast("int").alias("all_short"),
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).alias("total_chars"),
    )


ARRAY_HOF_ORACLE = """
    SELECT doc_id,
           array_to_string(list_transform(string_split(text, ' '), w -> CAST(length(w) AS VARCHAR)), ',') AS word_lens,
           CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS INT) AS n_long,
           CAST(len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0 AS INT) AS has_spark,
           CAST(len(list_filter(string_split(text, ' '), w -> length(w) >= 20)) = 0 AS INT) AS all_short,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS INT) AS total_chars
    FROM documents
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type battery: construction, keys/values, cardinality,
    per-key access — maps as first-class columns (the reference's
    key-value record model as a nested type)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    # keys/vals serialized to CSV for the driver canonicalizer (no
    # array-valued registry cells); the map type itself is exercised
    # by size/element_at below and map tests.
    return n.select(
        "n_nationkey",
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.array_join(F.map_values(m), ",").alias("vals"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "name").alias("name_val"),
    )


MAP_FUNCS_ORACLE = """
    SELECT n_nationkey,
           array_to_string(map_keys(map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])), ',') AS keys,
           array_to_string(map_values(map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])), ',') AS vals,
           CAST(cardinality(map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])) AS INT) AS n_entries,
           map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])['name'][1] AS name_val
    FROM nation
"""


def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates: Pearson correlation + sample covariance
    of quantity vs extended price per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


AGG_CORR_ORACLE = """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
"""


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: sorted distinct set + ordered string
    concatenation of region names per... nation group (small dims)."""
    n = load_table(spark, sf_dir, "nation")
    # collect_set output serialized (driver canonicalizer rejects
    # array cells); nation_csv already covers the ordered-list form.
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), "\u001f").alias("nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nation_csv"),
        F.count("*").alias("n"),
    )


AGG_COLLECT_ORACLE = """
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), chr(31)) AS nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nation_csv,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
"""


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): mergeable across
    partitions, bounded memory — the quantile that scales where exact
    percentile's full sort/collect does not. Accuracy=1000 bounds rank
    error at 0.1%; the hash-checkable output is the exact percentile
    plus an in-query verdict that the sketch value lies between the
    exact quantiles at p +/- 0.5% (5x the guarantee). Oracle computes
    exact quantiles and asserts TRUE."""
    o = load_table(spark, sf_dir, "orders")
    exact = o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
        F.percentile("o_totalprice", 0.495).alias("_lo50"),
        F.percentile("o_totalprice", 0.505).alias("_hi50"),
        F.percentile("o_totalprice", 0.985).alias("_lo99"),
        F.max("o_totalprice").alias("_hi99"),
    )
    approx = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("_ap50"),
        F.percentile_approx("o_totalprice", 0.99, 1000).alias("_ap99"),
    )
    return (
        exact.join(F.broadcast(approx), "o_orderstatus")
        .select(
            "o_orderstatus",
            "p50",
            "p99",
            ((F.col("_ap50") >= F.col("_lo50")) & (F.col("_ap50") <= F.col("_hi50"))).alias("p50_within_tol"),
            ((F.col("_ap99") >= F.col("_lo99")) & (F.col("_ap99") <= F.col("_hi99"))).alias("p99_within_tol"),
        )
    )


APPROX_PERCENTILES_ORACLE = """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           TRUE AS p50_within_tol,
           TRUE AS p99_within_tol
    FROM orders GROUP BY o_orderstatus
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE emulation (no Delta in this build): an updates batch
    (every 10th order gets a 5% price bump, plus synthetic new rows)
    merged into orders via full-outer join + coalesce — upsert
    semantics as pure DataFrame ops. At scale both sides shuffle on
    the merge key once; Delta/Iceberg would additionally skip
    untouched files."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("price")
    )
    # Update bump is an exact addition, not a multiplication: Spark
    # (HALF_UP) and DuckDB disagree on rounding computed doubles that
    # land on decimal half-way points (found at sf0.1: .145 -> .14 vs
    # .15), and addition introduces no new round-off.
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") + 100.0).alias("price"),
    ).unionByName(
        o.agg(F.max("o_orderkey").alias("mx")).select(
            (F.col("mx") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(0.0).alias("price"),
        )
    )
    u, t = updates.alias("u"), o.alias("t")
    merged = t.join(u, F.col("t.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("u.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("u.o_orderstatus"), F.col("t.o_orderstatus")).alias("o_orderstatus"),
        F.round(F.coalesce(F.col("u.price"), F.col("t.price")), 2).alias("price"),
    )


MERGE_UPSERT_ORACLE = """
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice AS price FROM orders),
    u AS (
        SELECT o_orderkey, 'U' AS o_orderstatus, price + 100.0 AS price
        FROM t WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT max(o_orderkey) + 1, 'N', 0.0 FROM t
    )
    SELECT coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           coalesce(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           round(coalesce(u.price, t.price), 2) AS price
    FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
"""


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension build via gaps-and-islands: treat each
    customer's order stream as a change feed of `o_orderpriority`,
    collapse consecutive equal values into one validity interval
    (change-point flag -> running island id -> per-island min/lead),
    mark the open interval current. Window order key includes
    o_orderkey because order dates duplicate within a customer.
    One shuffle on o_custkey feeds both windows and the final group."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = o.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey").withColumn(
        "chg",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.col("o_orderpriority") != F.lag("o_orderpriority").over(w)),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    g = islands.groupBy("o_custkey", "island", "o_orderpriority").agg(
        F.min("o_orderdate").alias("eff_from"),
        F.count("*").alias("n_orders"),
    )
    w2 = W.partitionBy("o_custkey").orderBy("island")
    return g.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        "eff_from",
        F.lead("eff_from").over(w2).alias("eff_to"),
        "n_orders",
        F.lead("eff_from").over(w2).isNull().alias("is_current"),
    )


SCD2_ASOF_T = "1999-06-15 00:00:00"


def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) lookup over the SCD2 dimension: which
    priority was valid for each customer at a fixed probe instant —
    the time-travel read every slowly-changing dimension exists to
    answer. Interval membership is eff_from <= T < eff_to (open
    current intervals match any later T); exactly one interval per
    key can match by construction, which the oracle re-derives
    independently."""
    dim = q_scd2_build(spark, sf_dir)
    t = F.lit(SCD2_ASOF_T).cast("timestamp")
    return dim.filter(
        (F.col("eff_from") <= t)
        & (F.col("eff_to").isNull() | (t < F.col("eff_to")))
    ).select("custkey", "priority", "eff_from", "is_current")


def _scd2_asof_oracle() -> str:
    return f"""
        WITH dim AS ({SCD2_ORACLE}),
        probe AS (SELECT TIMESTAMP '{SCD2_ASOF_T}' AS t)
        SELECT custkey, priority, eff_from, is_current
        FROM dim CROSS JOIN probe
        WHERE eff_from <= t AND (eff_to IS NULL OR t < eff_to)
    """


SCD2_ORACLE = """
    WITH marked AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               CASE WHEN lag(o_orderpriority) OVER w IS NULL
                      OR o_orderpriority <> lag(o_orderpriority) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    islands AS (
        SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    g AS (
        SELECT o_custkey, island, o_orderpriority,
               min(o_orderdate) AS eff_from, count(*) AS n_orders
        FROM islands GROUP BY 1, 2, 3
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority, eff_from,
           lead(eff_from) OVER w2 AS eff_to,
           n_orders,
           lead(eff_from) OVER w2 IS NULL AS is_current
    FROM g
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY island)
"""


# 2024-01-16T00:00:00Z in epoch microseconds — both engines compare
# raw integers, so NTZ/LTZ session-zone differences cannot bite.
CDC_CUTOFF_US = 1_705_363_200 * 1_000_000


def q_cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: compact a
    changelog onto a snapshot in one batch pass. Base state = latest
    event per user before the cutoff; the changelog = events at/after
    it, 'error' meaning DELETE and anything else UPSERT. Each side
    reduces to latest-per-key first (row_number over (ts, event_id) —
    a total order), so the merge join touches one row per key no
    matter how long the log is; the full-outer join + CASE is exactly
    the WHEN MATCHED / NOT MATCHED / MATCHED-AND-DELETE ladder of SQL
    MERGE. At 100 TB both reductions are partial-aggregable shuffles
    on user_id and the join is co-partitioned on the same key — one
    exchange each side, reused by the join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    base = (
        ev.filter(F.col("us") < CDC_CUTOFF_US)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("value").alias("base_value"),
            F.col("us").alias("base_us"),
        )
    )
    ch = (
        ev.filter(F.col("us") >= CDC_CUTOFF_US)
        .withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", "op",
            F.col("value").alias("ch_value"),
            F.col("us").alias("ch_us"),
        )
    )
    m = base.join(ch, "user_id", "full_outer")
    return m.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        "user_id",
        F.coalesce("ch_value", "base_value").alias("value"),
        F.coalesce("ch_us", "base_us").alias("last_us"),
        F.when(F.col("op").isNull(), F.lit("kept"))
        .when(F.col("base_us").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )


CDC_MERGE_ORACLE = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
        FROM events
    ),
    base AS (
        SELECT user_id, value AS base_value, us AS base_us FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rk
            FROM ev WHERE us < {CDC_CUTOFF_US}
        ) WHERE rk = 1
    ),
    ch AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value AS ch_value, us AS ch_us FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rk
            FROM ev WHERE us >= {CDC_CUTOFF_US}
        ) WHERE rk = 1
    )
    SELECT user_id,
           coalesce(ch_value, base_value) AS value,
           coalesce(ch_us, base_us) AS last_us,
           CASE WHEN op IS NULL THEN 'kept'
                WHEN base_us IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM base FULL OUTER JOIN ch USING (user_id)
    WHERE op IS NULL OR op <> 'D'
"""


def q_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expression battery: try_cast on unparseable
    strings, try_divide by zero, try_to_timestamp on invalid dates —
    the NULL-not-exception contract a pipeline needs to survive dirty
    data without ANSI-mode job aborts. Oracle uses DuckDB TRY_CAST and
    a CASE guard for the zero denominator."""
    o = load_table(spark, sf_dir, "orders")
    day = (F.col("o_orderkey") % 40).cast("int")  # 00 and 32..39 invalid
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
        F.round(F.try_divide("o_totalprice", F.col("o_custkey") % 3), 4).alias("ratio"),
        F.try_to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad(day.cast("string"), 2, "0"))
        ).alias("maybe_ts"),
    )


SAFE_ARITHMETIC_ORACLE = """
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS INT) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
           round(CASE WHEN o_custkey % 3 = 0 THEN NULL
                      ELSE o_totalprice / (o_custkey % 3) END, 4) AS ratio,
           TRY_CAST('2024-01-' || lpad(CAST(o_orderkey % 40 AS VARCHAR), 2, '0')
                    AS TIMESTAMP) AS maybe_ts
    FROM orders
"""


def specs() -> list[QuerySpec]:
    mk = QuerySpec
    return [
        mk("tpch_q1", q_tpch_q1, TPCH_Q1_ORACLE, ("relational", "agg"),
           "TPC-H Q1 pricing summary. Bench note: r2->r3 +45% is the "
           "decimal(28,8) money-sum accumulator adopted for the r02 hash "
           "fix (isolated min-of-5 at sf0.1: 1.06s vs 0.82s double-sum). "
           "Accepted deliberately — double sums hash-diverge across "
           "engines under reduction order and cents-in-long overflows at "
           "100 TB group sizes for 4-dp products; the plan itself is "
           "unchanged (pushed filter, partial+final agg, one exchange)."),
        mk("agg_stats", q_agg_stats, AGG_STATS_ORACLE, ("relational", "agg"), "min/max/avg/stddev/var battery."),
        mk("agg_mode", q_agg_mode, AGG_MODE_ORACLE, ("relational", "agg"),
           "Per-group MODE with deterministic tie-break + share (count "
           "+ WindowGroupLimit rank)."),
        mk("agg_distinct", q_agg_distinct, AGG_DISTINCT_ORACLE, ("relational", "agg"), "COUNT DISTINCT single+multi column."),
        mk("agg_rollup", q_agg_rollup, AGG_ROLLUP_ORACLE, ("relational", "agg"), "ROLLUP hierarchy totals."),
        mk("agg_cube", q_agg_cube, AGG_CUBE_ORACLE, ("relational", "agg"), "CUBE over two dims."),
        mk("grouping_sets", q_grouping_sets, GROUPING_SETS_ORACLE, ("relational", "agg", "sql"), "GROUPING SETS via SQL API."),
        mk("having", q_having, HAVING_ORACLE, ("relational", "agg"), "Post-agg HAVING filter."),
        mk("percentiles", q_percentiles, PERCENTILES_ORACLE, ("relational", "agg"), "Exact continuous percentiles."),
        mk("approx_distinct", q_approx_distinct, APPROX_DISTINCT_ORACLE, ("relational", "approx"), "HLL++ approx distinct: exact counts + in-query bounded-error verdict."),
        mk("tpch_q3", q_tpch_q3, TPCH_Q3_ORACLE, ("relational", "join", "topk"), "TPC-H Q3: 3-way join + top-10."),
        mk("tpch_q5", q_tpch_q5, TPCH_Q5_ORACLE, ("relational", "join"), "TPC-H Q5-style 6-way broadcast-dim join."),
        mk("join_semi", q_join_semi, JOIN_SEMI_ORACLE, ("relational", "join"), "LEFT SEMI (EXISTS)."),
        mk("join_anti", q_join_anti, JOIN_ANTI_ORACLE, ("relational", "join"), "LEFT ANTI (NOT EXISTS)."),
        mk("join_outer", q_join_outer, JOIN_OUTER_ORACLE, ("relational", "join"), "LEFT OUTER with null-side agg."),
        mk("join_cross", q_join_cross, JOIN_CROSS_ORACLE, ("relational", "join"), "Cartesian product (small dims)."),
        mk("in_subquery", q_in_subquery, IN_SUBQUERY_ORACLE, ("relational", "subquery", "sql"), "IN + scalar subqueries."),
        mk("window_topk", q_window_topk, WINDOW_TOPK_ORACLE, ("relational", "window"), "Per-group top-k via row_number."),
        mk("window_running", q_window_running, WINDOW_RUNNING_ORACLE, ("relational", "window"), "Cumulative sum, ROWS frame."),
        mk("window_analytic", q_window_analytic, WINDOW_ANALYTIC_ORACLE, ("relational", "window"), "lag/lead/rank/dense_rank/ntile."),
        mk("topk_global", q_topk_global, TOPK_GLOBAL_ORACLE, ("relational", "sort"), "Global top-k (TakeOrderedAndProject)."),
        mk("set_ops", q_set_ops, SET_OPS_ORACLE, ("relational", "setop"), "UNION/INTERSECT/EXCEPT tagged."),
        mk("distinct_rows", q_distinct_rows, DISTINCT_ROWS_ORACLE, ("relational", "setop"), "DISTINCT projection."),
        mk("scalar_funcs", q_scalar_funcs, SCALAR_FUNCS_ORACLE, ("relational", "scalar"), "String/math/conditional battery."),
        mk("date_funcs", q_date_funcs, DATE_FUNCS_ORACLE, ("relational", "scalar"), "Date/time battery."),
        mk("explode_array", q_explode_array, EXPLODE_ARRAY_ORACLE, ("relational", "array"), "posexplode / lateral view."),
        mk("pivot", q_pivot, PIVOT_ORACLE, ("relational", "pivot"), "Pivot to columns."),
        mk("null_handling", q_null_handling, NULL_HANDLING_ORACLE, ("relational", "scalar"), "NULL semantics battery."),
        mk("tpch_q6", q_tpch_q6, TPCH_Q6_ORACLE, ("relational", "agg"), "TPC-H Q6 selective-filter revenue (pushdown showcase)."),
        mk("unpivot", q_unpivot, UNPIVOT_ORACLE, ("relational", "pivot"), "Unpivot/melt wide to long."),
        mk("join_salted", q_join_salted, JOIN_SALTED_ORACLE, ("relational", "join", "skew"), "Salted skew join (identical result to plain join)."),
        mk("tpch_q4", q_tpch_q4, TPCH_Q4_ORACLE, ("relational", "join", "agg"), "TPC-H Q4-style EXISTS-driven priority counts."),
        mk("tpch_q12", q_tpch_q12, TPCH_Q12_ORACLE, ("relational", "join", "agg"), "TPC-H Q12-style conditional aggregation."),
        mk("tpch_q14", q_tpch_q14, TPCH_Q14_ORACLE, ("relational", "join", "agg"), "TPC-H Q14 promo revenue ratio."),
        mk("scalar_funcs2", q_scalar_funcs2, SCALAR_FUNCS2_ORACLE, ("relational", "scalar"), "Regex/trim/pad/translate/array/map battery."),
        mk("merge_upsert", q_merge_upsert, MERGE_UPSERT_ORACLE, ("relational", "cdc"), "CDC MERGE emulation via full-outer join + coalesce."),
        mk("scd2_build", q_scd2_build, SCD2_ORACLE, ("relational", "cdc", "window"), "SCD-type-2 intervals via gaps-and-islands."),
        mk("cdc_merge_apply", q_cdc_merge_apply, CDC_MERGE_ORACLE, ("relational", "cdc", "join"),
           "MERGE semantics: changelog compaction + full-outer upsert/delete apply."),
        mk("scd2_asof_lookup", q_scd2_asof_lookup, _scd2_asof_oracle(), ("relational", "cdc", "timetravel"), "Point-in-time AS OF read over the SCD2 dimension."),
        mk("safe_arithmetic", q_safe_arithmetic, SAFE_ARITHMETIC_ORACLE, ("relational", "scalar", "errors"), "try_cast/try_divide/try_to_timestamp dirty-data battery."),
        mk("approx_percentiles", q_approx_percentiles, APPROX_PERCENTILES_ORACLE, ("relational", "approx"), "GK approx percentiles: exact quantiles + in-query bounded-error verdict."),
        mk("agg_corr", q_agg_corr, AGG_CORR_ORACLE, ("relational", "agg"), "Pearson correlation + sample covariance."),
        mk("window_frames", q_window_frames, WINDOW_FRAMES_ORACLE, ("relational", "window"), "RANGE/sliding frames, nth_value, percent_rank, cume_dist."),
        mk("tpch_q7", q_tpch_q7, TPCH_Q7_ORACLE, ("relational", "join"), "TPC-H Q7 nation-pair volume shipping."),
        mk("tpch_q10", q_tpch_q10, TPCH_Q10_ORACLE, ("relational", "join", "topk"), "TPC-H Q10 returned-item top-20 customers."),
        mk("tpch_q13", q_tpch_q13, TPCH_Q13_ORACLE, ("relational", "agg"), "TPC-H Q13 order-count distribution (stacked aggs)."),
        mk("tpch_q18", q_tpch_q18, TPCH_Q18_ORACLE, ("relational", "join", "agg"), "TPC-H Q18 large-volume customers (agg as filter)."),
        mk("array_hof", q_array_hof, ARRAY_HOF_ORACLE, ("relational", "array"), "transform/filter/exists/forall/aggregate higher-order fns."),
        mk("map_funcs", q_map_funcs, MAP_FUNCS_ORACLE, ("relational", "map"), "Map construction/keys/values/access battery."),
        mk("agg_collect", q_agg_collect, AGG_COLLECT_ORACLE, ("relational", "agg"), "collect_set / ordered string_agg collection aggregates."),
    ]
