"""The remaining TPC-H query shapes, adapted to the fixture schema.

Rounds 1-2 covered Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q12/Q13/Q14/Q18.  This module
completes the 22-query sweep with the shapes those queries don't
exercise: correlated per-group minima (Q2), conditional market-share
ratios (Q8), pattern-driven profit rollups (Q9), scalar-subquery
HAVING thresholds (Q11), argmax-equality selection (Q15), distinct
counting with exclusion subqueries (Q16), per-group averages as a
correlated filter (Q17), OR-of-ANDs predicate pushdown (Q19),
semi-join supplier promotion (Q20), double-correlated EXISTS/NOT
EXISTS (Q21), and anti-join with scalar-subquery threshold (Q22).

The fixture schema has no partsupp table and no commit/receipt dates
(TESTDATA.md), so the classic queries are adapted: part-supplier
relationships derive from lineitem's distinct (l_partkey, l_suppkey)
pairs, "supply cost" maps to s_acctbal, and Q21's "late delivery"
maps to l_returnflag = 'R'.  Every adaptation keeps the original
query's *plan shape* — that is what SURVEY.md §2.5 (the reference's
explicit-absence list: joins/aggregates/subqueries the reference
cannot run, reference README.md:9-14) requires the engine to supply.

Cross-engine float discipline (CLAUDE.md): every money sum
accumulates in exact DECIMAL via relational._dsum/_dsumx, and every
derived ratio divides two deterministic doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import gated_broadcast, load_table
from dfs_w_mapreduce_spark.registry import QuerySpec
from dfs_w_mapreduce_spark.operators.relational import (
    _dec_revenue,
    _dsum,
    _dsumx,
)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: for each LARGE part in a size band,
    the supplier with the lowest account balance among suppliers that
    have actually shipped it (distinct (part, supplier) pairs from
    lineitem stand in for partsupp). Per-group argmin via row_number
    over a composite deterministic order."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(gated_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("best_supplier"),
            F.col("s_acctbal").alias("best_acctbal"),
            F.col("n_name").alias("supp_nation"),
        )
    )


TPCH_Q2_ORACLE = """
    SELECT p_partkey, p_brand, s_name AS best_supplier,
           s_acctbal AS best_acctbal, n_name AS supp_nation
    FROM (
        SELECT p_partkey, p_brand, s_name, s_acctbal, n_name,
               row_number() OVER (PARTITION BY p_partkey
                                  ORDER BY s_acctbal, s_suppkey) AS rn
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    )
    WHERE rn = 1
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_2's share of ASIA's PROMO-part
    revenue per order year. Conditional sum over an exact-decimal
    revenue, ratio taken between two deterministic doubles."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _dec_revenue()
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)).cast("double")
    tot = F.sum(vol).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(gated_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(gated_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.coalesce(nat, F.lit(0.0)) / tot, 6).alias("mkt_share"))
    )


TPCH_Q8_ORACLE = """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           round(
             CAST(coalesce(sum(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) END), 0) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    GROUP BY 1
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: revenue from parts whose name matches a
    pattern, rolled up by supplier nation and ship year (no partsupp
    in the fixture, so profit = discounted revenue)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(gated_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(_dsumx(_dec_revenue()).alias("sum_profit"))
    )


TPCH_Q9_ORACLE = """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important parts: per-part revenue exceeding a fraction of
    total revenue — a scalar-subquery HAVING threshold. Sums stay in
    exact decimal; the threshold comparison is between deterministic
    doubles on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec_revenue()).alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").cast("double").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("total_value") * 0.0006)
        .select(
            "l_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
    )


TPCH_Q11_ORACLE = """
    SELECT l_partkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
           > 0.0006 * (
               SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
               FROM lineitem
             )
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: supplier(s) achieving the maximum quarterly
    revenue — argmax by equality against a window max over exact
    decimals (ties surface every maximal supplier, like the spec)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_dec_revenue()).alias("rev_dec"))
    w = Window.partitionBy()
    top = rev.withColumn("max_dec", F.max("rev_dec").over(w)).filter(
        F.col("rev_dec") == F.col("max_dec")
    )
    return (
        top.join(gated_broadcast(s, sf_dir, "supplier"), top.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_dec"), 2).cast("double").alias("total_revenue"),
        )
    )


TPCH_Q15_ORACLE = """
    WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(round(rev_dec, 2) AS DOUBLE) AS total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 part/supplier relationship counts: distinct suppliers per
    (brand, type, size) bucket, excluding one brand, one type, and
    suppliers with negative balances (the fixture's stand-in for the
    spec's complaint filter) via an exclusion subquery."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_ORACLE = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: lineitems below 50% of their
    part's average quantity — a correlated per-group average as a
    filter, then one global sum. The per-part threshold divides a
    deterministic double; the final sum stays decimal-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
         / (2.0 * F.count("*"))).alias("half_avg")
    )
    return (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), F.lit(0)
                ).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


TPCH_Q17_ORACLE = """
    SELECT round(
             CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 0) AS DOUBLE) / 7.0,
             2) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (
        SELECT l_partkey AS t_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / (2.0 * count(*)) AS half_avg
        FROM lineitem GROUP BY l_partkey
    ) t ON l_partkey = t_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < half_avg
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under OR-of-ANDs: three disjunctive
    brand/size/quantity bands — the classic test that a disjunctive
    predicate still prunes at the scan and folds into one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.coalesce(_dsumx(_dec_revenue()), F.lit(0.0)).alias("revenue"))
    )


TPCH_Q19_ORACLE = """
    SELECT CAST(coalesce(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2), 0) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: suppliers who shipped more than
    half the average supplier's 1997 volume of 'small *' parts — a
    scalar-subquery threshold feeding a semi-join back to supplier.
    The threshold derives from one exact decimal sum (deterministic
    double), not a double average (order-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(gated_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_dec"))
    )
    thresh = per_supp.agg(
        (F.sum("qty_dec").cast("double") / (2.0 * F.count("*"))).alias("half_avg_qty")
    )
    return (
        per_supp.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty_dec").cast("double") > F.col("half_avg_qty"))
        .join(gated_broadcast(s, sf_dir, "supplier"), per_supp.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("qty_dec"), 2).cast("double").alias("ship_qty"),
        )
    )


TPCH_Q20_ORACLE = """
    WITH per_supp AS (
        SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(round(qty_dec, 2) AS DOUBLE) AS ship_qty
    FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
    WHERE CAST(qty_dec AS DOUBLE) > (
        SELECT CAST(sum(qty_dec) AS DOUBLE) / (2.0 * count(*)) FROM per_supp
    )
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: in finished multi-
    supplier orders, the single supplier whose lineitem was returned
    (l_returnflag = 'R' stands in for the missing receipt > commit
    dates). The spec's EXISTS (another supplier) AND NOT EXISTS
    (another late supplier) pair is expressed as per-order distinct
    counts — same semantics, one aggregation instead of two
    correlated scans."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("po_orderkey"))
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    late = li.filter(F.col("l_returnflag") == "R")
    return (
        late.join(per_order, late.l_orderkey == F.col("po_orderkey"))
        .join(gated_broadcast(s, sf_dir, "supplier"), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


TPCH_Q21_ORACLE = """
    WITH per_order AS (
        SELECT l_orderkey AS po_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_late_supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1
        HAVING count(DISTINCT l_suppkey) > 1
           AND count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM lineitem
    JOIN per_order ON l_orderkey = po_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_returnflag = 'R'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: well-funded customers (balance
    above the positive average of a nation subset — nationkeys stand
    in for the spec's phone country codes) with no recent urgent
    orders (every fixture customer has *some* order, so the spec's
    "no orders" would be vacuous): scalar-subquery threshold +
    anti-join."""
    nations = [0, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("2000-01-01"))
        )
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0)
    thresh = pos.agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("*"))
        .alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )


TPCH_Q22_ORACLE = """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (0, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
"""


def specs() -> list[QuerySpec]:
    mk = QuerySpec
    t = ("relational", "tpch")
    return [
        mk("tpch_q2", q_tpch_q2, TPCH_Q2_ORACLE, t + ("window",), "Q2 min-cost supplier per part (argmin window)."),
        mk("tpch_q8", q_tpch_q8, TPCH_Q8_ORACLE, t, "Q8 national market share ratio."),
        mk("tpch_q9", q_tpch_q9, TPCH_Q9_ORACLE, t, "Q9 product-type profit rollup."),
        mk("tpch_q11", q_tpch_q11, TPCH_Q11_ORACLE, t + ("subquery",), "Q11 important parts via scalar-subquery HAVING."),
        mk("tpch_q15", q_tpch_q15, TPCH_Q15_ORACLE, t + ("window",), "Q15 top supplier by argmax equality."),
        mk("tpch_q16", q_tpch_q16, TPCH_Q16_ORACLE, t, "Q16 distinct supplier counts with exclusion subquery."),
        mk("tpch_q17", q_tpch_q17, TPCH_Q17_ORACLE, t + ("subquery",), "Q17 small-quantity revenue via correlated average."),
        mk("tpch_q19", q_tpch_q19, TPCH_Q19_ORACLE, t, "Q19 OR-of-ANDs discounted revenue."),
        mk("tpch_q20", q_tpch_q20, TPCH_Q20_ORACLE, t + ("subquery",), "Q20 supplier promotion semi-join."),
        mk("tpch_q21", q_tpch_q21, TPCH_Q21_ORACLE, t, "Q21 waiting-order suppliers (EXISTS/NOT EXISTS as counts)."),
        mk("tpch_q22", q_tpch_q22, TPCH_Q22_ORACLE, t + ("subquery",), "Q22 sales opportunity anti-join."),
    ]
