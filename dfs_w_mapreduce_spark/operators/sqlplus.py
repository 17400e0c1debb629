"""Modern SQL-surface operators: correlated LATERAL joins and native
recursive CTEs.

These close the last SQL shapes the engine's declarative surface did
not yet exercise.  The reference cannot express either (its compute
is a fixed MapReduce chain, reference dfs/client/client.go:806-827);
SURVEY.md §2.5 requires the engine to supply the relational breadth
the reference lacks.  `hierarchy_closure` (operators/analytics.py)
already solves reachability by pointer jumping — the scale-path
O(log n)-round formulation; `recursive_cte` is the same family
through Spark 4's native WITH RECURSIVE, whose frontier-at-a-time
iteration is the textbook formulation (and the one DuckDB shares, so
the oracle is literally the same query text).

Both queries run the IDENTICAL SQL string on Spark and DuckDB — the
strongest cross-engine parity statement the registry can make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dfs_w_mapreduce_spark.catalog import register_views
from dfs_w_mapreduce_spark.registry import QuerySpec

# Per-nation top-2 customers by balance via a correlated LATERAL
# subquery (ORDER BY ... LIMIT inside the lateral body). Decorrelation
# turns this into a ranked window — same plan family as window_topk —
# but the *surface* is the SQL-standard lateral form.
LATERAL_TOPK_SQL = """
    SELECT n_name, t.c_custkey, t.c_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
"""

# Binary-tree walk over custkeys (children 2k, 2k+1) from root 1:
# bounded-depth recursion with a per-depth rollup. Termination is
# structural (depth < 8) — no data-dependent cycle risk.
_RECURSIVE_CTE_TEMPLATE = """
    WITH RECURSIVE walk(c_custkey, depth) AS (
        SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 1
        UNION ALL
        SELECT c.c_custkey, w2.depth + 1
        FROM (SELECT {unnest}({arr}) AS child, depth
              FROM walk WHERE depth < 8) w2
        JOIN customer c ON c.c_custkey = w2.child
    )
    SELECT depth, count(*) AS n_nodes,
           min(c_custkey) AS min_key, max(c_custkey) AS max_key
    FROM walk GROUP BY depth
"""

RECURSIVE_CTE_SPARK = _RECURSIVE_CTE_TEMPLATE.format(
    unnest="explode", arr="array(c_custkey*2, c_custkey*2+1)"
)
RECURSIVE_CTE_DUCK = _RECURSIVE_CTE_TEMPLATE.format(
    unnest="unnest", arr="[c_custkey*2, c_custkey*2+1]"
)


# Bag-semantics set operations: INTERSECT ALL / EXCEPT ALL preserve
# multiplicity (min / truncated difference of per-value counts) — the
# set-op surface DISTINCT-based set_ops cannot express.
SET_OPS_ALL_SQL = """
    SELECT 'intersect_all' AS op, k, count(*) AS n FROM (
        SELECT o_custkey % 100 AS k FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey % 100 FROM orders WHERE o_orderstatus = 'F') t
    GROUP BY 1, 2
    UNION ALL
    SELECT 'except_all', k, count(*) FROM (
        SELECT o_custkey % 100 AS k FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey % 100 FROM orders WHERE o_orderstatus = 'F') t
    GROUP BY 1, 2
"""

# Null-safe equality join: NULL keys MATCH each other under
# IS NOT DISTINCT FROM (an equi-join Spark plans as a hash join on the
# null-safe comparator, not a cartesian).
JOIN_NULL_SAFE_SQL = """
    WITH a AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderkey % 100 END AS k,
                      count(*) AS n FROM orders GROUP BY 1),
         b AS (SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                           ELSE o_orderkey % 100 END AS k,
                      count(*) AS n FROM orders GROUP BY 1)
    SELECT a.k AS k, a.n AS n_a, b.n AS n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""

# SQL-standard FILTER clause: per-aggregate predicates in one pass
# (one scan + one hash aggregate instead of N filtered subqueries).
AGG_FILTER_SQL = """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                      FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE) AS rev_f
    FROM orders GROUP BY 1
"""


def _shared_sql(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


q_set_ops_all = _shared_sql(SET_OPS_ALL_SQL)
q_join_null_safe = _shared_sql(JOIN_NULL_SAFE_SQL)
q_agg_filter = _shared_sql(AGG_FILTER_SQL)


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL (ORDER BY/LIMIT) — identical SQL text runs
    as the DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPK_SQL)


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE bounded-depth tree walk; the oracle
    differs only in the array-unnest spelling."""
    register_views(spark, sf_dir)
    return spark.sql(RECURSIVE_CTE_SPARK)


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(
            "lateral_topk", q_lateral_topk, LATERAL_TOPK_SQL,
            ("relational", "sql", "lateral"),
            "Correlated LATERAL top-2 per nation (same SQL both engines).",
        ),
        QuerySpec(
            "recursive_cte", q_recursive_cte, RECURSIVE_CTE_DUCK,
            ("relational", "sql", "recursive"),
            "Native WITH RECURSIVE bounded tree walk + per-depth rollup.",
        ),
        QuerySpec(
            "set_ops_all", q_set_ops_all, SET_OPS_ALL_SQL,
            ("relational", "sql", "setops"),
            "INTERSECT ALL / EXCEPT ALL bag semantics (same SQL both engines).",
        ),
        QuerySpec(
            "join_null_safe", q_join_null_safe, JOIN_NULL_SAFE_SQL,
            ("relational", "sql", "join"),
            "IS NOT DISTINCT FROM equi-join with matching NULL keys.",
        ),
        QuerySpec(
            "agg_filter", q_agg_filter, AGG_FILTER_SQL,
            ("relational", "sql", "agg"),
            "FILTER-clause aggregates: per-aggregate predicates in one pass.",
        ),
    ]
