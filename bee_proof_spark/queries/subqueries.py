"""Subqueries / CTEs (SURVEY.md section 2-B): WITH, derived tables,
IN/EXISTS/NOT IN subqueries (incl. the NULL 3VL trap), scalar subqueries.

These exercise Spark SQL's subquery planning (semi/anti join rewrites,
null-aware anti join, scalar subquery broadcast) - expressed in SQL because
the capability under test IS the SQL surface; the same text runs on DuckDB
wherever possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bee_proof_spark.queries import o_dsum, register, register_views

_CTE_SQL = f"""
WITH cust_orders AS (
  SELECT o_custkey, count(*) AS n_orders,
         {o_dsum('o_totalprice')} AS total_spent
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment, count(*) AS n_cust,
       {o_dsum('total_spent')} AS segment_spend
FROM customer JOIN cust_orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("cte_with", oracle=_CTE_SQL)
def cte_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_CTE_SQL)


_DERIVED_SQL = """
SELECT big.o_orderstatus, count(*) AS n_big
FROM (SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 200000) big
GROUP BY big.o_orderstatus
"""


@register("derived_table", oracle=_DERIVED_SQL)
def derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_DERIVED_SQL)


_IN_SQL = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@register("subquery_in", oracle=_IN_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (plans as left semi join)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_IN_SQL)


_EXISTS_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
"""


@register("subquery_exists", oracle=_EXISTS_SQL)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated to a semi join by Catalyst)."""
    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_EXISTS_SQL)


_NOT_IN_SQL = """
SELECT count(*) AS n_matching FROM customer
WHERE c_custkey NOT IN (
  SELECT CASE WHEN o_orderkey = (SELECT min(o_orderkey) FROM orders)
              THEN NULL ELSE o_custkey END
  FROM orders
)
"""


@register("subquery_not_in_nulls", oracle=_NOT_IN_SQL)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a subquery containing a NULL: 3VL makes the predicate
    never-true, so the count is 0 on ANY correct engine (null-aware anti
    join in Spark). The classic Hive/SQL trap, pinned by an oracle."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_NOT_IN_SQL)


_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice,
       (o_totalprice > (SELECT max(c_acctbal) FROM customer)) AS above_max_bal
FROM orders WHERE o_orderkey <= 100
"""


@register("subquery_scalar", oracle=_SCALAR_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (not in Hive 0.13 - flagged emr-gap in SURVEY; native
    in Spark and ANSI SQL)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SCALAR_SQL)


# Recursive CTE (Spark 4.0+ WITH RECURSIVE): walk a synthetic parent tree
# over customers (parent(k) = k div 10, roots are keys < 10) to the root.
# The SAME text runs on both engines modulo the integer-division operator.
_RECURSIVE_SQL_TMPL = """
WITH RECURSIVE anc(custkey, anc_key, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 500
  UNION ALL
  SELECT custkey, anc_key {DIV} 10, depth + 1 FROM anc WHERE anc_key >= 10
)
SELECT custkey, anc_key AS root_key, depth AS depth_to_root
FROM anc WHERE anc_key < 10
"""


@register("cte_recursive", oracle=_RECURSIVE_SQL_TMPL.replace("{DIV}", "//"))
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk (Spark 4.0+): each customer key climbs
    its synthetic parent chain (parent = key div 10) to the root, emitting
    (custkey, root_key, depth) - the org-chart / BOM traversal shape SQL
    engines historically punted to clients.

    Scale notes: Spark executes each recursion step as a join of the
    previous frontier against nothing here (pure column arithmetic), so the
    work per step is one narrow projection of the surviving frontier; depth
    is bounded by the key width (O(log10 maxkey) steps). General recursive
    joins inherit the per-step shuffle economics of their step query.
    """
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_RECURSIVE_SQL_TMPL.replace("{DIV}", "div"))


_PARAM_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 300000 AND o_orderstatus = 'O'
"""


@register("sql_named_parameters", oracle=_PARAM_ORACLE)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+): named parameter markers bound via
    spark.sql(..., args=...) - the injection-safe successor to textual
    ${VAR} substitution (which the runner still provides for Hive-script
    parity, see runner/substitution.py).

    Parameters are bound as literals in the parsed plan, so Catalyst
    constant-folds and pushes them down exactly like inline literals.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > :min_price AND o_orderstatus = :status",
        args={"min_price": 300000, "status": "O"},
    )
