"""Relational coverage queries (TPC-H-shaped) over the driver tables.

The reference engine has no SQL surface, but its dataflow is
join/agg/top-k shaped (SURVEY.md §2.3); these queries exercise the
same relational operator set end-to-end through Catalyst — scan →
filter pushdown → broadcast/shuffle join → partial agg → top-k — and
anchor the bench grid (BASELINE.md "TPC-H-style agg/join set").

Scale notes (100 TB): every join here either broadcasts a dimension
(region/nation/customer-sized) or shuffles on the natural key with AQE
skew handling; aggregates are partial (map-side combine) by
construction because they are plain ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.queries import query
from multi_search_retrival_big_data_spark.queries.common import (
    det_round,
    dsum,
    sql_det_round,
    sql_dsum,
)


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_det_round(sql_dsum('l_quantity') + ' / COUNT(*)')} AS avg_qty,
           {sql_det_round(sql_dsum('l_extendedprice') + ' / COUNT(*)')} AS avg_price,
           {sql_det_round(sql_dsum('l_discount') + ' / COUNT(*)')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            det_round(dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            det_round(dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            det_round(dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, "customer", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c["c_custkey"] == o["o_custkey"])
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: tables.load(spark, n, sf_dir)
         for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: tables.load(spark, n, sf_dir)
         for n in ("customer", "orders", "lineitem", "nation")}
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: EXISTS → left-semi join before the aggregate
    (adapted to the driver schema — no l_commitdate column, the
    returned-flag predicate plays the late-delivery role)."""
    o = tables.load(spark, "orders", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT {sql_det_round(
        "100.0 * " + sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")
        + " / " + sql_dsum("l.l_extendedprice * (1 - l.l_discount)")
    )} AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — promo revenue share: fact ⋈ broadcast(part) + conditional
    aggregate, the classic CASE-inside-SUM shape."""
    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(det_round(F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue"))
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — large-volume customers: aggregate-then-join (HAVING
    pushes the heavy groupBy below the joins, so only qualifying
    orders ever reach the join)."""
    li = tables.load(spark, "lineitem", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    c = tables.load(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#6'  AND p.p_size BETWEEN 1 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 — disjunctive join predicates: Catalyst extracts the common
    p_partkey equi-join and evaluates the OR-blocks as a post-join
    filter (vs the naive nested-loop a literal reading implies)."""
    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)

    def block(brand: str, smax: int, qmin: int, qmax: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )

    cond = (
        block("Brand#11", 15, 1, 20)
        | block("Brand#22", 30, 10, 40)
        | block("Brand#6", 50, 20, 50)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q2_cheapest_per_part",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    )
    SELECT r.l_partkey, p.p_name, r.l_orderkey, r.l_extendedprice AS min_price
    FROM ranked r JOIN part p ON p.p_partkey = r.l_partkey
    WHERE r.rn = 1
    ORDER BY r.l_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: min-per-group via window rank — the classic
    'correlated MIN subquery' (TPC-H q2's cheapest supplier) expressed
    as row_number over a partition, which Spark executes as one
    shuffle + per-partition sort instead of a re-scan per group."""
    from pyspark.sql.window import Window

    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)
    w = Window.partitionBy("l_partkey").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "l_partkey", "p_name", "l_orderkey",
            F.col("l_extendedprice").alias("min_price"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


# One ANSI-SQL string executed verbatim by BOTH engines — Spark runs it
# through spark.sql() over registered views, DuckDB as the oracle. The
# strongest possible demonstration that the engine exposes a portable
# SQL surface alongside the DataFrame API.
SHARED_SQL = """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6 + 0.5)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity < 30
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("sql_shared_dialect", oracle=SHARED_SQL)
def sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-surface proof: the oracle string ITSELF is executed by
    spark.sql() over registered views — identical text, two engines,
    hash-identical results."""
    tables.register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL)


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: the SAME dimension joined twice under two roles
    (supplier nation / customer nation) with a symmetric pair
    predicate — the dual-alias broadcast pattern. Both nation aliases
    are pre-filtered to the two names so the fact-side join input is
    semi-reduced before the shuffle."""
    t = {n: tables.load(spark, n, sf_dir)
         for n in ("lineitem", "orders", "customer", "supplier", "nation")}
    pair = ["NATION_1", "NATION_2"]
    nd = t["nation"].filter(F.col("n_name").isin(pair))
    n1 = nd.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    n2 = nd.select(F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — order-count distribution: LEFT OUTER join with an extra
    non-key predicate (pushed to the probe side, preserving unmatched
    customers as count 0), then an aggregation OF an aggregation."""
    c = tables.load(spark, "customer", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    per_cust = (
        c.select("c_custkey")
        .join(
            o.filter(F.col("o_orderpriority") != "1-URGENT")
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q22_dormant_balance",
    oracle=f"""
    WITH thr AS (
      SELECT {sql_dsum('c_acctbal')} / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, COUNT(*) AS numcust, {sql_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    CROSS JOIN thr
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > thr.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: scalar-subquery threshold (above-average positive
    balance, computed with the quantized dsum so the comparison is
    engine-exact) + NOT EXISTS anti-join (customers with no urgent
    orders — the testdata has no order-less customers), aggregated per
    nation. The threshold is a 1-row broadcast; the anti-join shuffles
    only the filtered fact keys."""
    c = tables.load(spark, "customer", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    n = tables.load(spark, "nation", sf_dir)
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count("*")).alias("__thr"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__thr"))
        .join(urgent, "c_custkey", "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"), dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("n_name")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           {sql_det_round(
               sql_dsum("CASE WHEN nation = 'NATION_7' THEN volume ELSE 0.0 END")
               + " / " + sql_dsum("volume")
           )} AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), adapted to the driver schema
    (no p_container; nation names are synthetic). Two roles for the
    nation dim — customer side restricts the market (region ASIA),
    supplier side labels the share — so `nation` joins twice, both
    broadcast. The share is a ratio of two quantized sums, so the
    division is over exact operands in both engines."""
    p = tables.load(spark, "part", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    c = tables.load(spark, "customer", sf_dir)
    n = tables.load(spark, "nation", sf_dir)
    r = tables.load(spark, "region", sf_dir)
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    vol = (
        p.filter(F.col("p_type") == "ECONOMY")
        .join(li, p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    share = det_round(
        dsum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0))
        / dsum(F.col("volume"))
    )
    return (
        vol.groupBy("o_year").agg(share.alias("mkt_share")).orderBy("o_year")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max. The max-revenue threshold is a 1-row aggregate broadcast
    back into the plan (no driver collect); revenue is a quantized sum
    so the equality comparison cannot be split by float noise between
    engines."""
    li = tables.load(spark, "lineitem", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        s.join(rev, s["s_suppkey"] == rev["supplier_no"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pavg AS (
      SELECT l_partkey, 0.2 * ({sql_dsum('l_quantity')} / COUNT(*)) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_det_round(sql_dsum('l.l_extendedprice') + ' / 7.0')} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9' AND l.l_quantity < a.qty_limit
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted (no
    p_container column). The correlated scalar subquery — 20% of the
    part's average quantity — becomes a per-part aggregate joined back
    on l_partkey; the average's numerator is a quantized sum over an
    int count, so the 0.2·avg threshold is the identical double in
    both engines and the row filter cannot diverge."""
    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)
    pavg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (dsum(F.col("l_quantity")) / F.count("*"))).alias("qty_limit")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#9")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(pavg.withColumnRenamed("l_partkey", "__pk"), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(det_round(dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.08 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year), adapted: the
    driver schema has no partsupp, so supply cost is proxied as
    8% of p_retailprice per unit (documented deviation; the plan shape
    — 5-way join with a LIKE-filtered part scan feeding the fact join,
    then a two-key partial agg — is the Q9 shape). part/supplier/
    nation broadcast; lineitem⋈orders shuffles once on orderkey. The
    amount expression keeps identical operator association in both
    engines so the quantized sum sees bit-equal addends."""
    p = tables.load(spark, "part", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    n = tables.load(spark, "nation", sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.08) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, {sql_dsum('l.l_extendedprice * l.l_quantity')} AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey IN (1, 2, 3)
      GROUP BY l.l_partkey
    ),
    tot AS (
      SELECT {sql_dsum('l.l_extendedprice * l.l_quantity')} * 0.001 AS thr
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey IN (1, 2, 3)
    )
    SELECT v.l_partkey AS partkey, v.part_value
    FROM val v CROSS JOIN tot
    WHERE v.part_value > tot.thr
    ORDER BY v.part_value DESC, v.l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: no
    partsupp, so a part's "stock value" is the traded value
    Σ extendedprice·quantity restricted to suppliers of nations 1-3,
    and the HAVING threshold is 0.1% of the global value — the Q11
    shape (group-agg + scalar-subquery threshold) intact. The
    threshold aggregate is a 1-row broadcast; both the per-part and
    total sums are quantized so `part_value > thr` compares identical
    doubles in both engines."""
    li = tables.load(spark, "lineitem", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    base = li.join(
        F.broadcast(s.filter(F.col("s_nationkey").isin(1, 2, 3))),
        F.col("s_suppkey") == F.col("l_suppkey"),
    ).select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("__v"))
    val = base.groupBy("l_partkey").agg(dsum(F.col("__v")).alias("part_value"))
    tot = base.agg((dsum(F.col("__v")) * F.lit(0.001)).alias("__thr"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("__thr"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
        .orderBy(F.desc("part_value"), F.asc("partkey"))
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: the
    driver lineitem has no l_shipmode/commitdate/receiptdate, so the
    mode dimension is l_returnflag and "late" is shipped more than 90
    days after the order date (a join-predicate on two tables' columns,
    like the original's receipt/commit comparison). Pure integer
    CASE-sums — no float hazard. One shuffle on orderkey; the
    priority CASE folds into the partial agg."""
    o = tables.load(spark, "orders", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: supplier-part
    pairs come from lineitem (no partsupp), and the excluded-supplier
    subquery (complaints in the original) is suppliers with negative
    balance. Shape intact: anti-join against a tiny broadcast exclusion
    list, then COUNT(DISTINCT) per part attribute triple — Spark plans
    the distinct as a two-phase partial/final expand, no row explosion
    beyond the pair set."""
    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    bad = s.filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    pf = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_dominant_suppliers",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, {sql_dsum('l_quantity')} AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
    ),
    pthr AS (
      SELECT l_partkey, 0.5 * {sql_dsum('l_quantity')} AS thr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN pthr t ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE sh.qty > t.thr
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no partsupp
    availqty, so the nested-aggregate condition becomes "supplier
    shipped more than half of a red part's 1996 volume" — same shape:
    an inner per-(supp,part) aggregate compared against a correlated
    per-part aggregate, then a semi-join up to suppliers. The part
    filter is a broadcast semi-join pushed below both aggregates;
    quantized qty sums make the 0.5·total threshold engine-exact."""
    li = tables.load(spark, "lineitem", sf_dir)
    p = tables.load(spark, "part", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    red = p.filter(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    base = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(F.broadcast(red), "l_partkey", "left_semi")
    shipped = base.groupBy("l_suppkey", "l_partkey").agg(
        dsum(F.col("l_quantity")).alias("qty")
    )
    pthr = base.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.5) * dsum(F.col("l_quantity"))).alias("thr")
    )
    return (
        shipped.join(pthr, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("qty") > F.col("thr"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH lat AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    ord AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
      FROM lat
      GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lat l
    JOIN ord x ON l.l_orderkey = x.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE l.is_late = 1 AND x.n_supp > 1 AND x.n_late = 1 AND s.s_nationkey = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late"
    is shipped >90 days after order date (no receipt/commit dates) and
    the nation filter keeps NATION_1. The original's correlated
    EXISTS (another supplier on the order) / NOT EXISTS (another LATE
    supplier) pair is decorrelated into one per-order aggregate —
    n_supp>1 ∧ n_late=1 — which is how Catalyst would rewrite the
    subqueries anyway, but doing it explicitly shares one scan of the
    late-flagged fact across both conditions. Integer counts only."""
    li = tables.load(spark, "lineitem", sf_dir)
    o = tables.load(spark, "orders", sf_dir)
    s = tables.load(spark, "supplier", sf_dir)
    lat = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
    )
    ordagg = lat.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    return (
        lat.filter(F.col("is_late") == 1)
        .join(ordagg, F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(s.filter(F.col("s_nationkey") == 1)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
