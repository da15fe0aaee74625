"""Composite pipelines — the reference's end-user queries (SURVEY.md §2.8),
transposed onto the driver star schema (FIXTURES.md role mapping):

  fact ``lineitem``/``orders``  ≙  IPEDS awards fact ``C2019_A``
  dims ``customer``/``nation``/``region``  ≙  institution directory ``HD2019``
  ``l_returnflag × l_linestatus``  ≙  CIP code grouping keys

Each pipeline is pure DataFrame composition: filter → (broadcast) dim joins →
groupBy agg → decode/rename. Catalyst pushes the filters to the scan, prunes
columns, and picks broadcast-hash joins for the dims — verified via
``.explain("formatted")`` in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_io_spark.catalog import TableCatalog


def pricing_summary(cat: TableCatalog, cutoff: str = "2000-12-01") -> DataFrame:
    """Flagship: the ``awards`` shape (Q2, etl_io.py:390-479) — predicate
    scan → groupBy composite key → multi-measure SUM/AVG/COUNT.

    Doubles are rounded so results are bit-identical to the DuckDB oracle
    (sum order across partitions is otherwise nondeterministic in the last
    ulp). Measure expressions run inside whole-stage codegen; the single
    shuffle carries only (returnflag × linestatus) partials.
    """
    li = cat.table("lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                           AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                      AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                           AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                                      AS avg_price,
  ROUND(AVG(l_discount), 6)                                           AS avg_disc,
  COUNT(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(
    cat: TableCatalog, segment: str = "BUILDING", cutoff: str = "1998-06-01"
) -> DataFrame:
    """Multi-join top-k (TPC-H Q3 shape): revenue of unshipped orders.

    Analogue of chaining the reference's dim-filter -> fact-join passes
    (etl_io.py:347-386) across two fact tables. Catalyst broadcasts the
    filtered ``customer`` dim into ``orders``, then shuffle-joins the
    order keys into ``lineitem``; the final top-k plans as
    TakeOrderedAndProject (no global sort). Both date filters reach the
    parquet scans as pushed predicates.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cust = cat.table("customer").where(F.col("c_mktsegment") == segment)
    orders = cat.table("orders").where(F.col("o_orderdate") < cut)
    li = cat.table("lineitem").where(F.col("l_shipdate") > cut)
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def regional_revenue(cat: TableCatalog, region: str = "ASIA") -> DataFrame:
    """Six-table star join (TPC-H Q5 shape): revenue by nation within one
    region, counting only lineitems whose supplier and customer share the
    nation.

    The dim chain region->nation->customer is tiny and broadcasts end to
    end; ``supplier`` broadcasts too, so the only shuffle-sized joins are
    fact-to-fact (orders |x| lineitem). The supplier/customer co-nation
    constraint rides on the supplier join condition rather than a
    post-filter, so it prunes rows before the aggregate.
    """
    nat = (
        cat.table("region")
        .where(F.col("r_name") == region)
        .join(cat.table("nation"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = cat.table("customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    )
    sup = cat.table("supplier").select("s_suppkey", "s_nationkey")
    return (
        cat.table("lineitem")
        .join(
            cat.table("orders").join(
                F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


REGIONAL_REVENUE_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def returned_customers(
    cat: TableCatalog, start: str = "1998-01-01", end: str = "1998-07-01"
) -> DataFrame:
    """Returned-item ranking (TPC-H Q10 shape): top 20 customers by lost
    revenue from returned lineitems in a half-year window.

    Group keys carry the customer attributes (so no re-join after the
    agg); the date predicate pushes to the orders scan and the returnflag
    predicate to the lineitem scan.
    """
    orders = cat.table("orders").where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    li = cat.table("lineitem").where(F.col("l_returnflag") == "R")
    cust = cat.table("customer").join(
        F.broadcast(cat.table("nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1998-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def large_order_customers(cat: TableCatalog, min_qty: float = 100.0) -> DataFrame:
    """Large-volume-order ranking (TPC-H Q18 shape): customers holding
    orders whose total lineitem quantity exceeds ``min_qty``.

    Scale shape: the HAVING-style quantity filter runs on the ONE
    partial-aggregated lineitem shuffle and shrinks the order set to a
    sliver *before* any join — the surviving keys then broadcast into
    orders, so the big fact tables are never shuffled against each other.
    """
    li_tot = (
        cat.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("tot_qty"))
        .where(F.col("tot_qty") > min_qty)
    )
    orders = cat.table("orders")
    cust = cat.table("customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(li_tot), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "tot_qty",
        )
        .orderBy(F.col("tot_qty").desc(), F.col("o_orderkey"))
        .limit(100)
    )


LARGE_ORDER_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice, tot_qty
FROM orders
JOIN (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS tot_qty
  FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > 100
) t ON o_orderkey = t.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY tot_qty DESC, o_orderkey LIMIT 100
"""


def nations_trade_volume(
    cat: TableCatalog, nation_a: str = "NATION_9", nation_b: str = "NATION_10"
) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): revenue shipped between
    two nations (either direction) by supplier nation, customer nation
    and ship year.

    Both nation filters push into broadcast dim joins before the fact-fact
    lineitem⋈orders join, so the shuffled volume is only the two nations'
    traffic — the dominant cost stays the one keyed fact join."""
    pair = [nation_a, nation_b]
    n1 = cat.table("nation").where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.table("nation").where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    supp = cat.table("supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sk")
    ).select("s_suppkey", "supp_nation")
    cust = cat.table("customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("ck")
    ).select("c_custkey", "cust_nation")
    li = cat.table("lineitem")
    orders = cat.table("orders")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


NATIONS_TRADE_VOLUME_SQL = """
SELECT supp_nation, cust_nation, ship_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS INT)
           AS ship_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name IN ('NATION_9', 'NATION_10')
    AND nc.n_name IN ('NATION_9', 'NATION_10')
    AND ns.n_name <> nc.n_name
) GROUP BY supp_nation, cust_nation, ship_year
"""


def small_quantity_revenue(cat: TableCatalog, brand: str = "Brand#23") -> DataFrame:
    """Correlated-average revenue probe (TPC-H Q17 shape): yearly revenue
    that would be lost by dropping small-quantity orders of one brand's
    parts — ``l_quantity < 0.2 * AVG(l_quantity)`` where the average is
    *per part* (a correlated scalar subquery).

    Scale shape: the brand filter broadcasts ``part`` into ``lineitem``
    first, so the correlated average is computed over only the surviving
    sliver — then a window AVG over ``l_partkey`` reuses that single
    shuffle instead of a second self-join against lineitem (the naive
    decorrelation). One shuffle on the filtered fact, no fact-fact join.
    """
    pk = (
        cat.table("part")
        .where(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li = cat.table("lineitem").join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey")
    )
    from pyspark.sql import Window

    per_part = Window.partitionBy("l_partkey")
    return (
        li.withColumn("__avg_qty", F.avg("l_quantity").over(per_part))
        .where(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(i.l_quantity) FROM lineitem i
    WHERE i.l_partkey = p_partkey
  )
"""


def sole_late_suppliers(cat: TableCatalog, grace_days: int = 45) -> DataFrame:
    """Sole-late-supplier ranking (TPC-H Q21 shape, adapted to this
    schema's columns: "late" = ``l_shipdate > o_orderdate + grace``
    since there is no receipt/commit date). For finished ('F') orders
    with at least two suppliers, find the orders where EXACTLY ONE
    supplier shipped late and charge that order to the late supplier.

    The reference SQL is the classic EXISTS / NOT-EXISTS pair; the Spark
    plan replaces both correlated subqueries with a TWO-LEVEL
    aggregation after one keyed fact join: per (order, supplier) fold
    lateness to one bit, then per order count suppliers / late
    suppliers and recover the culprit as ``MAX(CASE WHEN late THEN
    suppkey END)`` (exact because only one supplier is late). The
    round-5 single-level form used two ``countDistinct``s, which Spark
    plans through an Expand (2× the joined row stream + an extra
    distinct shuffle); both levels here run on the join's
    hash(l_orderkey) partitioning — HashPartitioning(orderkey)
    satisfies the (orderkey, suppkey) clustering — so NEITHER adds a
    shuffle (A/B at sf0.1: 1.20 s → 0.93 s). Join strategy is left to
    Catalyst/AQE: the 'F'-orders sliver broadcasts at test SFs and
    degrades to a shuffle join at 100 TB where orders is fact-sized —
    no lineitem self-join anywhere, which is where the EXISTS form
    pays twice.
    """
    orders = (
        cat.table("orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        cat.table("lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {grace_days} DAYS"
    )
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("__late")
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__n_sups"),
            F.sum("__late").alias("__n_late"),
            F.max(
                F.when(F.col("__late") == 1, F.col("l_suppkey"))
            ).alias("__late_sup"),
        )
        .where((F.col("__n_sups") > 1) & (F.col("__n_late") == 1))
    )
    sup = cat.table("supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("__late_sup")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("__late_sup") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SOLE_LATE_SUPPLIERS_SQL = """
SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def market_share(
    cat: TableCatalog,
    region: str = "ASIA",
    nation: str = "NATION_9",
    p_type: str = "PROMO",
) -> DataFrame:
    """National market share (TPC-H Q8 shape): of all ``p_type`` revenue
    sold to customers in ``region``, the fraction supplied by ``nation``,
    per order year — a conditional aggregate over a seven-table star.

    Every dimension chain (part filter, supplier→nation, customer→nation
    →region) broadcasts; the only shuffle-scale joins are lineitem⋈orders
    keyed by orderkey, and the conditional share needs NO self-join: one
    SUM(CASE) / SUM over the already-joined rows.
    """
    part = cat.table("part").where(F.col("p_type") == p_type).select("p_partkey")
    supp_nat = (
        cat.table("supplier")
        .join(
            cat.table("nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_region = (
        cat.table("customer")
        .join(
            cat.table("nation").withColumnsRenamed(
                {"n_nationkey": "cn_key", "n_regionkey": "cn_region"}
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            cat.table("region").where(F.col("r_name") == region),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cat.table("lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cat.table("orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == nation, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


MARKET_SHARE_SQL = """
SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_year,
       ROUND(SUM(CASE WHEN n_s.n_name = 'NATION_9'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_c ON c_nationkey = n_c.n_nationkey
JOIN region   ON n_c.n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY 1
"""


def customer_order_distribution(
    cat: TableCatalog, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """Order-count distribution (TPC-H Q13 shape): how many customers
    placed exactly k qualifying orders — INCLUDING the zero-order
    customers, which is what forces the LEFT join with the priority
    filter in the ON clause (a WHERE would silently drop the k=0 bucket).

    One outer join keyed by custkey, then two partial-aggregable
    groupBys (per customer, then per count). The second shuffle carries
    at most #distinct-counts rows per partition — nothing at scale.
    """
    orders = cat.table("orders").where(
        F.col("o_orderpriority") != exclude_priority
    )
    cust = cat.table("customer").select("c_custkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
