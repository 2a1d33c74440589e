"""TPC-H-style join-strategy catalog: semi-join, anti-join, disjunctive
pushdown, scalar-subquery, and group-having-semi shapes over the driver
tables.

The reference has exactly one explicit join (SURVEY.md §2.3, J1); these
entries cover the join repertoire a Spark-first engine must additionally
prove: EXISTS → left-semi (Q4), NOT IN → left-anti (Q16), correlated NOT
EXISTS → anti with compound key (Q22), OR-of-ANDs predicate pushdown
(Q19), HAVING-subquery semi (Q18), and conditional aggregation (Q12,
Q14).  Column sets are adapted to TESTDATA.md schemas (no partsupp /
l_shipmode / l_commitdate in the fixtures).

Scale notes (100 TB posture) are in each docstring; the common themes:
semi/anti joins shuffle only the join keys, never payload columns; the
fact-fact hop (orders↔lineitem) is the one real shuffle and would be
bucket-aligned on orderkey at scale.

Broadcast-hint policy (round 6, the repo rule): hints ONLY where the
side is bounded by construction — nation/region (fixed 25/5 rows per
the TPC-H spec) and 1-row scalar cross joins.  part/supplier/customer
and filtered/derived frames GROW with scale factor, so a pinned hint
would force a driver-OOM broadcast at SF100k; hint-free, the static
planner still broadcasts them at bench SF (file-size threshold) and
AQE sizes them from runtime stats on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waddleml_spark.catalog import _r, _r_sql, _register, t


@_register(
    "order_priority_check_q4",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def order_priority_check_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join.

    The semi join carries only (l_orderkey, l_shipdate) from the fact —
    payload columns never shuffle.  The date window pushes into the
    orders scan (partition pruning at scale); Catalyst decorrelates the
    non-equi part (l_shipdate > o_orderdate) into the join condition.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_register(
    "priority_class_by_flag_q12",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def priority_class_by_flag_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation.

    The two CASE sums fold into one aggregate pass (no per-class
    re-scan); integer sums are order-insensitive so no rounding is
    needed.  At scale: bucket-aligned orderkey join, partial aggregation
    map-side, 3-row result.
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_register(
    "promo_revenue_q14",
    f"""
    SELECT {_r_sql(
        '''100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
           / sum(l.l_extendedprice * (1 - l.l_discount))''', 4)} AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: dim join + conditional-ratio scalar.

    part joins hint-free (bench-SF plans still broadcast it via the
    size threshold; at SF100k part is fact-sized and AQE decides —
    only p_partkey/p_type are read, so column pruning keeps whatever
    build side results tiny); the shipdate
    window pushes into the lineitem scan.  Ratio rounded to 4 digits:
    double sums are order-nondeterministic across engines.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        _r(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_pct")
    )


@_register(
    "supplier_part_counts_q16",
    """
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN → left-anti join + count distinct.

    The excluded-supplier set is small at any one time but grows with
    SF, so the anti join is hint-free (planner/AQE broadcast it while
    it fits).  s_suppkey is non-null so NOT IN ≡ anti join
    (the NULL-semantics trap doesn't apply).  count(DISTINCT) expands to
    a two-phase aggregate; at scale pre-aggregate distinct (brand, type,
    suppkey) map-side first — which is exactly what Spark's planner does.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "large_order_customers_q18",
    f"""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           {_r_sql('t.sum_qty', 2)} AS sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 140) t
      ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def large_order_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as join input (the
    "large volume customer" pattern).

    The aggregate runs FIRST and shrinks the fact to qualifying
    orderkeys (map-side partial sums), so the subsequent joins see only
    the survivors; customer joins hint-free (it grows with SF).  Top-50 is TakeOrderedAndProject
    — no global sort materialization.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 140)
    )
    return (
        o.join(big, big.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name", "o_orderkey", "o_totalprice", _r(F.col("sum_qty"), 2).alias("sum_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@_register(
    "disjunctive_revenue_q19",
    f"""
    SELECT {_r_sql('sum(l.l_extendedprice * (1 - l.l_discount))', 2)} AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Catalyst extracts the common-side conjuncts: per-side implied
    filters (p_brand IN (...), l_quantity BETWEEN 1 AND 40) push into
    the scans BELOW the join, and only the residual disjunction is
    evaluated post-join — the classic disjunctive-pushdown test.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(b("Brand#12", 15, 1, 21) | b("Brand#23", 25, 10, 30) | b("Brand#34", 35, 20, 40))
        .agg(_r(F.sum(rev), 2).alias("revenue"), F.count("*").alias("n_items"))
    )


@_register(
    "idle_rich_customers_q22",
    f"""
    SELECT c.c_nationkey, count(*) AS numcust,
           {_r_sql('sum(c.c_acctbal)', 2)} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT {_r_sql('avg(c_acctbal)', 2)}
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def idle_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + correlated NOT EXISTS
    → broadcast scalar + left-anti join.

    The average is a 1-row DataFrame cross-joined in (broadcast — the
    Spark idiom for a scalar subquery); the anti join ships only
    o_custkey of urgent orders.  The threshold is rounded to 2 digits on
    BOTH sides before comparing: a double avg is order-nondeterministic
    in the last ulp, and the filter must not flip boundary rows between
    engines (acctbals themselves have 2 decimals).
    """
    c = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        _r(F.avg("c_acctbal"), 2).alias("__thresh")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__thresh"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _r(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_register(
    "top_supplier_q15",
    f"""
    WITH rev AS (
        SELECT l_suppkey, {_r_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → global max → equality semi (ties kept).

    The max is a 1-row broadcast scalar against the aggregate (NOT a
    global-sort top-1: ties must survive, and the aggregate may have
    millions of rows at scale — a single-partition window would funnel
    them through one task).  Revenue is rounded identically on both
    sides BEFORE the max comparison so the tie set is engine-stable.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@_register(
    "small_quantity_revenue_q17",
    f"""
    SELECT {_r_sql("sum(l.l_extendedprice) / 7.0", 2)} AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, {_r_sql("0.5 * avg(l_quantity)", 6)} AS half_avg
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average → fact joined to the
    aggregate of itself on the group key.

    One shuffle on partkey serves both the aggregate and the join (at
    scale, bucketing lineitem by partkey makes it shuffle-free).  The
    half-average threshold is rounded on both sides: group-sum order is
    nondeterministic, and a boundary row must not flip between engines.
    """
    li = t(spark, sf_dir, "lineitem")
    half = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        _r(F.lit(0.5) * F.avg("l_quantity"), 6).alias("half_avg")
    )
    return (
        li.join(half, li.l_partkey == half.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(_r(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_register(
    "waiting_supplier_q21",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10
    """,
)
def waiting_supplier_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier query — double-correlated
    EXISTS/NOT EXISTS, rewritten as per-order windowed distinct counts.

    Instead of two correlated self-joins (three passes over the fact),
    ONE lineitem⋈orders pass computes per-order supplier sets via
    window collect_set on orderkey: a row qualifies iff it is late,
    the order has >1 distinct supplier, and exactly 1 distinct LATE
    supplier (the row's own).  Same answer, one shuffle on orderkey —
    the partitioning the fact is already bucketed by at scale.
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    w = Window.partitionBy("l_orderkey")
    lo = lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w))).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    return (
        lo.filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, lo.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@_register(
    "forecast_revenue_q6",
    f"""
    SELECT {_r_sql("sum(l_extendedprice * l_discount)", 2)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-aggregate, zero joins.

    The canonical predicate-pushdown probe: all three conjuncts reach
    the parquet scan as PushedFilters, only 4 columns are read, and the
    whole query is one map-side partial sum + a 1-row final — no real
    shuffle.  At 100 TB this is I/O-bound by design; shipdate partition
    pruning cuts the year window server-side.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _r(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@_register(
    "min_cost_supplier_q2",
    f"""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               {_r_sql("avg(l_extendedprice / l_quantity)", 4)} AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT p.p_partkey, p.p_brand, s.s_name, c.unit_cost
    FROM cost c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY p.p_partkey, s.s_name
    LIMIT 100
    """,
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery → per-part min as a
    WINDOW over the cost table (ties kept by the equality filter).
    partsupp is absent from the fixtures, so supply cost is derived as
    avg unit price per (part, supplier) — same plan shape.

    One shuffle on (partkey, suppkey) builds the cost table; the
    per-part min is `min over (partition by partkey)` + filter — no
    re-aggregate and NO self-join back (the earlier agg+equality-join
    form measured 1.27 s vs 0.85 s for this plan at sf0.1, identical
    rows); supplier and part join hint-free in base-table order (they
    grow with SF — the round-6 hint rule) while the fixed-cardinality
    nation/region keep their broadcasts.  unit_cost is
    floor-rounded BEFORE the min comparison so the tie set is
    engine-stable.
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(_r(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_cost"))
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part")
    # base-table join order (see volume_shipping_q7): supplier and part
    # join as base relations with real size stats; the fixed-cardinality
    # nation/region broadcasts apply the EUROPE cut right after
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, best.l_partkey == p.p_partkey)
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@_register(
    "volume_shipping_q7",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {_r_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.

    The nation filters push BELOW the joins: supplier and customer each
    pre-filter to the two nations (broadcast semi-reduction), so the
    fact-fact orderkey join only carries qualifying rows.  The OR of
    nation pairs is evaluated post-join on two tiny dims.  At scale the
    orders↔lineitem hop is the one shuffle (bucket-aligned on orderkey);
    everything else broadcasts.
    """
    nations = ("NATION_3", "NATION_7")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    # associativity matters for the planner: join the BASE dims (good
    # size stats -> auto-broadcast at bench SF, AQE-sized at scale)
    # and apply the hinted nation broadcast right after, so the
    # two-nation semi-reduction still lands BEFORE the orderkey shuffle
    # — ((li join s) join n) not (li join (s join n)): a derived
    # (s join n) build side has no usable size estimate and forced a
    # sort-merge at bench SF once its pinned hint was removed
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("__sn"),
                              F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("__cn"),
                              F.col("n_name").alias("cust_nation")))
    j = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("__sn"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("__cn"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_register(
    "market_share_q8",
    f"""
    SELECT o_year,
           {_r_sql("sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)", 6)} AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey   = l.l_partkey
        JOIN orders o   ON o.o_orderkey  = l.l_orderkey
        JOIN customer c ON c.c_custkey   = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey  = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey   = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share = conditional-sum ratio
    inside year groups, over a 7-table snowflake.

    Base-table join order (the round-6 hint rule): customer/supplier/
    part join as base relations with real size stats (auto-broadcast at
    bench SF, AQE-sized at scale); only the fixed-cardinality nation/
    region frames keep hints, applying the ASIA cut and the
    supp_nation tag right after their base joins.  lineitem⋈orders is
    the one true shuffle.  The share divides two sums in ONE aggregate
    pass (no second scan); rounded to 6 digits for cross-engine hash
    stability.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = F.broadcast(
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(F.col("n_nationkey").alias("__cn"))
    )
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("__sn"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, c.c_nationkey == F.col("__cn"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("__sn"))
    )
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(_r(F.sum(target) / F.sum(vol), 6).alias("mkt_share"))
    )


@_register(
    "product_profit_q9",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           {_r_sql(
               "sum(l.l_extendedprice * (1 - l.l_discount)"
               " - 0.1 * p.p_retailprice * l.l_quantity)", 2)} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY nation, o_year
    """,
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for parts
    matching a name pattern.  partsupp is absent, so supply cost is
    modeled as 10% of p_retailprice per unit — same join/agg shape.

    The LIKE filter prunes part FIRST; part and supplier join as BASE
    relations (real size stats — auto-broadcast at bench SF, AQE-sized
    at scale; the round-6 hint rule), with the hinted fixed-25-row
    nation tag applied right after supplier.  Profit arithmetic happens
    before the orderkey shuffle so only (nation, year, profit) move.
    25 nations × 7 years output.
    """
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%green%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("__sn"), F.col("n_name").alias("nation")
        )
    )
    o = t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == F.col("__sn"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_r(F.sum(profit), 2).alias("sum_profit"))
    )


@_register(
    "returned_items_q10",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_r_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returns.

    Both fact filters (date window on orders, returnflag on lineitem)
    push below the orderkey join; customer+nation broadcast AFTER the
    aggregate shrinks the fact to one row per customer.  Revenue is
    rounded before the ORDER BY so the top-20 cut is engine-stable
    (c_custkey tiebreak for equal revenues).
    """
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    return (
        rev_per_cust.join(c, rev_per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "important_stock_q11",
    f"""
    WITH val AS (
        SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_5'
        GROUP BY l.l_partkey)
    SELECT l_partkey, {_r_sql("v", 2)} AS part_value
    FROM val
    WHERE {_r_sql("v", 2)} > (SELECT {_r_sql("sum(v) * 0.001", 2)} FROM val)
    """,
)
def important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a fraction of the GLOBAL total —
    scalar subquery in HAVING.

    The per-part aggregate computes once; the global total re-aggregates
    the (tiny) result, broadcasts as a 1-row scalar, and filters — the
    fact is scanned exactly once.  Both the per-part value and the
    threshold are floor-rounded before comparing so boundary parts don't
    flip between engines.
    """
    li = t(spark, sf_dir, "lineitem")
    n = F.broadcast(
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_5")
        .select(F.col("n_nationkey").alias("__sn"))
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    val = (
        # base-table order (round-6 hint rule): supplier joins with real
        # size stats, the hinted fixed-cardinality nation cut follows
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == F.col("__sn"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    total = val.agg(_r(F.sum("v") * 0.001, 2).alias("__thresh"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(_r(F.col("v"), 2) > F.col("__thresh"))
        .select("l_partkey", _r(F.col("v"), 2).alias("part_value"))
    )


@_register(
    "customer_distribution_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram including zero-order
    customers — LEFT OUTER join with an ON-clause (not WHERE) filter,
    then a second aggregation over the first's result.

    The priority filter must live in the join condition: in WHERE it
    would silently drop the NULL-extended rows and lose the
    zero-order bucket.  count(o_orderkey) counts non-NULLs, so
    unmatched customers land in c_count=0.  Second agg is over one row
    per customer — trivially small.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_register(
    "potential_promotion_q20",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 60)
    """,
)
def potential_promotion_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: chained IN subqueries → nested semi joins with a
    grouped HAVING in the middle.

    Inner IN: part name-prefix filter broadcasts as a semi join into
    lineitem (keys only, no payload).  The grouped HAVING shrinks to
    qualifying (supplier, part) pairs; the outer IN is a second semi
    join into supplier.  Quantities are integer-valued doubles, so the
    HAVING sum is exact — no rounding needed.  At scale: one shuffle on
    (suppkey, partkey); both semi joins broadcast.
    """
    s = t(spark, sf_dir, "supplier")
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 60)
        .select("l_suppkey")
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")
