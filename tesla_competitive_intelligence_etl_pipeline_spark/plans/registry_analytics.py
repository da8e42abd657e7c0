"""Registry batch 5: classic analytical query shapes (TPC-H-style) and the
remaining window/dedup variants — the queries a user of a full analytics
engine runs daily, composed from the same operator layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import aggregates as agg
from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity as sim
from tesla_competitive_intelligence_etl_pipeline_spark.plans.registry import _dsum, register
from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

# ===========================================================================
# TPC-H-style analytical queries
# ===========================================================================


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity', 2)} AS sum_qty,
           {_dsum('l_extendedprice', 2)} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan — one pass, map-side partial
    aggregation, 6-group result."""
    # r13: single-row-group input -> spread the exact-decimal aggregation
    # across cores (scale-adaptive no-op on split-rich inputs; guide §2.5)
    li = src.spread(
        src.load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= "1998-09-02"
        ),
        "l_orderkey",
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        agg.exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        agg.exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
        agg.exact_sum(disc_price).alias("sum_disc_price"),
        agg.exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        agg.exact_avg(F.col("l_quantity"), 2).alias("avg_qty"),
        agg.exact_avg(F.col("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 20
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k by revenue."""
    c = src.load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = src.load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    # r13 (revised): an earlier spread of this probe side measured SLOWER
    # warm — the probe's per-row work (one broadcast lookup + one product)
    # is far cheaper than shuffling the filtered fact rows, and the
    # groupBy's own exchange already spreads the aggregation
    # (guide §2.3 over §2.5 when map work is light). Reverted.
    l = src.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            agg.exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@register(
    "q5_region_volume",
    f"""
    SELECT n.n_name, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'REGION_0'
    GROUP BY n.n_name
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with a local-supplier condition — the
    multi-join plan Catalyst reorders; dims broadcast."""
    r = src.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_0")
    n = src.load_table(spark, sf_dir, "nation")
    c = src.load_table(spark, sf_dir, "customer")
    o = src.load_table(spark, sf_dir, "orders")
    # r13 (revised): an earlier spread of the fact side measured SLOWER
    # warm (0.58 -> 0.67 s interleaved A/B) — cheap probe-side map work,
    # so the extra exchange of raw fact rows dominates. Reverted.
    l = src.load_table(spark, sf_dir, "lineitem")
    s = src.load_table(spark, sf_dir, "supplier")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == n.n_nationkey))
        .groupBy("n_name")
        .agg(
            agg.exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@register(
    "q_corr_subquery_avg",
    f"""
    WITH seg_avg AS (
      SELECT c_mktsegment, CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS seg_bal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
    FROM customer c JOIN seg_avg a ON a.c_mktsegment = c.c_mktsegment
    WHERE c.c_acctbal > a.seg_bal
    """,
)
def q_corr_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (above-segment-average customers),
    decorrelated into a join against a pre-aggregated broadcast side."""
    c = src.load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(agg.exact_avg(F.col("c_acctbal"), 2).alias("seg_bal"))
    return (
        c.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_bal"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


# ===========================================================================
# Remaining window variants: lead / first / last, range frames
# ===========================================================================


@register(
    "x8_window_lead_first_last",
    """
    SELECT o_custkey, o_orderkey,
           lead(o_totalprice) OVER w AS next_total,
           first_value(o_totalprice) OVER w AS first_total,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def x8_window_lead_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = src.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_total"),
        F.first("o_totalprice").over(w).alias("first_total"),
        F.last("o_totalprice").over(w_full).alias("last_total"),
    )


@register(
    "x8_window_range_frame",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_orderkey ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_in_band
    FROM lineitem WHERE l_orderkey <= 5000
    """,
)
def x8_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): sum of quantities within 5 units
    below the current row's quantity, per order."""
    li = src.load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5000)
    w = Window.partitionBy("l_orderkey").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").alias("qty_in_band"),
    )


# ===========================================================================
# X-2d: embedding-cosine near-duplicate detection
# ===========================================================================


@register(
    "x2_embedding_neardup",
    """
    WITH dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(list_sum(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS DOUBLE) AS ab,
             CAST(list_sum(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) AS DOUBLE) AS aa,
             CAST(list_sum(list_transform(range(1, len(b.embedding)+1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS DOUBLE) AS bb
      FROM embeddings a JOIN embeddings b
        ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
    )
    SELECT vec_a, vec_b, ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) AS cos_sim
    FROM dots WHERE ab / (sqrt(aa) * sqrt(bb)) >= 0.4
    """,
)
def x2_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2d: embedding-cosine near-dup pairs (bounded subset; at scale the
    pair generation goes through LSH buckets — similarity.lsh_topk — and this
    exact filter becomes the verification stage)."""
    emb = src.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = sim.cosine(F.col("ea"), F.col("eb"))
    return (
        pairs.filter(cos >= 0.4)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )
