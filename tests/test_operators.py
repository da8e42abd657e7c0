"""Unit tests for operator helpers not fully covered by oracle parity:
merge semantics, insert-if-absent, salted join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.skew import salted_join
from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import (
    insert_if_absent,
    merge_upsert,
)


def test_merge_upsert_staged_wins_and_inserts(spark):
    current = spark.createDataFrame(
        [("TSLA", "2025-06-30", 1.0), ("RIVN", "2025-06-30", 2.0)],
        "ticker string, quarter string, v double",
    )
    staged = spark.createDataFrame(
        [("TSLA", "2025-06-30", 9.0), ("LCID", "2025-06-30", 3.0)],
        "ticker string, quarter string, v double",
    )
    out = {
        (r.ticker, r.quarter): r.v
        for r in merge_upsert(current, staged, keys=["ticker", "quarter"]).collect()
    }
    assert out == {
        ("TSLA", "2025-06-30"): 9.0,  # staged wins
        ("RIVN", "2025-06-30"): 2.0,  # untouched current survives
        ("LCID", "2025-06-30"): 3.0,  # new key inserted
    }


def test_merge_upsert_tiebreak_is_deterministic(spark):
    current = spark.createDataFrame([], "k string, v double, prio int")
    staged = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 0)], "k string, v double, prio int"
    )
    out = merge_upsert(current, staged, keys=["k"], order_cols=["prio"]).collect()
    assert len(out) == 1 and out[0].v == 2.0  # highest prio wins


def test_insert_if_absent(spark):
    existing = spark.createDataFrame([("TSLA",), ("RIVN",)], "ticker string")
    incoming = spark.createDataFrame([("TSLA",), ("NIO",)], "ticker string")
    out = {r.ticker for r in insert_if_absent(existing, incoming, keys=["ticker"]).collect()}
    assert out == {"TSLA", "RIVN", "NIO"}


def test_salted_join_equals_plain_join(spark, sf_dir):
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    customer = src.load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    nation = src.load_table(spark, sf_dir, "nation")
    plain = customer.join(nation, "n_nationkey").select("c_custkey", "n_name")
    salted = salted_join(customer, nation, "n_nationkey", n_salts=8).select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_merge_with_audit_trigger_policy(spark):
    """schema.sql:63-82 trigger semantics: matched rows preserve created_at
    and refresh updated_at; inserts stamp both; untouched rows keep both."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import merge_with_audit

    t0 = "2024-01-01 00:00:00"
    now = "2025-06-30 12:00:00"
    current = spark.createDataFrame(
        [("TSLA", 100.0), ("RIVN", 50.0)], "ticker string, revenue double"
    ).select(
        "ticker", "revenue",
        F.lit(t0).cast("timestamp").alias("created_at"),
        F.lit(t0).cast("timestamp").alias("updated_at"),
    )
    staged = spark.createDataFrame(
        [("TSLA", 120.0), ("LCID", 30.0)], "ticker string, revenue double"
    )
    out = {
        r.ticker: r
        for r in merge_with_audit(
            current, staged, keys=["ticker"], now=F.lit(now).cast("timestamp")
        ).collect()
    }
    assert out["TSLA"].revenue == 120.0  # staged wins on match
    assert str(out["TSLA"].created_at) == t0  # preserved by the trigger
    assert str(out["TSLA"].updated_at) == now  # refreshed by the trigger
    assert str(out["LCID"].created_at) == now  # insert: both default to now
    assert str(out["LCID"].updated_at) == now
    assert out["RIVN"].revenue == 50.0  # untouched row fully intact
    assert str(out["RIVN"].created_at) == t0 and str(out["RIVN"].updated_at) == t0


def test_asof_join_matches_pandas_merge_asof(spark):
    """The union+forward-fill as-of plan must agree with pandas merge_asof
    (direction='backward', inclusive) — with and without tolerance."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import asof

    trades = [(1, 100, "A"), (1, 250, "A"), (1, 300, "A"), (1, 50, "B"), (1, 999, "B")]
    quotes = [(100, 1.0, "A"), (200, 2.0, "A"), (300, 3.0, "A"), (60, 9.0, "B")]
    left = spark.createDataFrame(
        [(i, ts, k) for i, (_, ts, k) in enumerate(trades)], "trade_id long, ts long, k string"
    )
    right = spark.createDataFrame(quotes, "qts long, px double, k string")

    out = asof.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="qts",
        payload_cols=["px"], right_tiebreak="px",
    )
    got = {r.trade_id: r.px for r in out.collect()}

    lp = pd.DataFrame([(i, ts, k) for i, (_, ts, k) in enumerate(trades)],
                      columns=["trade_id", "ts", "k"]).sort_values("ts")
    rp = pd.DataFrame(quotes, columns=["qts", "px", "k"]).sort_values("qts")
    want = pd.merge_asof(lp, rp, left_on="ts", right_on="qts", by="k")
    for _, row in want.iterrows():
        w = None if pd.isna(row.px) else row.px
        assert got[row.trade_id] == w, (row.trade_id, got[row.trade_id], w)

    # tolerance: match older than 60 ticks is nulled
    out_tol = asof.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="qts",
        payload_cols=["px"], right_tiebreak="px", tolerance=F.lit(60),
    )
    got_tol = {r.trade_id: r.px for r in out_tol.collect()}
    want_tol = pd.merge_asof(lp, rp, left_on="ts", right_on="qts", by="k", tolerance=60)
    for _, row in want_tol.iterrows():
        w = None if pd.isna(row.px) else row.px
        assert got_tol[row.trade_id] == w, (row.trade_id, got_tol[row.trade_id], w)


def test_asof_join_same_ts_tie_is_deterministic(spark):
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import asof

    left = spark.createDataFrame([(1, 10, "A")], "trade_id long, ts long, k string")
    right = spark.createDataFrame(
        [(10, 1.0, "A"), (10, 2.0, "A")], "qts long, px double, k string"
    )
    out = asof.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="qts",
        payload_cols=["px"], right_tiebreak="px",
    ).collect()
    assert out[0].px == 2.0  # greatest tiebreak wins, inclusive at equal ts


def test_interval_point_join_exact_bounds_no_duplicates(spark):
    """Bucketized range join: inclusive bounds, intervals spanning many
    buckets, each (point, interval) match appears exactly once, and the plan
    is an equi-join (no BroadcastNestedLoopJoin)."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import rangejoin

    def ts(s):
        return F.lit(s).cast("timestamp")

    points = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-01 12:00:00.000001"), (4, "2024-01-01 09:59:59")],
        "pid long, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp").alias("pts"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),   # 3 buckets
         (11, "2024-01-01 11:30:00", "2024-01-01 11:40:00")],  # within 1 bucket
        "iid long, s string, e string",
    ).select("iid", F.col("s").cast("timestamp").alias("ws"), F.col("e").cast("timestamp").alias("we"))

    out = rangejoin.interval_point_join(
        points, intervals, point_ts="pts", start_col="ws", end_col="we", bucket_width_s=3600
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    # pid 1 at start (inclusive), pid 2 at end (inclusive), pid 3 one us past
    # the end (excluded), pid 4 one second before the start (excluded)
    assert got == [(1, 10), (2, 10)]

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()


def test_round2_operators_handle_empty_inputs(spark):
    """Empty-side behavior of the round-2 operators (the reference's
    empty-extraction tolerance, SURVEY §5, extended to the new surface)."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import (
        asof,
        dedup as dd,
        rangejoin,
        sampling,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import merge_with_audit

    # as-of join with an EMPTY right side: every left row survives, payload null
    left = spark.createDataFrame([(1, 10, "A")], "trade_id long, ts long, k string")
    empty_right = spark.createDataFrame([], "qts long, px double, k string")
    out = asof.asof_join(
        left, empty_right, on=["k"], left_ts="ts", right_ts="qts",
        payload_cols=["px"], right_tiebreak="px",
    ).collect()
    assert len(out) == 1 and out[0].px is None

    # connected components with NO edges: every vertex is its own component
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    comp = {r.id: r.comp for r in dd.connected_components(empty_edges, verts).collect()}
    assert comp == {1: 1, 2: 2}

    # range join with empty intervals: empty result, no error
    pts = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "pid long, s string").select(
        "pid", F.col("s").cast("timestamp").alias("pts")
    )
    empty_iv = spark.createDataFrame([], "iid long, ws timestamp, we timestamp")
    assert (
        rangejoin.interval_point_join(pts, empty_iv, "pts", "ws", "we").count() == 0
    )

    # sampling on an empty frame
    empty_docs = spark.createDataFrame([], "doc_id long, lang string")
    assert sampling.sample_fraction(empty_docs, "doc_id", 0.5).count() == 0
    assert sampling.stratified_quota(empty_docs, ["lang"], "doc_id", 5).count() == 0
    assert sampling.split_assign(empty_docs, "doc_id").count() == 0

    # trigger merge with empty staged: current rows fully unchanged
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    current = spark.createDataFrame([("TSLA", 1.0)], "ticker string, v double").select(
        "ticker", "v", t0.alias("created_at"), t0.alias("updated_at")
    )
    empty_staged = spark.createDataFrame([], "ticker string, v double")
    merged = merge_with_audit(
        current, empty_staged, keys=["ticker"], now=F.lit("2025-01-01").cast("timestamp")
    ).collect()
    assert len(merged) == 1 and merged[0].v == 1.0
    assert str(merged[0].updated_at) == "2024-01-01 00:00:00"


def test_global_cumsum_exact_and_not_single_partitioned(spark):
    """The two-pass prefix sum must equal the naive global window AND keep
    the big window partitioned (range partitioning visible in the plan; the
    only single-partition stage is over the per-partition totals, one row
    per partition)."""
    import contextlib
    import io

    from pyspark.sql import Window, functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import packing

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v")
    )
    out = packing.global_cumsum(df, ["id"], "v")
    got = {r.id: r.cum for r in out.collect()}

    naive = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    want = {r.id: r.cum for r in naive.collect()}
    assert got == want

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().lower()
    assert "rangepartitioning" in plan  # the corpus-wide pass is parallel


def test_pack_chunks_invariants(spark):
    """pack_chunks (r13): (1) each document's slices are contiguous,
    start at tok_offset 0, and sum to its token count; (2) every bin
    except the corpus' last sums to exactly bin_tokens; (3) a document
    longer than several bins contributes one full-capacity slice per
    interior bin; (4) zero-token documents are dropped."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import packing

    B = 100
    rows = [  # (doc_id, toks): mix of tiny, straddling, and multi-bin docs
        (1, 30), (2, 90), (3, 250), (4, 0), (5, 1), (6, 99), (7, 430),
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    got = packing.pack_chunks(df, "toks", ["doc_id"], bin_tokens=B).collect()

    assert not [r for r in got if r.doc_id == 4], "zero-token doc must drop"
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    toks = dict(rows)
    for doc, slices in by_doc.items():
        slices.sort(key=lambda r: r.tok_offset)
        assert slices[0].tok_offset == 0
        pos = 0
        for s in slices:
            assert s.tok_offset == pos, "slices must be contiguous"
            assert 0 < s.chunk_tokens <= B
            pos += s.chunk_tokens
        assert pos == toks[doc], "slices must cover the document exactly"
        assert [s.bin_id for s in slices] == sorted(
            {s.bin_id for s in slices}
        ), "one slice per bin, ascending"
    per_bin: dict[int, int] = {}
    for r in got:
        per_bin[r.bin_id] = per_bin.get(r.bin_id, 0) + r.chunk_tokens
    last = max(per_bin)
    total = sum(t for _, t in rows)
    for b, n in per_bin.items():
        assert n == (B if b != last else total - last * B)
    # doc 7 (430 toks) spans >= 4 bins; its interior slices are full bins
    interior = sorted(by_doc[7], key=lambda r: r.tok_offset)[1:-1]
    assert interior and all(s.chunk_tokens == B for s in interior)
