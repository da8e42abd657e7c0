"""Property-based tests (hypothesis) for the semantically risky scalar
functions (SURVEY.md §7.4 risk register): FN-5 idempotence, FN-1 parse
round-trip, FN-3/4 cleanup-cast against a Python reference implementation.

Strategy: generate a batch of inputs, evaluate the Column expression once
over the whole batch (one Spark job per property, not per example), compare
to the pure-Python reference."""

from __future__ import annotations

import datetime
import re
from decimal import Decimal, InvalidOperation

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.functions import scalars

SETTINGS = settings(max_examples=30, deadline=None)


# -- Python reference implementations (mirroring reference transform.py) -----


def ref_rescale_once(v: float) -> float:
    # converter (transform.py:181-182): `if 0 < decimal_value < 1_000_000`
    return v * 1_000_000 if 0 < v < 1_000_000 else v


def ref_rescale_validator(v: float) -> float:
    # pydantic before-validator (config.py:89-97): `if Decimal(str(v)) <
    # Decimal('1000000')` — NO positivity bound: negatives ARE rescaled
    return v * 1_000_000 if v < 1_000_000 else v


def ref_rescale_pipeline(v: float) -> float:
    # the reference applies the heuristic twice end-to-end with DIFFERENT
    # guards (transform.py:181-182 then config.py:89-97)
    return ref_rescale_validator(ref_rescale_once(v))


def ref_clean_cast(s: str | None) -> Decimal | None:
    if s is None:
        return None
    cleaned = re.sub(r"[,$%\s]", "", s)
    if cleaned in ("", "N/A", "n/a", "-"):
        return None
    if cleaned.lower() in ("inf", "-inf", "infinity", "-infinity", "nan"):
        return None
    try:
        d = Decimal(cleaned).quantize(Decimal("0.01"))
    except (InvalidOperation, ValueError):
        return None
    if abs(d) >= Decimal(10) ** 13:  # DECIMAL(15,2) overflow -> null
        return None
    return d


def _eval_batch(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@SETTINGS
@given(
    st.lists(
        st.floats(min_value=-1e12, max_value=1e12, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    )
)
def test_rescale_pipeline_matches_reference_double_application(spark, values):
    """The composed (double) rescale must match the reference's converter+
    validator chain for ALL doubles — including the v<1 corner where a single
    application is NOT idempotent (found by hypothesis; see
    scalars.rescale_millions_pipeline)."""
    rows = [(v,) for v in values]
    out = _eval_batch(spark, scalars.rescale_millions_pipeline(F.col("v")), rows, "v double")
    assert out == [ref_rescale_pipeline(v) for v in values]


@SETTINGS
@given(
    st.lists(
        st.floats(min_value=1.0, max_value=1e12, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    )
)
def test_rescale_single_idempotent_for_v_ge_1(spark, values):
    """For v >= 1 one application already exceeds 1e6, so the heuristic is
    idempotent on the realistic domain (SURVEY §7.4)."""
    rows = [(v,) for v in values]
    once = _eval_batch(spark, scalars.rescale_millions(F.col("v")), rows, "v double")
    twice = _eval_batch(
        spark, scalars.rescale_millions(scalars.rescale_millions(F.col("v"))), rows, "v double"
    )
    assert once == twice


@SETTINGS
@given(
    st.lists(
        # years < 1000: Python strptime accepts 3-digit %Y, Spark's yyyy
        # pattern doesn't — documented deviation (financial dates are modern)
        st.dates(min_value=datetime.date(1000, 1, 1), max_value=datetime.date(9999, 12, 31)),
        min_size=1,
        max_size=50,
    )
)
def test_date_parse_roundtrips_every_accepted_format(spark, dates):
    rows = [(d.isoformat(), d.strftime("%m/%d/%Y"), d.isoformat() + " 13:45:00") for d in dates]
    for col in ("iso", "us", "ts"):
        out = _eval_batch(
            spark, scalars.parse_date_multi(F.col(col)), rows, "iso string, us string, ts string"
        )
        assert out == list(dates), col


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(["N/A", "n/a", "-", "", "inf", "-inf", "nan", "junk", "12a3"]),
            st.decimals(
                min_value=Decimal("-1e13"), max_value=Decimal("1e13"), places=2
            ).map(lambda d: f"{d:,}"),
            st.decimals(min_value=-1000, max_value=1000, places=2).map(lambda d: f"${d}"),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_clean_cast_matches_python_reference(spark, values):
    rows = [(v,) for v in values]
    out = _eval_batch(spark, scalars.safe_decimal(F.col("v"), 15, 2), rows, "v string")
    expected = [ref_clean_cast(v) for v in values]
    assert out == expected


@SETTINGS
@given(st.lists(st.dates(), min_size=1, max_size=50))
def test_quarter_label_always_valid_pattern(spark, dates):
    rows = [(d,) for d in dates]
    out = _eval_batch(spark, scalars.quarter_label(F.col("v")), rows, "v date")
    for d, label in zip(dates, out):
        assert re.fullmatch(r"\d{1,4}-Q[1-4]", label)
        assert label == f"{d.year}-Q{(d.month - 1) // 3 + 1}"


@SETTINGS
@given(
    st.lists(
        st.one_of(st.integers(min_value=0, max_value=2**62), st.text(max_size=30)),
        min_size=1,
        max_size=40,
    )
)
def test_stable_bucket_is_engine_portable(spark, keys):
    """sampling.stable_bucket must compute the IDENTICAL bucket in DuckDB
    (the oracle twin) for arbitrary keys — the property that makes hash
    sampling reproducible across engines."""
    import duckdb

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import sampling

    rows = [(str(k),) for k in keys]
    spark_out = _eval_batch(
        spark, sampling.stable_bucket(F.col("v"), 10_000), rows, "v string"
    )
    con = duckdb.connect()
    duck_out = [
        con.execute(
            "SELECT TRY_CAST('0x' || substr(md5(?), 1, 8) AS BIGINT) % 10000", [str(k)]
        ).fetchone()[0]
        for k in keys
    ]
    assert spark_out == duck_out


# -- round-3 properties (VERDICT r2 item 6): as-of ties, prefix-sum edges ----


@SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),          # right ts (dups likely)
            st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                           allow_nan=False, width=64)),  # px (nullable)
            st.integers(min_value=0, max_value=10),           # tiebreak
        ),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_reference_under_ties_and_null_payloads(spark, lts, rrows):
    """Duplicate right timestamps AND null payload values: the matched row is
    (max rts <= lts, then max tiebreak), and BOTH payload columns must come
    from that single row — a NULL there stays NULL (struct forward-fill)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import asof

    left = spark.createDataFrame(
        [(i, t, "k") for i, t in enumerate(lts)], "lid long, ts long, k string"
    )
    right = spark.createDataFrame(
        [(t, px, float(tb), "k") for t, px, tb in rrows],
        "qts long, px double, tb double, k string",
    )
    out = {
        r.lid: (r.px, r.tb)
        for r in asof.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="qts",
            payload_cols=["px", "tb"], right_tiebreak="tb",
        ).collect()
    }

    def ref(lt):
        cand = [r for r in rrows if r[0] <= lt]
        if not cand:
            return (None, None)
        best_ts = max(r[0] for r in cand)
        at_ts = [r for r in cand if r[0] == best_ts]
        best = max(at_ts, key=lambda r: r[2])
        return (best[1], float(best[2]))

    assert len(out) == len(lts)
    for i, lt in enumerate(lts):
        assert out[i] == ref(lt), (i, lt, out[i], ref(lt))


@SETTINGS
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=8),
)
def test_global_cumsum_exact_under_empty_range_partitions(spark, vals, nparts):
    """repartitionByRange with fewer rows/distinct keys than partitions
    leaves EMPTY partitions; the two-pass offset join must still produce the
    exact global running total (including duplicate and negative values)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import packing

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(nparts)
    got = {
        r.k: r.cum
        for r in packing.global_cumsum(df, ["k"], "v").collect()
    }
    run = 0
    for i, v in enumerate(vals):
        run += v
        assert got[i] == run, (i, got[i], run)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            # printable unicode incl. multi-byte; exclude whitespace
            # beyond ' ' (the tokenizer's split axis) and surrogates
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc", "Zl", "Zp"),
            ),
            min_size=1,
            max_size=40,
        ).filter(lambda t: t.strip() != ""),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_byte_fallback_roundtrip_any_unicode(spark, texts):
    """r9 byte-fallback property: decode(encode(x)) recovers the
    whitespace-normalized lowercased input for ARBITRARY unicode — every
    out-of-alphabet symbol (any codepoint the tiny training corpus never
    saw) must round-trip through its UTF-8 byte tokens, multi-byte
    characters decoding only as whole runs. One documented exclusion: text
    that literally spells a byte token ('<0xNN>') is ambiguous at the
    string level (see bpe_decode's docstring)."""
    import re as _re

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    docs_rows = []
    want = {}
    for i, t in enumerate(texts):
        # the tokenizer lowercases and splits on whitespace; normalize the
        # expectation the same way — with the ENGINE's whitespace class:
        # Java/Spark \s (and DuckDB's RE2 \s in the oracles) is the ASCII
        # [ \t\n\x0B\f\r], so U+00A0 and friends are WORD CONTENT the
        # byte fallback carries losslessly, not separators. Python's
        # str.split() is unicode-aware and would wrongly drop them
        # (hypothesis found '0\xa0' in r10). Skip the documented
        # literal-byte-token ambiguity.
        norm = " ".join(
            w for w in _re.split(r"[ \t\n\x0b\f\r]+", t.lower()) if w
        )
        if not norm or _re.search(r"<0x[0-9A-F]{2}>", norm):
            continue
        docs_rows.append((i, t))
        want[i] = norm
    if not docs_rows:
        return
    if "_BPE_PROP" not in globals():
        train = spark.createDataFrame(
            [(100, "banana bandana"), (101, "banana cabana")],
            "doc_id long, text string",
        )
        merges_df, vocab = tx.bpe_train(
            train, n_merges=2, return_vocab=True, eow="</w>"
        )
        globals()["_BPE_PROP"] = (
            [(r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()],
            vocab.localCheckpoint(eager=True),
        )
    merges, vocab = globals()["_BPE_PROP"]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    enc = tx.bpe_encode_ids(
        docs, vocab, merges=merges, eow="</w>", byte_fallback=True
    )
    got = {
        r.doc_id: r.text
        for r in tx.bpe_decode(enc, vocab, eow="</w>", byte_fallback=True).collect()
    }
    assert got == want
