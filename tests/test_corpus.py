"""Corpus-hygiene operators: repetition signals and benchmark
decontamination (plans/registry_corpus.py, operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import decontam as dc
from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx


def test_dup_ngram_fraction_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # trigrams: aba bab aba bab -> 2/4 duplicated
            (2, "one two three four five"),  # all trigrams distinct
            (3, "x y"),  # shorter than n -> single joined gram, fraction 0
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", tx.dup_ngram_fraction(F.col("text"), 3).alias("f")
        ).collect()
    }
    assert out[1] == 0.5
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_ngrams_multiplicity_vs_shingles_distinct(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id int, text string")
    row = df.select(
        F.size(tx.ngrams(F.col("text"), 3)).alias("all"),
        F.size(tx.shingles(F.col("text"), 3)).alias("distinct"),
    ).collect()[0]
    assert row["all"] == 4 and row["distinct"] == 2


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    docs = spark.createDataFrame(
        [
            # shares the 5-gram "quick brown fox jumps over"
            (1, "she saw the quick brown fox jumps over a fence today"),
            # no 5-token span in common
            (2, "completely different text with no overlap at all here"),
            # shorter than n: only its full-text gram, which is not in bench
            (3, "quick brown fox"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["bench_hits"], r["contaminated"])
        for r in dc.decontaminate(docs, bench, n=5).collect()
    }
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_decontaminate_exact_hit_count(spark):
    # doc 1 repeats the matching 5-gram twice -> still ONE distinct hit
    bench = spark.createDataFrame([(0, "a b c d e")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e x a b c d e")], "doc_id int, text string"
    )
    row = dc.decontaminate(docs, bench, n=5).collect()[0]
    assert row["bench_hits"] == 1 and row["contaminated"] is True


def test_decontaminate_tolerates_duplicate_doc_ids(spark):
    """ADVICE r2: duplicate ids must neither double-count hits nor fan out —
    one output row per distinct id, hits counted over distinct (id, gram)."""
    bench = spark.createDataFrame([(0, "a b c d e")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (1, "a b c d e"), (2, "no overlap at all here x")],
        "doc_id int, text string",
    )
    rows = dc.decontaminate(docs, bench, n=5).collect()
    assert len(rows) == 2
    out = {r["doc_id"]: r["bench_hits"] for r in rows}
    assert out == {1: 1, 2: 0}


def test_repetition_signals_keep_split(spark, sf_dir):
    """The registered query must produce BOTH keep classes on the test corpus
    (thresholds were picked against the real distribution)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import load_registry

    fn, _ = load_registry()["x5_repetition_signals"]
    flags = {r["keep"] for r in fn(spark, sf_dir).select("keep").distinct().collect()}
    assert flags == {True, False}


def test_funnel_chained_semantics(spark):
    """A stray step-2 event BEFORE step 1 must not satisfy the funnel; a
    later one must. User 1 completes; user 2's only view precedes signup."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import funnel as fu

    rows = [
        (1, 10, "signup"), (1, 20, "view"),
        (2, 10, "view"), (2, 15, "signup"),
        (3, 5, "signup"), (3, 5, "view"),  # same-timestamp: >= admits it
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts long, event_type string")
    out = {r["step"]: r["users"] for r in fu.funnel_counts(ev, ["signup", "view"]).collect()}
    assert out == {"signup": 3, "view": 2}


def test_funnel_counts_monotone(spark, sf_dir):
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import load_registry

    fn, _ = load_registry()["evt_funnel"]
    rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r["step_idx"])
    users = [r["users"] for r in rows]
    assert users == sorted(users, reverse=True)
    assert users[0] > 0


def test_incremental_rollup_merge_equals_full(spark, sf_dir):
    """Merging per-slice states (any split, any order) must equal the full
    recompute exactly."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import incremental as inc
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    ev = src.load_events(spark, sf_dir).withColumn("b", F.col("event_id") % 3)
    slices = [
        inc.rollup_state(ev.filter(F.col("b") == i), ["event_type"], F.col("value"))
        for i in range(3)
    ]
    full = inc.finalize(inc.rollup_state(ev, ["event_type"], F.col("value")))
    merged = inc.finalize(inc.merge_rollups(*slices))
    merged_rev = inc.finalize(inc.merge_rollups(*reversed(slices)))
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(merged) == canon(full)
    assert canon(merged_rev) == canon(full)


def test_chunk_documents_overlap_and_tail(spark):
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx2

    toks = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame([(1, toks), (2, "solo")], "doc_id long, text string")
    out = tx2.chunk_documents(docs, chunk_tokens=4, overlap=2)  # step 2
    rows = {(r.doc_id, r.chunk_ix): (r.n_tokens, r.chunk_text) for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 -> 5 chunks; last is the 2-token tail
    assert [rows[(1, i)][0] for i in range(5)] == [4, 4, 4, 4, 2]
    assert rows[(1, 0)][1] == "t0 t1 t2 t3"
    assert rows[(1, 1)][1] == "t2 t3 t4 t5"  # 2-token overlap
    assert rows[(1, 4)][1] == "t8 t9"
    # single-token doc -> exactly one chunk
    assert rows[(2, 0)] == (1, "solo")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tx2.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_mixing_weights_custom_targets(spark):
    """mixing_weights: shares sum to 1, resample_factor = target/actual, and
    groups missing from an explicit target map get share 0 (excluded)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import sampling

    rows = [(i, "a" if i < 6 else ("b" if i < 9 else "c"), 10.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    out = sampling.mixing_weights(
        df, "source", weight=F.col("w"), target_shares={"a": 0.5, "b": 0.5}
    )
    got = {r["source"]: r for r in out.collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["docs"] == 6 and got["a"]["budget"] == 60.0
    assert abs(got["a"]["actual_share"] - 0.6) < 1e-9
    assert abs(got["a"]["resample_factor"] - 0.5 / 0.6) < 1e-6
    assert abs(got["b"]["resample_factor"] - 0.5 / 0.3) < 1e-6
    assert got["c"]["target_share"] == 0.0 and got["c"]["resample_factor"] == 0.0

    # uniform default: every target share is 1/3
    uni = {r["source"]: r for r in sampling.mixing_weights(df, "source").collect()}
    assert all(abs(r["target_share"] - 1 / 3) < 1e-6 for r in uni.values())
    # budget defaults to doc counts
    assert uni["a"]["budget"] == 6.0


def test_bpe_train_matches_reference_and_handles_runs(spark):
    """text.bpe_train == a pure-Python reference implementing the same
    word-frequency BPE with leftmost-nonoverlapping-replace-to-fixpoint
    merge semantics — including same-symbol runs ('aaaa'), the
    (count DESC, pair ASC) tie-break, and merges built on merges."""
    import collections

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "aaaa aaaa the",
        "zzz zzz zzz",  # 'z z' weighted 6 — exact tie with 'a a'
    ]

    def reference(texts, n_merges):
        wf = collections.Counter()
        for t in texts:
            for w in t.lower().split():
                if w and len(w) <= 64:
                    wf[" ".join(w)] += 1
        out = []
        for rank in range(1, n_merges + 1):
            pc = collections.Counter()
            for sym, freq in wf.items():
                s = sym.split(" ")
                for i in range(len(s) - 1):
                    pc[s[i] + " " + s[i + 1]] += freq
            if not pc:
                break
            pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merged = pair.replace(" ", "")
            out.append((rank, pair, merged, cnt))
            new = collections.Counter()
            for sym, freq in wf.items():
                s = " " + sym + " "
                while True:  # leftmost non-overlapping, to fixpoint
                    s2 = s.replace(f" {pair} ", f" {merged} ")
                    if s2 == s:
                        break
                    s = s2
                new[s.strip()] += freq
            wf = new
        return out

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (1, 3, 6):
        got = sorted(tuple(r) for r in tx.bpe_train(docs, n_merges=n).collect())
        want = sorted(reference(texts, n))
        assert got == want, (n, got, want)
    # tie-break pinned: 'a a' (from the aaaa runs, weighted 6) and 'z z'
    # (from zzz x3, weighted 6) tie on count; pair ASC picks 'a a' first
    ranks = {r.merge_rank: (r.pair, r.pair_count)
             for r in tx.bpe_train(docs, n_merges=2).collect()}
    assert ranks[1] == ("a a", 6) and ranks[2] == ("z z", 6)


def test_bpe_token_counts_vocab_join_and_oov_fallback(spark):
    """bpe_token_counts encodes via the trained vocabulary: merged words
    count their symbol count, out-of-vocab words (longer than the
    trainer's max_word_len) fall back to character count."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    long_word = "q" * 70  # excluded from training (max_word_len=64)
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa"), (2, "aaaa " + long_word), (3, "xy")],
        "doc_id long, text string",
    )
    merges, vocab = tx.bpe_train(docs, n_merges=2, return_vocab=True)
    got_merges = [(r.pair, r.merged) for r in merges.orderBy("merge_rank").collect()]
    assert got_merges == [("a a", "aa"), ("aa aa", "aaaa")]
    out = {r.doc_id: (r.bpe_tokens, r.n_words)
           for r in tx.bpe_token_counts(docs, vocab).collect()}
    # 'aaaa' -> 'aa aa' -> 'aaaa': 1 symbol; long_word OOV -> 70 chars
    assert out == {1: (3, 3), 2: (1 + 70, 2), 3: (2, 1)}


def test_bpe_oracle_noop_rounds_match_engine(spark):
    """When a merge round finds NO pair (fewer pairs than n_merges), the
    engine breaks out of the loop keeping the completed rounds' vocab; the
    unrolled oracle's remaining rounds must be no-ops — not NULL out every
    symbol (the COALESCE('') guard) — so train AND encode stay parity-green
    on degenerate corpora."""
    import duckdb

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx
    from tesla_competitive_intelligence_etl_pipeline_spark.plans.registry_corpus import (
        _bpe_oracle_sql,
    )

    rows = [(1, "ab ab x"), (2, "ab")]  # exactly ONE learnable pair: 'a b'
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    # train: engine stops after round 1; oracle emits rows only from b1
    merges, vocab = tx.bpe_train(docs, n_merges=3, return_vocab=True)
    got = sorted(tuple(r) for r in merges.collect())
    want = sorted(con.execute(_bpe_oracle_sql(3)).fetchall())
    assert got == want == [(1, "a b", "ab", 3)]
    # encode: merged words count 1 symbol, not their char-count fallback
    enc = sorted(
        tuple(r) for r in tx.bpe_token_counts(docs, vocab).collect()
    )
    want_enc = sorted(con.execute(_bpe_oracle_sql(3, encode=True)).fetchall())
    assert enc == want_enc == [(1, 3, 3), (2, 1, 1)]


def test_bpe_apply_merges_is_trainer_consistent_and_oov_capable(spark):
    """VERDICT r7 item 1: encoding applies the LEARNED merges in rank
    order (the trainer's own rewrite), so (a) every in-vocab word
    re-encodes to exactly its trained spelling, (b) out-of-vocab words
    get real merge application instead of the char-count fallback, and
    (c) the Arrow-batched udf twin is byte-identical to the expression
    form."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana banana cabana")],
        "doc_id long, text string",
    )
    merges_df, vocab = tx.bpe_train(docs, n_merges=3, return_vocab=True)
    merges = [(r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()]

    # (a) trainer-consistency: re-encoding the vocab's own words
    # reproduces the trained spellings exactly, both forms
    expr = vocab.select(
        "word", "sym",
        tx.bpe_apply_merges(F.col("word"), merges).alias("re_expr"),
        tx.bpe_apply_merges_udf(merges)(F.col("word")).alias("re_udf"),
    ).collect()
    for r in expr:
        assert r.re_expr == r.sym, (r.word, r.re_expr, r.sym)
        assert r.re_udf == r.sym, (r.word, r.re_udf, r.sym)

    # (b) an OOV word exercises the merges: token counts under
    # merges= differ from the char-count fallback
    heldout = spark.createDataFrame(
        [(9, "bananarama")], "doc_id long, text string"
    )
    with_merges = tx.bpe_token_counts(heldout, vocab, merges=merges_df).first()
    char_fallback = tx.bpe_token_counts(heldout, vocab).first()
    assert char_fallback.bpe_tokens == 10  # legacy: length of the word
    assert with_merges.bpe_tokens < 10  # merges genuinely compress
    # and equals a direct application of the merge list
    n_direct = len(
        spark.range(1)
        .select(tx.bpe_apply_merges(F.lit("bananarama"), merges).alias("s"))
        .first()["s"].split(" ")
    )
    assert with_merges.bpe_tokens == n_direct

    # (c) expression-form cap: past BPE_EXPR_MAX_MERGES the expression
    # builder refuses (use the udf twin)
    import pytest

    too_many = [(f"q{i} r{i}", f"q{i}r{i}") for i in range(tx.BPE_EXPR_MAX_MERGES + 1)]
    with pytest.raises(ValueError, match="expression-form"):
        tx.bpe_apply_merges(F.lit("x"), too_many)


def test_bpe_train_eow_marker_matches_reference(spark):
    """VERDICT r7 item 2: eow='</w>' appends the marker as ONE atomic
    symbol, so end-of-word merges are learned distinctly — pinned against
    the same pure-Python reference with the marker appended, and the
    trained syms all terminate in the marker (or a merge absorbing it)."""
    import collections

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    texts = ["low lower lowest", "low low newer newest", "wider wide wide"]

    def reference(texts, n_merges, eow):
        wf = collections.Counter()
        for t in texts:
            for w in t.lower().split():
                if w and len(w) <= 64:
                    wf[" ".join(list(w) + [eow])] += 1
        out = []
        for rank in range(1, n_merges + 1):
            pc = collections.Counter()
            for sym, freq in wf.items():
                s = sym.split(" ")
                for i in range(len(s) - 1):
                    pc[s[i] + " " + s[i + 1]] += freq
            if not pc:
                break
            pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merged = pair.replace(" ", "")
            out.append((rank, pair, merged, cnt))
            new = collections.Counter()
            for sym, freq in wf.items():
                s = " " + sym + " "
                while True:
                    s2 = s.replace(f" {pair} ", f" {merged} ")
                    if s2 == s:
                        break
                    s = s2
                new[s.strip()] += freq
            wf = new
        return out

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (1, 4):
        got = sorted(
            tuple(r) for r in tx.bpe_train(docs, n_merges=n, eow="</w>").collect()
        )
        want = sorted(reference(texts, n, "</w>"))
        assert got == want, (n, got, want)

    # marker survives as a whole symbol in the vocab (never split)
    _, vocab = tx.bpe_train(docs, n_merges=2, eow="</w>", return_vocab=True)
    for r in vocab.collect():
        assert r.sym.endswith("</w>"), r
        assert "< /" not in r.sym and "/ w" not in r.sym

    # encoder mirrors the marker: in-vocab words re-encode exactly
    merges_df, vocab = tx.bpe_train(docs, n_merges=3, eow="</w>", return_vocab=True)
    merges = [(r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()]
    from pyspark.sql import functions as F

    for r in vocab.select(
        "sym", tx.bpe_apply_merges(F.col("word"), merges, eow="</w>").alias("re")
    ).collect():
        assert r.re == r.sym

    # a space-containing marker is rejected (it would split into symbols)
    import pytest

    with pytest.raises(ValueError, match="spaces"):
        tx.bpe_train(docs, n_merges=1, eow="< w>").collect()


def test_bpe_encode_ids_roundtrip_and_unk(spark):
    """X-5n: token-id sequences are order-exact and, with the eow marker,
    losslessly decodable — decode(encode(x)) == whitespace-normalized
    lowercased x; symbols outside the trained alphabet encode as -1 and
    decode as '<unk>'; markerless decode glues symbols (boundaries are
    unrecoverable without the marker, which is the point of having one)."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    texts = ["Banana bandana", "cabana banana banana", "abba dab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df, vocab = tx.bpe_train(
        docs, n_merges=3, eow="</w>", return_vocab=True
    )
    enc = tx.bpe_encode_ids(docs, vocab, merges=merges_df, eow="</w>")
    dec = {
        r.doc_id: r.text
        for r in tx.bpe_decode(enc, vocab, eow="</w>").collect()
    }
    for i, t in enumerate(texts):
        assert dec[i] == " ".join(t.lower().split()), (i, dec[i])

    # ids are dense over the trained alphabet, sequences ordered: encoding
    # the same doc twice is deterministic
    a = {r.doc_id: r.token_ids for r in enc.collect()}
    b = {
        r.doc_id: r.token_ids
        for r in tx.bpe_encode_ids(docs, vocab, merges=merges_df, eow="</w>").collect()
    }
    assert a == b
    symtab = {r.symbol: r.tok_id for r in tx.bpe_symbol_table(vocab).collect()}
    assert sorted(symtab.values()) == list(range(len(symtab)))

    # unk: digits never appeared in training -> -1 -> '<unk>'
    held = spark.createDataFrame([(9, "banana42")], "doc_id long, text string")
    enc9 = tx.bpe_encode_ids(held, vocab, merges=merges_df, eow="</w>")
    ids = enc9.first()["token_ids"]
    assert -1 in ids
    out9 = tx.bpe_decode(enc9, vocab, eow="</w>").first()["text"]
    assert "<unk>" in out9

    # markerless decode glues symbols (no boundary information)
    m2, v2 = tx.bpe_train(docs, n_merges=2, return_vocab=True)
    e2 = tx.bpe_encode_ids(docs, v2, merges=m2)
    glued = {r.doc_id: r.text for r in tx.bpe_decode(e2, v2).collect()}
    for i, t in enumerate(texts):
        assert glued[i] == "".join(t.lower().split()), (i, glued[i])


def test_bpe_byte_fallback_roundtrip_lossless(spark):
    """r9 (VERDICT r8 item 6): byte_fallback extends the alphabet with
    the 256 <0xNN> byte tokens, so out-of-alphabet symbols — digits in a
    letters-only corpus, multi-byte emoji — encode as byte ids instead
    of -1, and decode(encode(x)) is lossless on a digits-and-emoji
    corpus. Default off keeps the unk pins byte-identical."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    train = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana cabana")],
        "doc_id long, text string",
    )
    merges_df, vocab = tx.bpe_train(train, n_merges=2, return_vocab=True, eow="</w>")

    held = spark.createDataFrame(
        [(9, "banana42 café \U0001f600ok"), (10, "42 \U0001f680")],
        "doc_id long, text string",
    )
    enc = tx.bpe_encode_ids(
        held, vocab, merges=merges_df, eow="</w>", byte_fallback=True
    )
    rows = {r.doc_id: r for r in enc.collect()}
    assert all(i >= 0 for r in rows.values() for i in r.token_ids)
    # the emoji costs 4 byte tokens, the digit 1 each
    out = {
        r.doc_id: r.text
        for r in tx.bpe_decode(
            enc, vocab, eow="</w>", byte_fallback=True
        ).collect()
    }
    assert out[9] == "banana42 café \U0001f600ok"
    assert out[10] == "42 \U0001f680"

    # byte ids are real table entries: symbol table carries 256 extras
    n_plain = tx.bpe_symbol_table(vocab).count()
    n_ext = tx.bpe_symbol_table(vocab, byte_fallback=True).count()
    assert n_ext == n_plain + 256

    # default off: unchanged unk behavior
    enc_unk = tx.bpe_encode_ids(held, vocab, merges=merges_df, eow="</w>")
    assert -1 in enc_unk.filter(F.col("doc_id") == 9).first()["token_ids"]


def test_bpe_udf_regime_encodes_each_distinct_oov_once(spark, monkeypatch):
    """r9 (VERDICT r8 item 4): past BPE_EXPR_MAX_MERGES the Arrow encoder
    runs once per DISTINCT OOV word (spellings joined back), not once per
    occurrence — pinned with a row-counting accumulator twin — and the
    results equal the expression regime on the same effective merges
    (the pad merges never match)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    train = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana cabana")],
        "doc_id long, text string",
    )
    merges_df, vocab = tx.bpe_train(train, n_merges=2, return_vocab=True)
    real = [(r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()]
    # pad past the expression cap with merges that can never match
    padded = real + [
        (f"q{i} r{i}", f"q{i}r{i}") for i in range(tx.BPE_EXPR_MAX_MERGES + 1)
    ]
    assert len(padded) > tx.BPE_EXPR_MAX_MERGES

    acc = spark.sparkContext.accumulator(0)

    def counting_factory(merges, eow=None):
        frozen = [(f" {p} ", f" {m} ") for p, m in merges]
        suffix = f" {eow}" if eow else ""

        @pandas_udf("string")
        def _apply(words):
            acc.add(len(words))

            def enc(w):
                s = " " + " ".join(w) + suffix + " "
                for pat, rep in frozen:
                    while pat in s:
                        s = s.replace(pat, rep)
                return s.strip()

            return words.map(enc)

        return _apply

    monkeypatch.setattr(tx, "bpe_apply_merges_udf", counting_factory)

    # ONE distinct OOV word, repeated 40 times across two docs
    held = spark.createDataFrame(
        [(9, " ".join(["bananarama"] * 25) + " banana"),
         (10, " ".join(["bananarama"] * 15))],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in tx.bpe_encode_ids(held, vocab, merges=padded).collect()
    )
    assert acc.value == 1  # 40 occurrences, one Python evaluation

    # correctness: equals the expression regime on the real merges
    want = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in tx.bpe_encode_ids(held, vocab, merges=real).collect()
    )
    assert got == want

    # token counts share the distinct-word shape
    acc2 = spark.sparkContext.accumulator(0)

    def counting_factory2(merges, eow=None):
        frozen = [(f" {p} ", f" {m} ") for p, m in merges]
        suffix = f" {eow}" if eow else ""

        @pandas_udf("string")
        def _apply(words):
            acc2.add(len(words))

            def enc(w):
                s = " " + " ".join(w) + suffix + " "
                for pat, rep in frozen:
                    while pat in s:
                        s = s.replace(pat, rep)
                return s.strip()

            return words.map(enc)

        return _apply

    monkeypatch.setattr(tx, "bpe_apply_merges_udf", counting_factory2)
    cnt = sorted(
        tuple(r) for r in tx.bpe_token_counts(held, vocab, merges=padded).collect()
    )
    assert acc2.value == 1
    want_cnt = sorted(
        tuple(r) for r in tx.bpe_token_counts(held, vocab, merges=real).collect()
    )
    assert cnt == want_cnt


def test_bpe_train_stop_rules(spark):
    """r10 stop rules: target_vocab trains exactly |target| - |alphabet|
    merges (each merge adds one symbol — the final vocabulary hits the
    target exactly), min_pair_count BREAKS before a sub-floor merge, the
    two compose (whichever binds first), and degenerate values (target
    below the alphabet, floor above every count) train zero merges."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat the cats sat") for i in range(6)],
        "doc_id long, text string",
    )
    alpha = (
        tx.bpe_train(docs, n_merges=0, return_vocab=True)[1]
        .select(F.explode(F.split("sym", " ")).alias("s"))
        .distinct()
        .count()
    )
    # plain n_merges baseline for comparison
    base = [tuple(r) for r in tx.bpe_train(docs, n_merges=4).collect()]
    assert len(base) == 4

    # target_vocab = alphabet + 3 -> exactly 3 merges, the first 3 of base
    # (the NOMINAL vocabulary — alphabet + one entry per merge — hits the
    # target; the realized symbol table can be smaller when a merge
    # consumes every occurrence of a base symbol, e.g. 't' after 'th')
    m, vocab = tx.bpe_train(docs, target_vocab=alpha + 3, return_vocab=True)
    got = [tuple(r) for r in m.collect()]
    assert got == base[:3]
    n_syms = (
        vocab.select(F.explode(F.split("sym", " ")).alias("s"))
        .distinct()
        .count()
    )
    assert n_syms <= alpha + 3

    # min_pair_count: floor strictly between round counts -> break there
    counts = [t[3] for t in base]
    assert counts == sorted(counts, reverse=True) and counts[1] > counts[3]
    # exact semantics: learned merges are precisely the prefix with
    # cnt >= floor up to the first violation, for every candidate floor
    for floor in sorted({c for c in counts}) + [counts[0] + 1]:
        want_f = []
        for t in base:
            if t[3] < floor:
                break
            want_f.append(t)
        got_f = [
            tuple(r)
            for r in tx.bpe_train(
                docs, n_merges=4, min_pair_count=floor
            ).collect()
        ]
        assert got_f == want_f, floor
    floor = counts[2]

    # composition: the earlier stop wins
    both = [tuple(r) for r in tx.bpe_train(
        docs, target_vocab=alpha + 1, min_pair_count=floor).collect()]
    assert both == base[:1]

    # degenerate: nothing to learn
    assert tx.bpe_train(docs, target_vocab=alpha).count() == 0
    assert tx.bpe_train(docs, target_vocab=5).count() == 0
    assert tx.bpe_train(docs, n_merges=4, min_pair_count=counts[0] + 1).count() == 0


def test_bpe_train_local_matches_distributed_and_scales(spark, sf_dir):
    """r12 (VERDICT r11 item 2): the driver-local merge loop
    (strategy='local') produces BIT-IDENTICAL merge lists to the
    distributed one-Spark-job-per-merge path — across eow, gpt2
    pre-tokenization, min_pair_count, and target_vocab — and removes the
    per-merge round-trip ceiling: 500 merges at gate scale train in
    seconds (the distributed path's ~0.3-0.5 s/round would take minutes;
    a 32-64k production vocab, hours). BPE merge lists are prefix-stable
    (round k depends only on rounds 1..k-1), so the 500-merge run's
    prefix must equal the distributed 64-merge list exactly."""
    import time

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def merges(**kw):
        return [tuple(r) for r in tx.bpe_train(docs, **kw).collect()]

    # exact equivalence across the trainer's option space (modest depth
    # so the distributed side stays test-budget-friendly)
    for kw in (
        dict(n_merges=6),
        dict(n_merges=6, eow="</w>"),
        dict(n_merges=6, pretokenize="gpt2"),
        dict(n_merges=8, min_pair_count=2000),
        dict(target_vocab=30),
    ):
        assert merges(strategy="local", **kw) == merges(**kw), kw

    # return_vocab: the final (word, sym) dictionaries agree exactly
    _, v_d = tx.bpe_train(docs, n_merges=6, return_vocab=True)
    _, v_l = tx.bpe_train(docs, n_merges=6, return_vocab=True,
                          strategy="local")
    assert sorted(tuple(r) for r in v_d.collect()) == sorted(
        tuple(r) for r in v_l.collect())

    # depth: distributed at 64 merges == the local 500-merge run's prefix.
    # The natural gate corpus exhausts its pair space at ~89 merges (small
    # real vocabulary, words fully collapse), so widen the dictionary with
    # deterministic hex words — 3000 distinct 6-char words guarantee well
    # over 500 learnable merges (each distinct word's final collapse is
    # its own merge product) while the data volume stays gate-sized.
    from pyspark.sql import functions as F

    wide = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            *[
                x
                for j in range(6)
                for x in (
                    F.lit(" "),
                    F.lpad(F.hex(F.col("doc_id") * 6 + j), 6, "0"),
                )
            ],
        ),
    )

    def wmerges(**kw):
        return [tuple(r) for r in tx.bpe_train(wide, **kw).collect()]

    deep_d = wmerges(n_merges=64)
    t0 = time.monotonic()
    deep_l = wmerges(n_merges=500, strategy="local")
    local_sec = time.monotonic() - t0
    assert len(deep_l) == 500  # the corpus supports the full budget
    assert deep_l[:64] == deep_d
    # "in seconds": one wf collect + 500 local rounds — generous ceiling
    # for CI noise, still an order under the distributed path's pace
    assert local_sec < 60, local_sec

    # budget guardrails: auto falls back to distributed over-budget
    # (identical answer), forced local refuses instead of OOMing
    assert merges(n_merges=6, strategy="auto", local_budget_rows=1) == merges(
        n_merges=6)
    import pytest

    with pytest.raises(ValueError, match="local_budget_rows"):
        tx.bpe_train(docs, n_merges=6, strategy="local", local_budget_rows=1)
    with pytest.raises(ValueError, match="strategy"):
        tx.bpe_train(docs, n_merges=6, strategy="bogus")
