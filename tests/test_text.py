"""Unit tests for the text pipeline: chunking quirks, split-merge control
flow, error absorption, and the summarize_news contract (SURVEY.md §2.10,
FIXTURES.md §4 edge rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tugas_2_big_data_spark.text.chunking import (
    naive_sentences,
    pack_chunks,
    whitespace_token_count,
)
from tugas_2_big_data_spark.text.summarize import summarize_long_text


def test_naive_sentences_no_period():
    # text with no '.' at all → one sentence, '.' appended (IQ*:30)
    assert naive_sentences("hello world") == ["hello world."]


def test_naive_sentences_strips_and_reappends():
    assert naive_sentences(" a b . c d .. ") == ["a b.", "c d."]


def test_naive_sentences_empty():
    assert naive_sentences("") == []
    assert naive_sentences("...") == []


def test_pack_chunks_boundary_exact():
    # boundary check is strictly `>`: a sentence landing exactly on
    # max_tokens stays in the current chunk (IQ*:36-43)
    text = "a b c. d e f."  # two sentences, 3+'.'≈ tokens each
    # each sentence = 3 words → counts 3; max=6 → both fit in one chunk
    chunks = pack_chunks(text, whitespace_token_count, max_tokens=6)
    assert chunks == ["a b c. d e f."]
    # max=5 → second sentence overflows → two chunks
    chunks = pack_chunks(text, whitespace_token_count, max_tokens=5)
    assert chunks == ["a b c.", "d e f."]


def test_pack_chunks_leading_oversized_sentence_quirk():
    # a FIRST sentence bigger than max_tokens flushes an empty chunk —
    # reference behavior preserved deliberately (current_chunk is empty
    # when the overflow check first fires, IQ*:36-38)
    text = "w1 w2 w3 w4 w5. short one."
    chunks = pack_chunks(text, whitespace_token_count, max_tokens=3)
    assert chunks == ["", "w1 w2 w3 w4 w5.", "short one."]


def test_summarize_short_path_single_call():
    calls = []

    def backend(text, max_length, min_length):
        calls.append((text, max_length, min_length))
        return "SUM"

    out = summarize_long_text("one two three", backend, whitespace_token_count)
    assert out == "SUM"
    assert calls == [("one two three", 250, 50)]


def test_summarize_split_merge_path():
    calls = []

    def backend(text, max_length, min_length):
        calls.append((max_length, min_length))
        return f"S{len(calls)}"

    # 30 sentences x 100 words = 3000 tokens > 1024 → split-merge
    text = ". ".join(" ".join(f"w{i}" for i in range(100)) for _ in range(30)) + "."
    out = summarize_long_text(text, backend, whitespace_token_count)
    # chunks summarized at (512, 30); final merge at (250, 50) — IQ*:70-86
    assert calls[:-1] == [(512, 30)] * (len(calls) - 1)
    assert calls[-1] == (250, 50)
    assert len(calls) >= 3  # at least 2 chunks + final
    assert out == f"S{len(calls)}"


def test_summarize_error_absorbed_to_empty():
    def backend(text, max_length, min_length):
        raise RuntimeError("model exploded")

    assert summarize_long_text("some text", backend, whitespace_token_count) == ""


def test_summarize_news_contract(spark):
    from tugas_2_big_data_spark.pipelines.iqplus import summarize_news

    rows = [
        ("b-title", "satu dua tiga. empat lima.", "10:00", "01/02/2025"),
        ("a-title", "", "11:00", "02/02/2025"),          # empty → ""
        ("c-title", "   ", "12:00", "03/02/2025"),       # whitespace → ""
    ]
    df = spark.createDataFrame(
        rows, ["judul", "konten", "waktu", "tanggal_artikel"]
    )
    out = summarize_news(df, order_by=["tanggal_artikel", "judul"]).collect()
    # output contract {index, judul, konten, rangkuman, waktu,
    # tanggal_artikel}; index gapless 1..N over the explicit sort key
    assert [r["index"] for r in out] == [1, 2, 3]
    assert out[0]["judul"] == "b-title"
    assert out[0]["rangkuman"] != ""
    assert out[1]["rangkuman"] == ""  # empty konten
    assert out[2]["rangkuman"] == ""  # whitespace konten
    assert set(out[0].asDict()) == {
        "index", "judul", "konten", "rangkuman", "waktu", "tanggal_artikel"
    }


@pytest.mark.slow
def test_bart_backend_construction_contract(monkeypatch):
    """Pin the real-model path's EXACT transformers invocation with a
    fake `transformers` module injected into sys.modules — provable
    with transformers absent. The reference constructs
    pipeline('summarization', model='facebook/bart-large-cnn',
    device=-1) once (iqplus_market_transform.py:26) and calls it with
    max_length/min_length per stage plus truncation=True (:55-61); a
    typo in any of these would otherwise hide behind the import gate
    until someone runs with 1.6 GB of weights."""
    import sys
    import types

    from tugas_2_big_data_spark.text.summarize import (
        bart_backend,
        summarize_long_text,
    )

    constructed = []
    infer_calls = []

    def fake_pipeline(task, model=None, device=None):
        constructed.append({"task": task, "model": model, "device": device})

        def summarizer(text, max_length=None, min_length=None, truncation=None):
            infer_calls.append(
                {
                    "max_length": max_length,
                    "min_length": min_length,
                    "truncation": truncation,
                }
            )
            return [{"summary_text": f"SUM{len(infer_calls)}"}]

        return summarizer

    fake_mod = types.ModuleType("transformers")
    fake_mod.pipeline = fake_pipeline
    monkeypatch.setitem(sys.modules, "transformers", fake_mod)

    backend = bart_backend()
    # construction: one pipeline, exact task/model id/CPU device
    assert constructed == [
        {
            "task": "summarization",
            "model": "facebook/bart-large-cnn",
            "device": -1,
        }
    ]
    # single-call path: (250, 50) + truncation, summary_text unwrapped
    out = backend("short text", 250, 50)
    assert out == "SUM1"
    assert infer_calls == [
        {"max_length": 250, "min_length": 50, "truncation": True}
    ]

    # split-merge path through the same backend: every chunk call at
    # (512, 30), the final merge at (250, 50) — all with truncation
    infer_calls.clear()
    text = (
        ". ".join(" ".join(f"w{i}" for i in range(100)) for _ in range(30))
        + "."
    )
    summarize_long_text(text, backend, whitespace_token_count)
    assert len(infer_calls) >= 3
    for c in infer_calls[:-1]:
        assert c == {"max_length": 512, "min_length": 30, "truncation": True}
    assert infer_calls[-1] == {
        "max_length": 250,
        "min_length": 50,
        "truncation": True,
    }
    # still exactly one pipeline construction (model loads once)
    assert len(constructed) == 1


def test_bart_backend_smoke(spark):
    """Real facebook/bart-large-cnn through the injectable-backend seam
    (reference iqplus_market_transform.py:25-26). Skipped wherever
    transformers/torch or the model weights are unavailable — the build
    container has neither; run with -m slow on a host that does."""
    pytest.importorskip("transformers")
    pytest.importorskip("torch")
    from tugas_2_big_data_spark.text.summarize import bart_backend, summarize_udf

    try:
        bart_backend()  # driver-side probe: weights present + loadable
    except Exception as e:  # pragma: no cover - network/weights missing
        pytest.skip(f"BART weights unavailable: {e}")
    docs = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog. " * 40)],
        ["doc_id", "konten"],
    )
    out = docs.withColumn(
        "rangkuman", summarize_udf(backend_factory=bart_backend)(F.col("konten"))
    ).collect()
    assert len(out) == 1 and len(out[0].rangkuman) > 0


def test_quality_logreg_monotone_and_maponly(spark):
    """Stopword-rich prose scores higher than punctuation/digit soup;
    the whole classifier is one map-only projection (no Exchange)."""
    from tugas_2_big_data_spark.operators.text_analysis import quality_logreg
    from tugas_2_big_data_spark.plans import inspect as pi

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a good day in the sun"),
            (2, "!!! ??? ### 123 456 789 $$$ %%% 000 111 222 333 !!!"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_logreg(docs).collect()}
    assert out[1].prob > out[2].prob
    assert 0.0 < out[2].prob < out[1].prob < 1.0
    # sigmoid consistency: prob = sigma(logit) for both rows
    import math

    for r in out.values():
        assert abs(r.prob - 1.0 / (1.0 + math.exp(-r.logit))) < 1e-6
    assert "Exchange" not in pi.explain_formatted(quality_logreg(docs))


def test_chunk_windows_coverage_and_overlap(spark):
    from tugas_2_big_data_spark.operators.text_analysis import chunk_windows

    words = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "   "), (4, "")],
        ["doc_id", "text"],
    )
    out = chunk_windows(df, max_tokens=64, overlap=8)
    rows = {r.doc_id: [] for r in out.collect()}
    for r in out.collect():
        rows[r.doc_id].append(r)
    # blank docs emit nothing
    assert 3 not in rows and 4 not in rows
    # short doc: one chunk, whole text
    assert len(rows[2]) == 1 and rows[2][0].chunk_text == "short doc"
    # 150 words, stride 56: starts 0,56,112 -> 3 chunks
    c = sorted(rows[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c] == [0, 1, 2]
    assert c[0].n_tokens == 64 and c[1].n_tokens == 64 and c[2].n_tokens == 38
    # overlap: last 8 tokens of chunk0 == first 8 of chunk1
    assert c[0].chunk_text.split()[-8:] == c[1].chunk_text.split()[:8]
    # full coverage: every word appears in some chunk
    covered = set()
    for r in c:
        covered.update(r.chunk_text.split())
    assert covered == set(words.split())


def test_unigram_logprob_values(spark):
    import math

    from tugas_2_big_data_spark.operators.text_analysis import unigram_logprob

    # corpus: 4 total words, p(a)=2/4, p(b)=1/4, p(c)=1/4
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "  ")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert 3 not in out  # blank doc: no words, no row
    exp1 = (-math.log2(2 / 4) + -math.log2(1 / 4)) / 2
    assert abs(out[1].mean_logprob - exp1) < 1e-12 and out[1].n_words == 2
    assert abs(out[2].mean_logprob - exp1) < 1e-12  # same shape (one a, one rare)


def test_boilerplate_sentences_df_threshold(spark):
    from tugas_2_big_data_spark.operators.text_analysis import (
        boilerplate_sentences,
    )

    common = "subscribe to our newsletter"
    rows = [(i, f"unique thought {i}. {common}.") for i in range(4)]
    rows.append((99, "entirely original essay. no shared lines here."))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in boilerplate_sentences(df, min_docs=3).collect()}
    for i in range(4):
        assert out[i].n_sentences == 2 and out[i].n_boilerplate == 1
        assert abs(out[i].boilerplate_frac - 0.5) < 1e-12
    assert out[99].n_boilerplate == 0


def test_bpe_merges_textbook_example(spark):
    """Hand-computed BPE on the classic low/lower corpus: merge order
    and counts must match the reference algorithm exactly (max pair
    count, ties on pair lexicographically)."""
    from tugas_2_big_data_spark.operators.text_analysis import bpe_merges

    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower newest")], ["doc_id", "text"]
    )
    got = [
        (r.round, r.w1, r.w2, r.merged, r.pair_count)
        for r in sorted(bpe_merges(df, n_merges=5).collect())
    ]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),
        (4, "low", "er", "lower", 2),
        (5, "e", "s", "es", 1),
    ]


def test_bpe_merges_exhausted_vocab_stops(spark):
    from tugas_2_big_data_spark.operators.text_analysis import bpe_merges

    df = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    out = bpe_merges(df, n_merges=10).collect()
    # only one possible merge (a,b); the loop must stop, not emit rows
    assert len(out) == 1 and out[0].merged == "ab"


def test_bpe_merges_checkpoint_dir_same_result(spark, tmp_path):
    from tugas_2_big_data_spark.operators.text_analysis import bpe_merges

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        ["doc_id", "text"],
    )
    base = [tuple(r) for r in bpe_merges(df, n_merges=3).collect()]
    ck = [
        tuple(r)
        for r in bpe_merges(
            df, n_merges=3, checkpoint_dir=str(tmp_path / "ckbpe")
        ).collect()
    ]
    assert base == ck and len(base) == 3


def test_char_entropy_known_values(spark):
    """Closed-form cases: one repeated symbol -> 0 bits; an even
    two-symbol mix -> 1 bit; four equiprobable symbols -> 2 bits;
    empty text emits no row."""
    import math

    from tugas_2_big_data_spark.operators.text_analysis import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aabb"), (3, "abcd"), (4, "   ")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.entropy_bits for r in char_entropy(docs).collect()}
    assert got.keys() == {1, 2, 3}
    assert got[1] == 0.0
    assert abs(got[2] - 1.0) < 1e-9
    assert abs(got[3] - 2.0) < 1e-9


def test_nb_learns_separable_classes(spark):
    """On a cleanly separable corpus the NB argmax must recover every
    held-out label, including docs containing unseen words (Laplace
    floor), and must not be swayed by the majority prior."""
    from tugas_2_big_data_spark.operators import text_analysis

    train = spark.createDataFrame(
        [(i, "en", "the cat sat on the mat") for i in range(8)]
        + [(100 + i, "fr", "le chat dort sur le tapis") for i in range(4)],
        ["doc_id", "lang", "text"],
    )
    test = spark.createDataFrame(
        [
            (200, "en", "the cat on the mat zzz"),  # zzz unseen anywhere
            (201, "fr", "le chat sur le tapis"),
            (202, "fr", "le tapis dort"),
        ],
        ["doc_id", "lang", "text"],
    )
    got = {
        r.doc_id: (r.pred_lang, r.correct)
        for r in text_analysis.naive_bayes_langid(train, test).collect()
    }
    assert got == {
        200: ("en", True),
        201: ("fr", True),
        202: ("fr", True),
    }


def test_bm25_ranking_contract(spark):
    """BM25 orders by relevance: a doc matching two query terms
    outranks a same-length doc matching one; a longer doc with the
    same tf is penalized by length normalization; docs with no query
    term are absent. Scores are 9-decimal-rounded for rank stability."""
    from tugas_2_big_data_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # both terms, short
            (2, "alpha alpha beta epsilon"),        # alpha x2 + beta
            (3, "zeta eta theta iota"),             # no match
            (4, "alpha beta " + "pad " * 20),       # both terms, long
        ],
        ["doc_id", "text"],
    )
    out = text_analysis.bm25_topk(
        docs, ["alpha", "beta"], k=10
    ).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids
    assert len(ids) == 3
    # doc 2 (two alphas + beta, short) must beat doc 4 (long)
    assert ids.index(2) < ids.index(4)
    # doc 1 matches alpha+beta once each, short -> beats the padded doc 4
    assert ids.index(1) < ids.index(4)
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score == round(r.score, 9) for r in out)


def test_bm25_k_limits_and_id_tiebreak(spark):
    from tugas_2_big_data_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], ["doc_id", "text"]
    )
    out = text_analysis.bm25_topk(docs, ["alpha"], k=4).collect()
    # identical docs -> identical scores -> doc_id ascending tiebreak
    assert [r.doc_id for r in out] == [0, 1, 2, 3]


def test_bpe_encode_roundtrips_and_merges_apply(spark):
    """encode(learned merges) must (a) reproduce every training word
    when its tokens are concatenated (lossless round-trip), (b)
    actually USE the merges — 'low' is a single token after the
    textbook merges — and (c) never merge across a word boundary."""
    from tugas_2_big_data_spark.operators.text_analysis import (
        bpe_encode,
        bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower newest")], ["doc_id", "text"]
    )
    merges = bpe_merges(df, n_merges=5)
    out = {r.doc_id: r for r in bpe_encode(df, merges, n_merges=5).collect()}
    # (a) round-trip: dropping spaces from the token stream and
    # restoring word boundaries reproduces the normalized text
    assert out[1].tokens.replace(" ", "") == "lowlowlow"
    assert out[2].tokens.replace(" ", "") == "lowerlowernewest"
    # (b) merges applied: low -> one token; lower -> one token
    assert out[1].tokens.split(" ") == ["low", "low", "low"]
    assert out[1].n_tokens == 3 and out[1].n_words == 3
    toks2 = out[2].tokens.split(" ")
    assert toks2[:2] == ["lower", "lower"]
    # (c) 'newest': es merged, but nothing crosses into neighbors
    assert out[2].n_words == 3
    assert toks2[2:] == ["n", "e", "w", "es", "t"]


def test_bpe_encode_handles_missing_rounds_and_empty_text(spark):
    """A merge table shorter than n_merges (vocab exhausted early)
    must act as identity passes, and empty text encodes to zero
    tokens."""
    from tugas_2_big_data_spark.operators.text_analysis import (
        bpe_encode,
        bpe_merges,
    )

    df = spark.createDataFrame([(1, "ab ab"), (2, "  ")], ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=10)  # exhausts after 1 merge
    out = {
        r.doc_id: r for r in bpe_encode(df, merges, n_merges=10).collect()
    }
    assert out[1].tokens.split(" ") == ["ab", "ab"]
    assert out[1].n_tokens == 2
    assert out[2].n_tokens == 0 and out[2].tokens == ""


def test_ppl_bands_are_thirds_and_tail_dropped(spark):
    """Tercile banding must split the scored docs into three near-equal
    bands (exact thirds up to interpolation ties) ordered
    head < middle < tail in mean surprise, with only the tail dropped."""
    from conftest import SF_UNIT
    from tugas_2_big_data_spark.operators import text_analysis
    from tugas_2_big_data_spark.sources.catalog import load_table

    scored = text_analysis.bigram_perplexity(
        load_table(spark, "documents", SF_UNIT)
    )
    n = scored.count()
    rows = {r.band: r for r in text_analysis.ppl_bands(scored).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert sum(r.n_docs for r in rows.values()) == n
    for band in rows.values():
        assert abs(band.n_docs - n / 3) <= 2
    assert (
        rows["head"].mean_surprise
        < rows["middle"].mean_surprise
        < rows["tail"].mean_surprise
    )
    assert rows["head"].kept and rows["middle"].kept and not rows["tail"].kept


def test_source_kl_nonnegative_and_zero_for_single_source(spark):
    """KL(source || corpus) is >= 0 always, and == 0 when the corpus
    has one source (its LM IS the corpus LM)."""
    from conftest import SF_UNIT
    from tugas_2_big_data_spark import queries as q  # noqa: F401
    import __spark_entry__ as entry

    df = entry.queries()["txt_source_kl"](spark, SF_UNIT)
    rows = df.collect()
    assert rows and all(r.kl_vs_corpus >= 0 for r in rows)

    one = spark.createDataFrame(
        [(1, "a b c", "en", "only", 5), (2, "a b d", "en", "only", 5)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    from tugas_2_big_data_spark.operators import text_analysis  # noqa: F401
    # replicate the query inline over the single-source frame
    w = one.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    )
    sc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    cc = sc.groupBy("word").agg(F.sum("c").alias("cw"))
    ct = cc.agg(F.sum("cw").alias("nt"))
    p = F.col("c") / F.col("n")
    qq = F.col("cw") / F.col("nt")
    out = (
        sc.join(st, "source").join(cc, "word").crossJoin(F.broadcast(ct))
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / qq)), 6).alias("kl"))
        .collect()
    )
    assert out[0].kl == 0.0


def test_langid_confusion_shares_sum_to_one_per_true_lang(spark):
    from conftest import SF_UNIT
    import __spark_entry__ as entry

    df = entry.queries()["txt_langid_confusion"](spark, SF_UNIT)
    rows = df.collect()
    assert sum(r.n for r in rows) > 0
    by_true = {}
    for r in rows:
        by_true.setdefault(r.true_lang, 0.0)
        by_true[r.true_lang] += r.share_of_true
    for lang, s in by_true.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)
