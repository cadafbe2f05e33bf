"""Trainable BPE tokenizer (operators/bpe.py).

Grading: hand-computed Sennrich-example merges, a pure-Python independent
word-counter parity check for the distributed pass, the universal
decode(encode(x)) == normalized(x) law (hypothesis-fuzzed), and greedy
segmenter agreement with a from-scratch reference."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhousedatamocker_spark.operators import bpe


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic Sennrich fixture: frequencies force 'es' -> 'est' -> 'est</w>'
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    return spark.createDataFrame(rows, "text string")


def test_sentinel_literal_in_text_roundtrips(spark):
    # the classic "</w>" sentinel collides with real markup text; the
    # private-use sentinel doesn't — literal "</w>" round-trips
    docs = spark.createDataFrame([("a</w>b low",)], "text string")
    merges = bpe.train_bpe(docs, num_merges=8)
    row = bpe.bpe_encode(docs, "text", merges).first()
    assert bpe.bpe_decode_tokens(list(row["bpe_tokens"])) == "a</w>b low"


def test_word_counts_match_python_counter(spark, corpus):
    from collections import Counter

    want = Counter()
    for r in corpus.collect():
        for w in r["text"].split():
            want[w] += 1
    got = dict(bpe.word_counts(corpus))
    assert got == dict(want)
    # cap keeps the most frequent, deterministically
    top2 = bpe.word_counts(corpus, max_vocab_words=2)
    assert [w for w, _ in top2] == ["newest", "low"]


def test_train_bpe_sennrich_merges(spark, corpus):
    merges = bpe.train_bpe(corpus, num_merges=4)
    # 9 'es' pairs (newest 6 + widest 3) beat everything; then 'es'+'t' (9),
    # then 'est'+'</w>' (9), then 'l'+'o' (7)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", bpe._END), ("l", "o")]


def test_encode_applies_merges_and_caches(spark, corpus):
    merges = bpe.train_bpe(corpus, num_merges=10)
    out = bpe.bpe_encode(corpus.distinct(), "text", merges).collect()
    got = {r["text"]: list(r["bpe_tokens"]) for r in out}
    # after 10 merges on this corpus every word is a single token
    for w, toks in got.items():
        assert bpe.bpe_decode_tokens(toks) == w
    # unseen characters segment to single chars + sentinel, still decode
    extra = spark.createDataFrame([("qzx low",)], "text string")
    row = bpe.bpe_encode(extra, "text", merges).first()
    assert bpe.bpe_decode_tokens(list(row["bpe_tokens"])) == "qzx low"
    assert row["bpe_tokens"][0] == "q"  # no merge covers it


def _ref_encode_word(word, merges):
    """From-scratch reference segmenter: apply merges in rank order."""
    syms = list(word) + [bpe._END]
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdew ", min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_roundtrip_law_and_reference_segmenter(texts):
    # driver-side law check (no Spark in the hypothesis loop): the greedy
    # lowest-rank-first segmenter must agree with sequential merge
    # application, and decoding must restore the normalized text
    merges = [("e", "s"), ("es", "t"), ("a", "b"), ("ab", "c"), ("d", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        for w in t.split():
            got = bpe._encode_word(w, ranks)
            assert got == _ref_encode_word(w, merges)
            assert bpe.bpe_decode_tokens(got) == w


def test_bpe_on_documents_table(spark):
    from clickhousedatamocker_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    merges = bpe.train_bpe(docs, num_merges=64, max_vocab_words=5_000)
    assert len(merges) == 64
    enc = bpe.bpe_encode(docs.select("doc_id", "text"), "text", merges)
    import pyspark.sql.functions as F

    stats = enc.select(
        F.size("bpe_tokens").alias("n"),
        F.length("text").alias("chars"),
    ).agg(F.sum("n").alias("tok"), F.sum("chars").alias("ch")).first()
    # merges actually compress: tokens strictly fewer than characters
    assert 0 < stats["tok"] < stats["ch"]
