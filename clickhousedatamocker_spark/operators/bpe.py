"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016) — the
train-a-real-tokenizer step of an LLM data pipeline, Spark-first.

Scale split (the same split every production BPE trainer makes):

- **Word counting is the distributed pass** — one explode + one
  partial-agg shuffle over the corpus, then the vocabulary is capped at
  the top ``max_vocab_words`` by (count DESC, word ASC). Zipf's law makes
  the cap lossless in practice: at 100 TB the distinct-word relation is
  milli-scale next to the corpus, and the top 10^5-10^6 words carry ~all
  the pair-frequency mass that decides merges.
- **Merge learning is driver-side** over that bounded word-count table —
  O(|vocab| * merges) pure-Python, identical to HuggingFace/ SentencePiece
  trainers, which also reduce the corpus to word counts first. Ties break
  lexicographically, so training is deterministic under any partitioning.
- **Encoding is row-local** — an Arrow-batched ``mapInPandas`` applying
  the broadcast merge-rank dict per word; zero shuffle, plan size O(1) in
  vocabulary size. Unknown characters pass through as single-char tokens,
  so ``decode(encode(x))`` == whitespace-normalized ``x`` universally.

Reference scope note: the reference repo has no tokenizer — this is Tier B
(north-star training-data ops) surface alongside dedup/quality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# End-of-word sentinel (Sennrich): keeps merges word-internal. A PRIVATE-USE
# codepoint, not the classic "</w>" — real corpora contain the literal
# string "</w>" (markup), which would collide with the sentinel and break
# the decode(encode(x)) round-trip. Input occurrences of the sentinel char
# itself are stripped before segmentation (the one documented lossy case).
_END = "\ue000"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped to the ``max_vocab_words``
    most frequent (count DESC, word ASC — deterministic), collected to the
    driver. Splitting is simple whitespace: BPE's pre-tokenization
    contract; empty strings are dropped."""
    rows = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.col(text_col), _END, ""), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_vocab_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            stats[pair] = stats.get(pair, 0) + cnt
    return stats


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the ordered
    merge list — the whole model (token vocabulary = seen characters +
    one token per merge). Deterministic: most-frequent pair wins each
    round, ties broken lexicographically; stops early when no pair occurs
    twice."""
    wc = word_counts(docs, text_col, max_vocab_words)
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc:
        syms = tuple(list(w) + [_END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        top_count = max(stats.values())
        best_pair = min(p for p, c in stats.items() if c == top_count)
        if top_count < 2:
            break
        merges.append(best_pair)
        vocab = {_merge_word(s, best_pair): c for s, c in vocab.items()}
    return merges


def _make_word_encoder(end: str):
    """Greedy BPE segmenter factory. NESTED on purpose: cloudpickle ships a
    nested function BY VALUE inside the mapInPandas closure, so executors
    need no importable copy of this package (the bare-session driver
    contract — an external SparkSession has no PYTHONPATH pointing here)."""

    def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
        syms = list(word) + [end]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    return encode_word


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    return _make_word_encoder(_END)(word, ranks)


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col`` = array<string> of BPE tokens for ``text_col``.

    Arrow-batched ``mapInPandas`` with the merge-rank dict shipped ONCE as
    a Spark broadcast (never plan literals): row-local, zero shuffle, plan
    size O(1) in vocabulary size. Merges apply in training order (lowest
    rank first), the standard greedy BPE segmenter."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    bc = df.sparkSession.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    # captured locals only (string + nested function): the closure must not
    # reference module globals, which cloudpickle would serialize as an
    # import of this package — absent on bare-session executors
    end = _END
    enc_word = _make_word_encoder(end)

    def encode(batches):
        import pandas as pd

        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            pdf = pdf.copy()
            toks = []
            for text in pdf[text_col]:
                words = [w for w in (text or "").replace(end, "").split() if w]
                out: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = enc_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            pdf[out_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(encode, out_schema)


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of the segmenter for one row: concatenate and turn the
    end-of-word sentinels back into single spaces."""
    return "".join(tokens).replace(_END, " ").strip()
