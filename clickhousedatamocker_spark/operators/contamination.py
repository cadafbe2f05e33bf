"""Test-set contamination check — the eval-leakage audit every LLM
training-data pipeline runs before a model ships.

``contamination_check(train, test)``: which training documents share at
least ``min_overlap`` distinct word n-grams with ANY test-set document?
(The n-gram-overlap definition used by public decontamination tooling,
e.g. the 13-gram checks described in the GPT-3 and PaLM papers.)

Spark-first shape, designed for the asymmetry of the real workload
(train = the 100 TB corpus, test = a few thousand eval documents):

- The TEST side collapses to a distinct n-gram-hash set — typically a few
  million longs — broadcast to every executor. The train side is NEVER
  shuffled: explode to (doc, gram_hash), broadcast-hash-join against the
  test grams, one aggregation keyed on the train doc id.
- Grams are compared as xxhash64 digests, not strings: the join moves 8
  bytes per gram and the broadcast stays small. (Cross-checked exact — not
  probabilistic — in tests against a string-level array_intersect on the
  same fixture; a 64-bit collision over a test set of millions of grams has
  probability ~n²/2⁶⁵, accepted exactly as MinHash accepts it.)
- Shingling reuses the materialized-token-array discipline of
  operators/dedup.py (no lambda-CSE trap).

The reference (a mock-data ingest harness) has no analogue; this is part
of the Tier-B pipeline extension mandated by the blueprint (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators.dedup import shingles_of_tokens, tokens


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .select(F.col(id_col), F.explode(shingles_of_tokens(F.col("__tk"), n)).alias("__g"))
        .select(F.col(id_col), F.xxhash64("__g").alias("__gh"))
    )


def contamination_check(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """→ (id_col, n_overlapping_grams, n_grams, contaminated) — one row per
    TRAIN document; ``contaminated`` = n_overlapping_grams >= min_overlap.

    Only documents long enough to have at least one n-gram appear (shorter
    docs cannot be n-gram-contaminated by definition).
    """
    tr = _gram_hashes(train, id_col, text_col, n)
    te = F.broadcast(
        _gram_hashes(test, id_col, text_col, n).select("__gh").distinct()
    )
    per_doc = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        tr.join(te, "__gh")
        .groupBy(id_col)
        .agg(F.countDistinct("__gh").alias("n_overlapping_grams"))
    )
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlapping_grams", F.lit(0)).alias("n_overlapping_grams"),
            "n_grams",
            (F.coalesce("n_overlapping_grams", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom prefilter: the scale path when the test gram set outgrows a
# comfortable broadcast-join set (operators/membership.py holds the filter)


def gram_bloom(
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    fpp: float = 0.001,
    seed: int = 7,
) -> dict:
    """Bloom filter over the test set's DISTINCT gram hashes — ~14 bits per
    gram at 0.1% FPP vs 64 for the exact broadcast set, and the probe side
    never joins or shuffles. Build once per eval suite, reuse across
    corpus snapshots (:func:`~clickhousedatamocker_spark.operators.membership.bloom_merge`
    unions suites)."""
    from clickhousedatamocker_spark.operators.membership import build_bloom

    grams = _gram_hashes(test, id_col, text_col, n).select("__gh").distinct()
    return build_bloom(grams, "__gh", fpp=fpp, seed=seed)


def contamination_prefilter(
    train: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Keep only train documents whose MAYBE-overlapping distinct-gram count
    reaches ``min_overlap`` — a strict superset of the truly contaminated
    (Bloom filters have no false negatives), so
    ``contamination_check(prefiltered, test)`` equals the exact check on
    the survivors and everything dropped is guaranteed clean. At 100 TB
    this is the shape that matters: the full corpus sees only a map-side
    probe + one per-doc aggregate; the (expensive) exact confirm runs on
    the contaminated sliver."""
    from clickhousedatamocker_spark.operators.membership import bloom_contains

    tr = _gram_hashes(train, id_col, text_col, n)
    probed = bloom_contains(tr, model, "__gh", "__maybe")
    survivors = (
        probed.groupBy(id_col)
        .agg(F.count_distinct(F.when(F.col("__maybe"), F.col("__gh"))).alias("__maybe_grams"))
        .filter(F.col("__maybe_grams") >= min_overlap)
        .select(id_col)
    )
    return train.join(survivors, id_col, "semi")
