"""Tier-B LLM-data-pipeline queries (SURVEY §2.4): dedup, similarity,
text analysis, multimodal — over the documents/embeddings fixtures.

Populated incrementally; the heavy operators live in
clickhousedatamocker_spark/operators/ and are exposed here as declared,
oracle-checked queries where SQL-expressible (LSH/ANN variants get
rows-only checks + recall tests instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhousedatamocker_spark.queries.base import register, t


# -------------------------------------------------------------------------
@register(
    "dedup_exact_canonical",
    """
SELECT lang, source, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    description="Exact dedup with deterministic canonical-row selection "
    "(min doc_id per key) — the scalable groupBy form of dropDuplicates.",
)
def dedup_exact_canonical(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
        .orderBy("lang", "source")
    )


# -------------------------------------------------------------------------
@register(
    "dedup_exact_by_text",
    """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_texts,
       COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups
FROM documents
""",
    description="Exact-duplicate audit by full text (hash-groupBy dedup shape).",
)
def dedup_exact_by_text(spark, sf_dir):
    return t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dups"),
    )


# -------------------------------------------------------------------------
@register(
    "text_token_stats",
    """
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  length(text) AS n_chars
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
    description="Token counting (whitespace tokenizer) + distinct-token and "
    "char counts — row-parallel text analysis, all JVM builtins.",
)
def text_token_stats(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_unique_tokens"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )
