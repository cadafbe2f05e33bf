"""SQ8 scalar quantization for embedding columns — the third member of the
vector-compression tier (PCA rotation in operators/projection.py, IVF-PQ in
operators/pq.py; this is FAISS's ``SQ8`` / the "scalar quantizer" of
Jégou et al.'s codebase): each dimension maps linearly onto one unsigned
byte, 8× smaller than float64 storage with near-lossless recall at the
corpus sizes where PQ's 64× would cost too much accuracy.

Scale shape:

- **Training is ONE distributed aggregate**: per-dimension min/max via
  element-wise ``zip_with`` folds — a single partial-aggregated exchange
  collecting exactly two d-length arrays (driver-bounded model state).
- **Encode/decode are row-local projections**, all-JVM (`transform` over
  the array; codes stored as ``binary``, d bytes per vector).
- **Search decodes on the fly**: ``sq_topk`` reconstructs candidates
  inside the scan projection and reuses the exact brute-force ranking —
  no shuffle beyond the top-k window it inherits.

Quantization contract (pinned by tests): ``lo[j]`` maps to byte 0,
``hi[j]`` to byte 255, values round to the nearest level and out-of-range
values (vectors added after training drift) clamp. Decode returns the
level midpoint-free convention ``lo + code * (hi - lo) / 255`` so
``decode(encode(x)) - x`` is bounded by half a step per dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators.similarity import as_double


def sq_train(emb: DataFrame, vec_col: str = "embedding") -> dict:
    """Per-dimension [lo, hi] ranges → ``{"lo": [d], "hi": [d]}``.
    One posexplode + partial-aggregated (dim, min, max) shuffle whose
    result collects as exactly d rows — driver-bounded model state, the
    same discipline as the DSIR/classifier trainers."""
    v = as_double(vec_col)
    rows = (
        emb.select(v.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select(F.posexplode(F.col("__v")).alias("__d", "__x"))
        .groupBy("__d")
        .agg(F.min("__x").alias("lo"), F.max("__x").alias("hi"))
        .collect()
    )
    if not rows:
        raise ValueError("sq_train: no vectors")
    d = max(r["__d"] for r in rows) + 1
    lo, hi = [0.0] * d, [0.0] * d
    for r in rows:
        lo[r["__d"]], hi[r["__d"]] = r["lo"], r["hi"]
    return {"lo": lo, "hi": hi}


def _scale_cols(model: dict) -> tuple[Column, Column]:
    lo = F.lit([float(x) for x in model["lo"]])
    # degenerate dimensions (hi == lo) quantize to byte 0 and decode to lo:
    # guard the step so the division can't hit 0 under ANSI mode
    step = F.lit(
        [
            (float(h) - float(l)) / 255.0 if h > l else 1.0
            for l, h in zip(model["lo"], model["hi"])
        ]
    )
    return lo, step


def sq_encode(
    emb: DataFrame, model: dict, vec_col: str = "embedding", out_col: str = "code"
) -> DataFrame:
    """Append ``out_col``: the vector quantized to d bytes (binary).
    Row-local, all-JVM: clamp → scale → round → pack via char codes.

    Input contract (round-7 advisory): a NULL vector encodes to a NULL
    code; a vector containing a NULL ELEMENT also encodes to NULL (the
    char/array_join packing would silently DROP the null byte and
    misalign every later dimension at decode); a vector whose length
    differs from the trained d raises at execution time — a short vector
    would otherwise decode to a lo-filled tail (``ascii('') = 0``) and
    score as if it sat at the range floor."""
    d = len(model["lo"])
    lo, step = _scale_cols(model)
    # materialize the double-cast vector as a real column: as an inline
    # expression every element_at(v, i) below re-evaluates the whole
    # 64-element cast transform — O(d²) casts per row (the round-6
    # lambda-inlining class; CollapseProject keeps a non-cheap alias
    # referenced d times in its own projection, same device as
    # text_analysis._with_tokens)
    emb = emb.withColumn("__sq_v", as_double(vec_col))
    v = F.col("__sq_v")
    idx = F.sequence(F.lit(1), F.lit(d))
    byte = F.transform(
        idx,
        lambda i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.round(
                    (F.element_at(v, i) - F.element_at(lo, i))
                    / F.element_at(step, i)
                ).cast("int"),
            ),
        ),
    )
    # pack int array -> binary through codepoints (char(0..255) maps 1:1
    # onto ISO-8859-1 bytes — lossless)
    packed = F.encode(
        F.array_join(F.transform(byte, lambda b: F.char(b)), ""), "ISO-8859-1"
    )
    return emb.withColumn(
        out_col,
        F.when(v.isNull(), F.lit(None).cast("binary"))
        .when(
            F.size(v) != d,
            F.raise_error(
                F.concat(
                    F.lit(f"sq_encode: vector length != trained d={d} (got "),
                    F.size(v).cast("string"),
                    F.lit(")"),
                )
            ).cast("binary"),
        )
        .when(F.exists(v, lambda x: x.isNull()), F.lit(None).cast("binary"))
        .otherwise(packed),
    ).drop("__sq_v")


def sq_decode(
    df: DataFrame, model: dict, code_col: str = "code", out_col: str = "vec"
) -> DataFrame:
    """Reconstruct the approximate vector from the byte code (row-local)."""
    df = df.withColumn("__sq_s", F.decode(F.col(code_col), "ISO-8859-1"))
    df = df.withColumn(out_col, _decode_str_col(F.col("__sq_s"), model))
    return df.drop("__sq_s")


def _decode_col(code: Column, model: dict) -> Column:
    """Decode expression over the raw binary code. NOTE: prefer
    materializing ``decode(code, 'ISO-8859-1')`` as a real column and
    calling :func:`_decode_str_col` — inlined here, the charset decode
    re-runs once per DIMENSION (O(d²) bytes per row, the round-6
    lambda-inlining class)."""
    return _decode_str_col(F.decode(code, "ISO-8859-1"), model)


def _decode_str_col(s: Column, model: dict) -> Column:
    lo, step = _scale_cols(model)
    d = len(model["lo"])
    return F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.element_at(lo, i)
        + F.ascii(F.substring(s, i.cast("int"), 1)).cast("double")
        * F.element_at(step, i),
    )


def fixed_sq_model(d: int) -> dict:
    """Deterministic closed-form per-dimension ranges — the fixed-model
    device that makes the SQ8 OPERATOR driver-gradable (round-7 verdict
    task 1): training is a data min/max float aggregate with no hash-exact
    SQL twin, but with lo/hi PINNED the encode → decode → rank arithmetic
    is pure double math a DuckDB oracle recomputes exactly.
    ``lo[j] = -(1 + (j%5)/4)``, ``hi[j] = 1 + (j%7)/4`` — quarter steps
    are exactly representable doubles, the asymmetric ranges exercise
    per-dimension variation, and values outside [lo, hi] exercise the
    clamp contract."""
    return {
        "lo": [-(1.0 + (j % 5) * 0.25) for j in range(d)],
        "hi": [1.0 + (j % 7) * 0.25 for j in range(d)],
    }


def sq_xengine_oracle_sql(
    model: dict,
    k: int = 10,
    query_pred: str = "vec_id < 5",
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL recomputing ``sq_topk(sq_encode(emb, model), queries,
    model)`` exactly for a FIXED model: quantize each dimension with the
    same clamp/round/step arithmetic (the step literals are the SAME
    Python-computed doubles :func:`_scale_cols` inlines into the Spark
    plan), reconstruct ``lo + code*step``, then the brute-force cosine
    rank twin (round 6dp, ties by neighbor id)."""
    d = len(model["lo"])
    lo = "[" + ", ".join(repr(float(x)) for x in model["lo"]) + "]::DOUBLE[]"
    step = "[" + ", ".join(
        repr((float(h) - float(l)) / 255.0 if h > l else 1.0)
        for l, h in zip(model["lo"], model["hi"])
    ) + "]::DOUBLE[]"
    return f"""
WITH m AS (SELECT {lo} AS lo, {step} AS st),
e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] v FROM {table} WHERE {vec_col} IS NOT NULL),
enc AS (
  SELECT vec_id,
    list_transform(generate_series(1, {d}),
      i -> least(255, greatest(0, CAST(round((v[i] - m.lo[i]) / m.st[i]) AS INTEGER))))
    AS code
  FROM e, m
),
dec AS (
  SELECT vec_id,
    list_transform(generate_series(1, {d}), i -> m.lo[i] + code[i] * m.st[i]) AS dv
  FROM enc, m
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE {query_pred}),
scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, d.dv)
      / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(d.dv, d.dv)), 6) AS cosine
  FROM dec d CROSS JOIN q WHERE d.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
""".strip()


def sq_topk(
    codes: DataFrame,
    queries: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    code_col: str = "code",
    query_vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Asymmetric top-k: exact float queries against decoded SQ8 codes —
    the quantized analogue of ``brute_force_topk`` (same broadcast-query
    scan shape, same output schema), reading d bytes per corpus vector
    instead of 8d."""
    from clickhousedatamocker_spark.operators.similarity import (
        brute_force_topk,
        materialize_col,
    )

    # materialize the decoded array ONCE PER CORPUS ROW behind a Generate
    # barrier: without it CollapseProject inlines the 64-element
    # substring/ascii decode into the per-PAIR cosine (which references the
    # vector three times inside interpreted folds), turning an O(rows)
    # decode into O(pairs x 3) re-decodes — the round-6 lambda-inlining bug
    # class; the sf1 smoke measured 286 s vs brute force's 2.2 s before
    # this barrier landed
    decoded = materialize_col(
        codes.withColumn("__sq_s", F.decode(F.col(code_col), "ISO-8859-1")),
        _decode_str_col(F.col("__sq_s"), model),
        "embedding",
        keep=[id_col],
    )
    return brute_force_topk(
        decoded,
        queries.select(F.col(id_col), as_double(query_vec_col).alias("embedding")),
        id_col=id_col,
        k=k,
    )
