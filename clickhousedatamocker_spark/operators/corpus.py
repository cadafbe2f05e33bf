"""Corpus-governance operators for training-data pipelines (Tier B).

Three op families a 100 TB pretraining pipeline runs between crawl and
tokenizer, absent from the reference (whose data model is a 10-column
metrics row — scripts/generate_data.py) and from this repo's document
tier so far:

- **Segment-level exact dedup** (C4/CCNet-style): documents are exploded
  into segments, each segment's corpus-wide frequency and canonical first
  occurrence are computed in ONE hash aggregation, and documents are
  reassembled keeping a segment only where it is canonical or under the
  duplication threshold. Boilerplate (cookie banners, navigation chrome)
  dies here, not at whole-document granularity.
- **URL governance**: normalization (scheme/host case, default ports,
  query/fragment stripping), registrable-domain extraction, blocklist
  filtering, and per-domain quotas — the crawl-side fairness control that
  stops one domain from dominating a mixture.
- **Deterministic mixture sampling**: per-stratum hash-threshold sampling
  (exact, replayable, partition-stable — no RNG state) and
  temperature-flattened mixture rates (w_s ∝ n_s^(1/T), the standard
  multilingual/multi-source rebalancing formula).

Scale notes per op in the docstrings; everything is column expressions +
bounded aggregations — no Python row path, no driver materialization of
row data (the temperature mix collects one row per SOURCE, not per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# segment-level exact dedup


def explode_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_tokens: int = 16,
) -> DataFrame:
    """→ (id_col, seg_no, segment): fixed-width token windows of the text.

    Real corpora segment on newline/sentence boundaries; the fixture's text
    has neither, so the window width stands in for the boundary rule — the
    pipeline shape (explode → per-segment ops → reassemble) is identical.
    Narrow: one generator expression, no shuffle. NULL text is treated as
    empty (one empty segment), so the document survives reassembly —
    posexplode over a NULL array would silently DROP the row.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(segment_tokens)).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * segment_tokens + 1, segment_tokens), " "
                ),
            )
        ).alias("seg_no", "segment"),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_tokens: int = 16,
    max_duplication: int = 1,
) -> DataFrame:
    """C4-style corpus-wide segment dedup: a segment that occurs in more
    than ``max_duplication`` documents survives ONLY in its canonical
    first occurrence (smallest (doc_id, seg_no)); every other copy is
    dropped, and documents are reassembled from their surviving segments
    in order. → (id_col, text, n_segments, n_dropped_segments).

    Scale: two shuffles total — (1) the segment-frequency aggregation
    (partial/map-side combined; the canonical keeper rides in the same
    aggregate as a min struct, so no second pass), (2) the join back on
    the segment key, then one per-document reassembly aggregation.
    Hot segments ("click here to subscribe" x 10^9) are ONE aggregation
    row each — frequency skew concentrates into counters, not memory.
    The joined-back dictionary row is (segment, count, canonical) — no
    document payload travels twice.
    """
    segs = explode_segments(df, id_col, text_col, segment_tokens)
    # corpus-wide per-segment stats: frequency + canonical first occurrence
    stats = segs.groupBy("segment").agg(
        F.count(F.lit(1)).alias("seg_count"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("seg_no").alias("s"))).alias("canon"),
    )
    kept = (
        segs.join(stats, "segment")
        .withColumn(
            "keep",
            (F.col("seg_count") <= max_duplication)
            | ((F.col("canon.d") == F.col(id_col)) & (F.col("canon.s") == F.col("seg_no"))),
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("seg_no").alias("s"), F.col("segment").alias("t")),
                            )
                        )
                    ),
                    lambda e: e["t"],
                ),
                " ",
            ).alias(text_col),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("long").alias("n_dropped_segments"),
        )
    )


# ---------------------------------------------------------------------------
# URL governance

_DEFAULT_PORTS = {"http": 80, "https": 443}


def normalize_url(col: str | Column) -> Column:
    """Canonical URL form: lowercase scheme+host, default port dropped,
    query string and fragment stripped, trailing slash trimmed (path-only).
    Pure regexp expressions — codegen, zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    no_query = F.regexp_replace(no_frag, r"\?.*$", "")
    scheme = F.lower(F.regexp_extract(no_query, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(no_query, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    port = F.regexp_extract(no_query, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\d+)", 1)
    path = F.regexp_extract(no_query, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    norm_path = F.regexp_replace(path, r"/+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        norm_path,
    )


def url_domain(col: str | Column) -> Column:
    """Registrable domain: last two host labels (the public-suffix-list
    refinement is a data file, not a different plan shape)."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2, F.concat(F.element_at(labels, n - 1), F.lit("."), F.element_at(labels, n))
    ).otherwise(host)


def filter_blocklisted(
    df: DataFrame, url_col: str, blocklist: list[str], domain_alias: str = "domain"
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted. The blocklist is
    a literal array (real ones are ~10^5 entries — still a broadcast-sized
    hash set; swap the isin for a broadcast anti-join when it outgrows a
    literal). Adds the extracted domain column."""
    out = df.withColumn(domain_alias, url_domain(url_col))
    return out.filter(~F.col(domain_alias).isin(blocklist))


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    quota: int,
    order_col: str | None = None,
    domain_alias: str = "domain",
) -> DataFrame:
    """Keep at most ``quota`` rows per registrable domain, preferring
    smallest ``order_col`` (deterministic). One shuffle on the domain key;
    the row_number window sorts EXTERNALLY (spills), so a mega-domain is
    slow-but-bounded, never an OOM — same discipline as sessionize."""
    out = df.withColumn(domain_alias, url_domain(url_col))
    w = Window.partitionBy(domain_alias).orderBy(order_col or F.monotonically_increasing_id())
    return out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= quota).drop("__rn")


# ---------------------------------------------------------------------------
# deterministic mixture sampling

_SA, _SB, _SP = 48271, 11, 2_147_483_647  # Lehmer-style; both engines exact


def _sample_key_int(id_col: Column) -> Column:
    """The raw two-round Lehmer value in [0, _SP) — the integer behind
    :func:`_sample_key` (ordering by it == ordering by the normalized
    double; modular reductions of it give engine-portable shard ids)."""
    r0 = F.pmod(id_col, F.lit(_SP))
    r1 = (F.lit(_SA) * r0 + F.lit(_SB)) % F.lit(_SP)
    return (F.lit(_SA) * r1 + F.lit(_SB)) % F.lit(_SP)


def sample_key_int_oracle_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`_sample_key_int`."""
    r0 = f"((({id_expr}) % {_SP}) + {_SP}) % {_SP}"
    r1 = f"(({_SA} * ({r0}) + {_SB}) % {_SP})"
    return f"(({_SA} * {r1} + {_SB}) % {_SP})"


def _sample_key(id_col: Column) -> Column:
    """Deterministic pseudo-uniform key in [0, 1): portable across engines
    (exact integer arithmetic mod a 31-bit prime — DuckDB computes the
    identical value, unlike xxhash64). TWO Lehmer rounds: one round leaves
    small ids (id << p/a) clustered near 0 — the second multiplication
    wraps them around the modulus and mixes.

    The id is pre-reduced mod the prime FIRST (pmod: non-negative even for
    negative ids) so every product stays below 48271 * 2^31 ≈ 1.04e14 —
    without it, ids above ~1.9e14 overflow int64: Spark wraps silently
    while DuckDB raises, breaking cross-engine parity. The oracle SQL must
    apply the identical pre-reduction (see sample_key_oracle_sql)."""
    return _sample_key_int(id_col).cast("double") / F.lit(float(_SP))


def sample_key_oracle_sql(id_expr: str) -> str:
    """DuckDB-dialect twin of :func:`_sample_key` — keep the two in
    lockstep. DuckDB's ``%`` keeps the dividend's sign like Spark's ``%``,
    so pmod is spelled ``((x % p) + p) % p`` in both readings."""
    return f"({sample_key_int_oracle_sql(id_expr)} / {float(_SP)!r})"


def stratified_sample(
    df: DataFrame, rates: dict[str, float], strata_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Per-stratum deterministic sample: row survives iff its hash key is
    under the stratum's rate. Replayable (no RNG state), partition-stable,
    and a pure filter — the scan prunes with zero shuffle at any scale.
    Strata absent from ``rates`` are dropped (rate 0)."""
    # single CASE chain: source -> rate (0.0 default drops unknown strata)
    expr = F.lit(0.0)
    for s, r in rates.items():
        expr = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(expr)
    return df.filter(_sample_key(F.col(id_col)) < expr)


def temperature_mix_rates(
    df: DataFrame,
    temperature: float,
    target_rows: int,
    strata_col: str = "source",
) -> dict[str, float]:
    """Temperature-flattened mixture: stratum weight w_s ∝ n_s^(1/T),
    scaled so the expected sample size is ``target_rows``; per-stratum
    rates are capped at 1 (no upsampling — this is a filter, not a
    replicator). T=1 keeps natural proportions; T→∞ approaches uniform.

    Driver state: ONE row per stratum (the per-source counts) — the only
    collect, bounded by the source vocabulary, not the corpus.
    """
    counts = {r[strata_col]: r["n"] for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()}
    weights = {s: n ** (1.0 / temperature) for s, n in counts.items()}
    z = sum(weights.values())
    rates = {}
    for s, n in counts.items():
        want = target_rows * weights[s] / z
        rates[s] = min(1.0, want / n)
    return rates


def pack_token_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos: str = "<|endoftext|>",
    shard_key: str = "xxhash64",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (with an ``eos``
    separator after each) and chunk the token stream into EXACTLY
    ``seq_len``-token training sequences — the standard LM pretraining
    layout where documents may straddle sequence boundaries.

    Scale shape: packing is inherently sequential, so the corpus first
    hash-partitions into ``n_shards`` deterministic shards (what real
    pipelines do — packing is per output shard, never global) and the
    running token positions come from a window partitioned BY SHARD: state
    per task is one shard's stream, and shards scale horizontally. Inside
    a shard, documents pack in ``id_col`` order, so (corpus, seq_len,
    n_shards) fully determines every output sequence.

    Returns (shard, seq_id, n_tokens, text): n_tokens == seq_len for every
    sequence except each shard's last partial one. The eos markers make
    the packing reversible (splitting on eos recovers document order).

    ``shard_key``: ``'xxhash64'`` (production default) or ``'lehmer'`` —
    the engine-portable two-round Lehmer hash (same family as
    :func:`split_corpus`), which a DuckDB oracle can recompute exactly;
    the graded pipeline twin uses it.
    """
    from pyspark.sql import Window as W

    if shard_key == "xxhash64":
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard")
    elif shard_key == "lehmer":
        shard = (_sample_key_int(F.col(id_col)) % F.lit(n_shards)).alias("shard")
    else:
        raise ValueError(f"shard_key must be 'xxhash64' or 'lehmer', got {shard_key!r}")
    toks = docs.select(
        shard,
        F.col(id_col),
        F.split(F.concat(F.col(text_col), F.lit(" " + eos)), " ").alias("__tk"),
    )
    toks = toks.withColumn("__n", F.size("__tk"))
    w = W.partitionBy("shard").orderBy(id_col)
    # end-exclusive running offset of each doc's token block within its shard
    toks = toks.withColumn("__start", F.sum("__n").over(w) - F.col("__n"))
    # one row per (doc, overlapped sequence) carrying the doc's token SLICE
    # for that sequence — NOT one row per token: the sequence grouping then
    # aggregates ~(n_docs + n_sequences) slice rows instead of shuffling
    # every token with its own (shard, pos, tok) row. Same layout to the
    # byte (each token keeps its global in-shard position via the slice's
    # start_pos; flatten of the position-sorted slices == the token stream).
    # At 100 TB this is guide §2.3's "shuffle fewer bytes": per-token row
    # overhead (~24 B of key+pos per token) disappears and the aggregate's
    # collect_list holds O(docs-per-seq) slices, not O(seq_len) tokens.
    L = F.lit(seq_len).cast("long")
    first_seq = (F.col("__start") / L).cast("long")
    last_seq = ((F.col("__start") + F.col("__n") - 1) / L).cast("long")
    slices = (
        toks.filter(F.col("__n") > 0)
        .select(
            "shard",
            "__tk",
            "__start",
            "__n",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            "shard",
            "seq_id",
            F.greatest(F.col("seq_id") * L, F.col("__start")).alias("__from"),
            # slice(arr, pos, len): pos is 1-based within the doc's tokens
            F.slice(
                "__tk",
                (F.greatest(F.col("seq_id") * L, F.col("__start")) - F.col("__start") + 1).cast("int"),
                (
                    F.least((F.col("seq_id") + 1) * L, F.col("__start") + F.col("__n"))
                    - F.greatest(F.col("seq_id") * L, F.col("__start"))
                ).cast("int"),
            ).alias("__toks"),
        )
    )
    return (
        slices.groupBy("shard", "seq_id")
        .agg(
            F.sum(F.size("__toks")).alias("n_tokens"),
            F.array_join(
                F.flatten(F.array_sort(F.collect_list(F.struct("__from", "__toks")))["__toks"]),
                " ",
            ).alias("text"),
        )
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a ``split``
    label by thresholding the same portable Lehmer sample key the
    stratified sampler uses — so (corpus, fractions) fully determines the
    split on ANY engine, run, or partitioning, and splits are disjoint and
    exhaustive by construction (adjacent half-open intervals over [0, 1)).

    Fractions must sum to 1 (±1e-9). Order of dict insertion fixes the
    interval order, so adding a new split later only steals from the LAST
    interval — earlier assignments never churn (the property that matters
    when a corpus is versioned: yesterday's train doc stays train).
    Zero shuffle: one derived column.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = _sample_key(F.col(id_col))
    expr = None
    upper = 0.0
    names = list(fractions)
    for name in names[:-1]:
        upper += fractions[name]
        cond = key < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_corpus_oracle_sql(fractions: dict[str, float], id_expr: str = "doc_id") -> str:
    """DuckDB-dialect twin of :func:`split_corpus`'s label expression."""
    key = sample_key_oracle_sql(id_expr)
    names = list(fractions)
    whens, upper = [], 0.0
    for name in names[:-1]:
        upper += fractions[name]
        whens.append(f"WHEN {key} < {upper!r} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def split_corpus_grouped(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
) -> DataFrame:
    """GROUP-aware (leakage-safe) train/val/test assignment: every row of
    a group gets the same ``split`` label. Near-duplicates cluster within
    groups (one URL domain, one repository, one base document), so a
    doc-keyed split leaks train text into test through siblings — the
    standard fix is to split on the group key, and this is that split.

    Key = portable Lehmer mix of the group string's polynomial rolling
    hash (both halves have exact DuckDB twins), thresholded into the same
    adjacent half-open intervals as :func:`split_corpus` — deterministic
    per (group value, fractions) on any engine, zero shuffle (one derived
    column; no group aggregation is needed because equal strings hash
    equal). A NULL group falls to the LAST interval in both engines
    (NULL comparisons propagate through the CASE identically).

    Fraction accuracy is group-weighted, not row-weighted: a group lands
    wholly in one split, so realized row fractions track the targets only
    as far as group sizes allow (the price of zero leakage — documented,
    not a bug)."""
    from clickhousedatamocker_spark.operators.dedup import _poly_hash

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = _sample_key(_poly_hash(F.col(group_col)))
    expr = None
    upper = 0.0
    names = list(fractions)
    for name in names[:-1]:
        upper += fractions[name]
        cond = key < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_corpus_grouped_oracle_sql(
    fractions: dict[str, float], group_expr: str = "source"
) -> str:
    """DuckDB-dialect twin of :func:`split_corpus_grouped`'s label."""
    from clickhousedatamocker_spark.operators.dedup import _o_poly_hash

    key = sample_key_oracle_sql(_o_poly_hash(group_expr))
    names = list(fractions)
    whens, upper = [], 0.0
    for name in names[:-1]:
        upper += fractions[name]
        whens.append(f"WHEN {key} < {upper!r} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


# ---------------------------------------------------------------------------
# weighted reservoir sampling (Efraimidis & Spirtes 2006, A-ES)

def _salt_multiplier(salt: int) -> int:
    """Map a salt to a nonzero multiplier in [1, _SP - 1]."""
    return int(salt) % (_SP - 1) + 1


def _uniform_01_excl0(id_col: Column, salt: int) -> Column:
    """Deterministic pseudo-uniform u in (0, 1): Lehmer(id) is multiplied by
    a per-salt constant mod the prime, then Lehmer-mixed again; +1 keeps
    ln(u) finite. The salt enters MULTIPLICATIVELY (classic universal-hash
    family), not additively: an additive offset makes u affine in salt, so
    two documents' draw streams are parallel lines mod p — correlated
    draws that visibly bias A-ES inclusion frequencies. Multiplying the
    already-mixed value by salt-dependent m ∈ [1, p-1] scrambles
    BETWEEN-document differences per salt. Overflow-safe: both factors are
    < p ≈ 2^31, so the product stays < 2^62 in int64."""
    v = F.pmod(_sample_key_int(id_col) * F.lit(_salt_multiplier(salt)), F.lit(_SP))
    return (_sample_key_int(v) + F.lit(1)).cast("double") / F.lit(float(_SP + 1))


def _uniform_01_excl0_oracle_sql(id_expr: str, salt: int) -> str:
    """DuckDB twin of :func:`_uniform_01_excl0` — keep in lockstep."""
    v = f"(({sample_key_int_oracle_sql(id_expr)}) * {_salt_multiplier(salt)} % {_SP})"
    return f"(({sample_key_int_oracle_sql(v)} + 1) / {float(_SP + 1)!r})"


def _shuffle_key_int(id_col: Column, salt: int) -> Column:
    """Salted integer shuffle key in [0, _SP): the _uniform_01_excl0
    construction kept in EXACT integers (multiplicative salt, second
    Lehmer mix — the additive-salt correlation trap documented there
    applies here identically). Ordering by it is the shuffled order;
    modular reductions of it give engine-portable shard ids."""
    v = F.pmod(_sample_key_int(id_col) * F.lit(_salt_multiplier(salt)), F.lit(_SP))
    return _sample_key_int(v)


def shuffle_key_int_oracle_sql(id_expr: str, salt: int) -> str:
    """DuckDB twin of :func:`_shuffle_key_int` — keep in lockstep."""
    v = f"(({sample_key_int_oracle_sql(id_expr)}) * {_salt_multiplier(salt)} % {_SP})"
    return sample_key_int_oracle_sql(v)


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: int = 0,
) -> DataFrame:
    """Deterministic global corpus shuffle into numbered training shards —
    the 'shuffle the dataset once before training' step every large-scale
    pipeline runs between curation and the dataloader (the reference's
    generate-then-insert loop has no analogue; this is Tier-B north-star
    surface). Adds ``shard`` (int in [0, n_shards)) and ``pos`` (1-based
    position within the shard): reading shards in (shard, pos) order
    replays the same block-shuffled permutation on any engine, any run.

    Mechanics: key = salted two-round Lehmer integer over ``id_col``;
    shard = key % n_shards (hash-balanced, so there is NO global-rank
    barrier); pos = row_number within the shard ordered by (key, id) —
    the id tiebreak keeps the permutation total under key collisions.

    Scale shape: ONE exchange (hash-partition on shard) + a per-shard
    external sort; nothing global, no driver state, skew-free by
    construction (the key is uniform). At 100 TB pick n_shards ≥ the
    cluster's write parallelism; each task sorts ~corpus/n_shards rows.

    Determinism contract: (corpus, id_col, n_shards, salt) fully
    determines every (shard, pos) pair — exact-integer arithmetic only,
    so DuckDB recomputes the permutation bit-for-bit (the graded
    shuffle_shard_export_profile twin)."""
    if int(n_shards) < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _shuffle_key_int(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy("__shuffle_key", id_col)
    return (
        df.withColumn("__shuffle_key", key)
        .withColumn("shard", F.pmod(F.col("__shuffle_key"), F.lit(int(n_shards))).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__shuffle_key")
    )


def write_shuffle_shards(df_shuffled: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize a :func:`global_shuffle` result as one parquet
    directory per shard (``shard=N/``), rows inside each file in ``pos``
    order (parquet preserves write order, so a sequential reader replays
    the permutation without sorting). One exchange: repartition on the
    shard column so each task owns whole shards."""
    (
        df_shuffled.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str = "quality",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirtes
    exponential-key reservoir (A-ES): each row gets key = ln(u) / w with a
    deterministic per-(id, salt) uniform u ∈ (0, 1), and the sample is the
    top-``n`` rows by key. This draws row i into an n-sample with the
    exact probabilities of sequential weighted sampling without
    replacement (Efraimidis & Spirtes 2006, IPL 97(5) — the keys
    u^(1/w) are rank-equivalent to ln(u)/w).

    Determinism: u comes from the engine-portable Lehmer hash of
    (id, salt), so (corpus, n, salt) fully determines the sample on any
    engine, run, or partitioning — distinct salts give independent draws.
    Monotone: raising one row's weight (same salt) can only keep or add
    it, never evict it (ln(u) < 0, so key grows with w; other keys are
    untouched).

    Scale shape: one map-side key column + ONE top-n
    (TakeOrderedAndProject — per-partition heaps of n, no global sort,
    no shuffle of the corpus). Rows with NULL, NaN or non-positive weight
    are excluded (ln(u)/w flips sign at w<0 — they'd outrank everything;
    NaN passes a bare ``w > 0`` in Spark's ordering semantics and would
    sort FIRST under desc, silently always-selected).

    Caveat for cross-engine twins: ln() is not guaranteed correctly
    rounded, so Spark and DuckDB could disagree when two keys sit within
    1 ulp; with 31-bit uniforms the boundary tie is measure-zero and the
    fixed-seed tests pin the observed agreement.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col).cast("double")
    key = F.log(_uniform_01_excl0(F.col(id_col), salt)) / w
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("__aes_key", key)
        .orderBy(F.desc("__aes_key"), F.col(id_col))
        .limit(n)
        .drop("__aes_key")
    )


def weighted_sample_oracle_sql(
    n: int,
    weight_expr: str = "quality",
    id_expr: str = "doc_id",
    salt: int = 0,
    from_clause: str = "documents",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same key, same tiebreak,
    same NULL/NaN/non-positive weight gate)."""
    u = _uniform_01_excl0_oracle_sql(id_expr, salt)
    w = f"CAST({weight_expr} AS DOUBLE)"
    return (
        f"SELECT {select} FROM {from_clause} "
        f"WHERE {w} IS NOT NULL AND NOT isnan({w}) AND {w} > 0 "
        f"ORDER BY ln({u}) / {w} DESC, {id_expr} LIMIT {n}"
    )


# ---------------------------------------------------------------------------
# epoch mixture: per-domain repeat factors against a token budget

def epoch_mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    domain_col: str = "source",
    token_col: str = "n_tokens",
    max_epochs: float = 16.0,
) -> dict[str, float]:
    """Solve the per-domain epoch counts for a token-budget mixture — the
    Llama/GPT-style data recipe where high-value domains repeat (epoch > 1)
    and low-value ones subsample (epoch < 1): domain d should contribute
    ``budget_tokens * weights[d] / sum(weights)`` tokens, so its epoch
    count is target_tokens / observed_tokens, clamped to (0, max_epochs]
    (the cap encodes the diminishing-returns evidence against many repeats
    — Muennighoff et al. 2023 find ~4 epochs near-lossless, 16+ wasteful).

    Driver state: ONE row per domain (the token totals) — bounded by the
    domain vocabulary, never the corpus. Domains absent from ``weights``
    get epoch 0 (dropped by :func:`epoch_mixture`).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    z = sum(weights.values())
    if z <= 0:
        raise ValueError("weights must have a positive sum")
    totals = {
        r[domain_col]: r["tok"]
        for r in df.groupBy(domain_col).agg(F.sum(token_col).alias("tok")).collect()
    }
    plan: dict[str, float] = {}
    for d, want in weights.items():
        have = totals.get(d, 0)
        if have and have > 0:
            plan[d] = min(float(max_epochs), budget_tokens * (want / z) / have)
    return plan


def epoch_mixture(
    df: DataFrame,
    epochs: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a fractional-epoch mixture: a document in domain d with
    epoch count e appears floor(e) times always, plus once more iff its
    deterministic sample key falls under frac(e) — so every domain lands
    within one document of its planned token share, replayably. Output
    adds an ``epoch`` column (0-based copy index); training shards can
    shuffle on (id, epoch).

    Exactly cross-engine: e is a driver literal, floor/frac of a literal
    are exact, and the key is the portable Lehmer uniform — a DuckDB twin
    reproduces the mixture hash-identically (no transcendentals here,
    unlike :func:`weighted_sample`).

    Scale shape: one CASE-derived column + explode(sequence(...)) — linear
    in OUTPUT rows, zero shuffle, no driver row state. Domains absent from
    ``epochs`` (or with epoch <= 0) are dropped.
    """
    e_expr = F.lit(0.0)
    for d, e in epochs.items():
        e_expr = F.when(F.col(domain_col) == d, F.lit(float(e))).otherwise(e_expr)
    full = F.floor(e_expr).cast("int")
    frac = e_expr - F.floor(e_expr)
    extra = (_sample_key(F.col(id_col)) < frac).cast("int")
    n_copies = (full + extra).alias("__n_copies")
    out = df.withColumn("__n_copies", n_copies).filter(F.col("__n_copies") >= 1)
    return out.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
    ).drop("__n_copies")


def epoch_mixture_oracle_sql(
    epochs: dict[str, float],
    domain_col: str = "source",
    id_expr: str = "doc_id",
    from_clause: str = "documents",
) -> str:
    """DuckDB twin of :func:`epoch_mixture` (hash-exact: no transcendentals).
    unnest() of an empty generate_series drops the row, matching the Spark
    side's explicit ``__n_copies >= 1`` filter."""
    whens = " ".join(f"WHEN {domain_col} = '{d}' THEN {float(e)!r}" for d, e in epochs.items())
    e = f"(CASE {whens} ELSE 0.0 END)"
    key = sample_key_oracle_sql(id_expr)
    n_copies = f"(CAST(floor({e}) AS INT) + CASE WHEN {key} < {e} - floor({e}) THEN 1 ELSE 0 END)"
    return (
        f"SELECT * EXCLUDE (__n_copies), "
        f"CAST(unnest(generate_series(0, __n_copies - 1)) AS INT) AS epoch "
        f"FROM (SELECT *, {n_copies} AS __n_copies FROM {from_clause}) b"
    )


# ---------------------------------------------------------------------------
# corpus snapshot diff


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-to-crawl snapshot governance: classify every document id as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    corpus versions — the op that drives incremental index maintenance
    (added+changed feed *_index_add, removed feeds *_index_delete) and
    recrawl accounting.

    Scale shape: content hashes (xxhash64) are computed MAP-SIDE so the
    full-outer join shuffles only (id, 8-byte hash), never document text;
    one exchange per side keyed on id. Hash equality stands in for text
    equality at the MinHash-accepted 64-bit collision risk (~n²/2⁶⁵).
    NULL text hashes to the xxhash64 SEED (42) — Spark's hash functions
    never return NULL — so a hash column is NULL if and only if that id
    is absent from that snapshot side, and NULL text compares equal to
    NULL text (one fixed content state). Do not swap in a NULL-propagating
    hash (sha2/md5) without revisiting the branch order below.

    Returns (id_col, status) — join back to either snapshot for payloads.
    """
    oh = old.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("__old_h")
    )
    nh = new.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("__new_h")
    )
    joined = oh.join(nh, id_col, "full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") == F.col("__new_h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(id_col, status.alias("status"))
