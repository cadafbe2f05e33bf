"""The full Gopher §A1.1 rule set (Rae et al. 2021): per-doc signal parity
with DuckDB on real data, rule-threshold goldens on crafted documents, and
the registry profile's end-to-end count twin."""

import duckdb
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return con


def test_gopher_signals_match_duckdb(spark, duck):
    """Every numeric signal behind the rules, per document, exact against
    the DuckDB twin (counts exact; ratios compared to 12 decimals — both
    engines compute the identical arithmetic on the identical counts)."""
    from clickhousedatamocker_spark.operators.text_analysis import (
        gopher_oracle_snippets,
        gopher_rules,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in gopher_rules(docs, text_col="text")
        .select(
            "doc_id",
            "n_words",
            "mean_word_len",
            "symbol_word_ratio",
            "bullet_line_frac",
            "ellipsis_line_frac",
            "alpha_word_frac",
            "n_required_stopwords",
        )
        .collect()
    }
    sn = gopher_oracle_snippets()
    cols = ", ".join(f"{sql} AS {name}" for name, sql in sn.items())
    want = duck.execute(f"SELECT doc_id, {cols} FROM documents").fetchall()
    assert len(want) == len(got)
    names = list(sn)
    for row in want:
        doc_id, vals = row[0], row[1:]
        g = got[doc_id]
        for name, v in zip(names, vals):
            if isinstance(v, int):
                assert g[name] == v, (doc_id, name)
            else:
                assert abs(g[name] - v) < 1e-12, (doc_id, name, g[name], v)


def test_gopher_rule_thresholds_golden(spark):
    """Crafted documents hitting each rule exactly (published Gopher
    thresholds are the defaults)."""
    from clickhousedatamocker_spark.operators.text_analysis import gopher_rules

    prose = (
        "the quick brown fox jumps over that lazy dog and runs off to "
        "the river bank with great speed have you seen it of late " * 3
    ).strip()
    docs = [
        (1, prose),  # clean: passes everything
        (2, "short text"),  # too few words
        (3, " ".join(["####"] * 60)),  # symbol-heavy AND no alpha/stopwords
        (4, "\n".join(["- item one two"] * 10) + "\nthe be to of and that have with "
            + " ".join(["filler"] * 45)),  # >90% bullet lines
        (5, prose.replace("dog", "dog...")),  # ellipses but under the line cap
        (6, " ".join(["aa"] * 60) + " the be"),  # mean word len < 3
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in gopher_rules(df, text_col="text").collect()}
    assert out[1]["gopher_keep"]
    assert out[2]["viol_too_few_words"] and not out[2]["gopher_keep"]
    assert out[3]["viol_symbol_ratio"] and out[3]["viol_alpha_words"] and out[3]["viol_stopwords"]
    assert out[4]["viol_bullet_lines"]
    assert not out[5]["viol_ellipsis_lines"]  # scattered ellipses: line rule
    assert out[6]["viol_mean_word_len"]
    # the numeric signals behind rule 4: 10 of 11 lines start with '-'
    assert abs(out[4]["bullet_line_frac"] - 10 / 11) < 1e-12


def test_gopher_profile_matches_duckdb(spark, duck):
    """The registry profile's violation counts replayed end-to-end in
    DuckDB (same min_words=5 relaxation the profile uses — the synthetic
    corpus is short-doc-heavy and the default 50 would degenerate)."""
    from clickhousedatamocker_spark.operators.text_analysis import (
        gopher_oracle_snippets,
    )
    from clickhousedatamocker_spark.queries import REGISTRY

    got = REGISTRY["quality_gopher_rules_profile"].fn(spark, SF_DIR).collect()[0]
    sn = gopher_oracle_snippets()
    v = {
        "too_few": f"({sn['n_words']} < 5)",
        "too_many": f"({sn['n_words']} > 100000)",
        "mean_len": f"({sn['mean_word_len']} < 3.0 OR {sn['mean_word_len']} > 10.0)",
        "symbol": f"({sn['symbol_word_ratio']} > 0.1)",
        "bullet": f"({sn['bullet_line_frac']} > 0.9)",
        "ellipsis": f"({sn['ellipsis_line_frac']} > 0.3)",
        "alpha": f"({sn['alpha_word_frac']} < 0.8)",
        "stop": f"({sn['n_required_stopwords']} < 1)",
    }
    keep = " AND NOT ".join(["TRUE"] + list(v.values()))
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN {sql} THEN 1 ELSE 0 END) AS BIGINT)" for sql in v.values()
    )
    want = duck.execute(
        f"SELECT COUNT(*), CAST(SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT), {sums} FROM documents"
    ).fetchall()[0]
    assert got["n_docs"] == want[0]
    assert got["n_kept"] == want[1]
    assert (
        got["n_viol_too_few_words"],
        got["n_viol_too_many_words"],
        got["n_viol_mean_word_len"],
        got["n_viol_symbol_ratio"],
        got["n_viol_bullet_lines"],
        got["n_viol_ellipsis_lines"],
        got["n_viol_alpha_words"],
        got["n_viol_stopwords"],
    ) == tuple(want[2:])
    # the profile must not be degenerate: some docs pass, some violate
    assert 0 < got["n_kept"] <= got["n_docs"]
