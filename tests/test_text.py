"""Text-analysis operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_lightgbm_spark.operators import text_ops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat", "en"),
        (1, "  padded   with   spaces  ", "en"),
        (2, "der hund ist und die katze", "de"),
        (3, "one", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_token_count(spark, docs):
    out = {
        r.doc_id: r.n
        for r in docs.select("doc_id", text_ops.token_count(F.col("text")).alias("n")).collect()
    }
    assert out == {0: 3, 1: 3, 2: 6, 3: 1}


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, "Hello   World"), (1, "hello world"), (2, " HELLO\tWORLD ")],
            columns=["doc_id", "text"],
        )
    )
    fps = {r.doc_id: r.fp for r in text_ops.fingerprint(df, "doc_id", "text").collect()}
    assert fps[0] == fps[1] == fps[2]


def test_quality_features(docs):
    out = {r.doc_id: r for r in text_ops.text_quality(docs, "doc_id", "text").collect()}
    r = out[0]  # "the cat sat": 11 chars, 3 tokens, 9 non-space
    assert r.n_chars == 11 and r.n_tokens == 3
    assert r.avg_token_len == 3.0
    assert abs(r.space_ratio - 2 / 11) < 1e-15
    assert abs(r.stop_ratio - 1 / 3) < 1e-15


def test_lang_id_deterministic(docs):
    out1 = sorted(text_ops.lang_id(docs, "doc_id", "text").collect())
    out2 = sorted(text_ops.lang_id(docs, "doc_id", "text").collect())
    assert out1 == out2
    preds = {r.doc_id: r.pred_lang for r in out1}
    assert preds[2] == "de"  # der/und/ist/die markers present
    assert preds[0] == "en"  # 'the' marker


def test_repetition_ratio_short_docs(spark):
    """Docs under 3 tokens must yield 0 grams, not crash: Spark's
    sequence(1, 0) is the DESCENDING [1, 0] (review finding)."""
    import pandas as pd

    from dask_lightgbm_spark.queries.text import t15_repetition_ratio  # noqa: F401
    from dask_lightgbm_spark.queries import all_queries
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["", "one", "one two", "a a a a a a"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [0, 3, 7, 11],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in all_queries()["t15_repetition_ratio"](spark, d).collect()}
        assert out[0].n_grams == 0 and out[0].rep_ratio == 0.0
        assert out[1].n_grams == 0 and out[2].n_grams == 0
        assert out[3].n_grams == 4 and out[3].n_distinct == 1
        assert out[3].rep_ratio == 0.75


def test_quality_degenerate_docs(spark):
    """Empty / whitespace-only docs: ANSI Spark must NULL the ratios like
    the DuckDB oracle, not raise DIVIDE_BY_ZERO."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["", "   "]})
    )
    out = {r.doc_id: r for r in text_ops.text_quality(df, "doc_id", "text").collect()}
    assert out[0].n_tokens == 0 and out[0].avg_token_len is None
    assert out[0].space_ratio is None  # n_chars == 0
    assert out[1].n_tokens == 0 and out[1].stop_ratio is None


def test_lang_id_works_without_lang_column(spark):
    """lang_id must not require a ground-truth 'lang' column (generic
    operator; the documents fixture just happens to carry one)."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["the cat sat", "der hund ist"]})
    )
    out = {r.doc_id: r.pred_lang for r in text_ops.lang_id(df, "doc_id", "text").collect()}
    assert out == {0: "en", 1: "de"}


def test_vertical_tab_is_not_a_token_separator(spark):
    """Cross-engine tokenizer parity (r2 advisor): Java's \\s matches \\x0B
    but DuckDB/RE2's does not, so the tokenizer uses an explicit class
    [ \\t\\n\\f\\r] in BOTH engines — a \\x0B joins its neighbors into one
    token, identically on each side."""
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a\x0bb c"]}))
    n = df.select(text_ops.token_count(F.col("text")).alias("n")).collect()[0].n
    duck_n = duckdb.sql(
        r"""SELECT len(list_filter(string_split_regex(trim('a' || chr(11) || 'b c'),
            '[ \t\n\f\r]+'), x -> x <> ''))"""
    ).fetchone()[0]
    assert n == duck_n == 2


def test_t19_distributed_branch_matches_gathered_branch(spark, monkeypatch):
    """The driver-budget fallback (_t19_distributed, taken when the eval
    split's size estimate exceeds SPARK_GRAFT_T19_DRIVER_BYTES) must
    produce exactly the gathered-set branch's rows, and its plan must hold
    no driver-resident eval set (no broadcast of the eval shingles — the
    join is pinned shuffle_hash)."""
    from dask_lightgbm_spark.queries import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    base = qs["t19_decontamination"](spark, sf).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_T19_DRIVER_BYTES", "0")
    wide_df = qs["t19_decontamination"](spark, sf)
    wide = wide_df.toPandas()
    pd.testing.assert_frame_equal(
        base.sort_values("doc_id").reset_index(drop=True),
        wide.sort_values("doc_id").reset_index(drop=True),
    )
    plan = wide_df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "MapInArrow" in plan
