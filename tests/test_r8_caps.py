"""Hot-cell guards (r7 judge task 4): a deliberately SKEWED embedding
space — one cell swallowing ~96% of the corpus — must not send the
per-cell pair ops quadratic. s22 splits oversized cells into ≤ _S22_SHELL
shells; t34 caps dominance candidates at the _T34_CAP least-central per
cell. Both fixtures exceed the caps (so the guard genuinely binds) and
both queries are compared against their registered DuckDB oracles on the
same parquet — the caps are part of the SEMANTICS, not a Spark-side
shortcut, so the engines stay bit-exact while the work stays linear."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dask_lightgbm_spark.queries import all_oracles, all_queries
from tools.check import compare

N = 600  # corpus size; non-centroid mass piles into ONE cell
DIM = 64  # the t34 oracle's kmeans CTE is generated for 64 dims


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """600 vectors: a tight cluster around e0 plus isolated satellites on
    orthogonal axes at exactly the ids BOTH cell schemes use as seeds —
    ids 1..7 (t34's k-means inits are vec_id < 8; id 0 stays in-cluster so
    one seed owns the cluster) and the nonzero mod-25 ids (s22's centroid
    scheme). The cluster cell therefore holds ~570 vectors — far above
    both caps (256)."""
    rng = np.random.default_rng(8)
    vecs = np.zeros((N, DIM), dtype=np.float32)
    for i in range(N):
        if i % 25 == 0 and i > 0:
            vecs[i, i // 25] = 1.0  # isolated far centroid on axis i/25
        elif 1 <= i <= 7:
            vecs[i, 30 + i] = 1.0  # far k-means seed on its own axis
        else:
            vecs[i, 0] = 1.0
            vecs[i] += rng.normal(0, 0.01, DIM).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i % 3 for i in range(N)], pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("skew")
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


def _oracle_df(skew_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{skew_dir}/embeddings.parquet')"
    )
    df = con.sql(all_oracles()[name]).df()
    con.close()
    return df


def test_s22_shell_split_bounds_hot_cell(spark, skew_dir):
    from dask_lightgbm_spark.queries.similarity import _S22_SHELL

    spark_pdf = all_queries()["s22_knn_graph"](spark, skew_dir).toPandas()
    duck_pdf = _oracle_df(skew_dir, "s22_knn_graph")
    assert not compare("s22_knn_graph", spark_pdf, duck_pdf)

    # the guard binds: cell 0 exceeds the shell size, yet no (cell, shell)
    # candidate group — the unit of pairwise work — exceeds _S22_SHELL
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{skew_dir}/embeddings.parquet')"
    )
    sizes = con.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
        assigned AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT e.vec_id, c.cid, row_number() OVER (
              PARTITION BY e.vec_id ORDER BY
              list_reduce(list_transform(generate_series(1, len(e.v)),
                i -> e.v[i] * c.cv[i]), (x, y) -> x + y)
              / (sqrt(list_reduce(list_transform(e.v, x -> x*x), (x,y) -> x+y))
                 * sqrt(list_reduce(list_transform(c.cv, x -> x*x), (x,y) -> x+y)))
              DESC, c.cid) AS rn
            FROM e, cent c
          ) WHERE rn = 1
        ),
        cellcounts AS (
          SELECT cell,
                 CAST((COUNT(*) + {_S22_SHELL - 1}) // {_S22_SHELL} AS BIGINT)
                   AS nsh
          FROM assigned GROUP BY cell
        ),
        sharded AS (
          SELECT a.cell, c.nsh,
                 CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                      ::BIGINT % c.nsh AS INT) AS shell
          FROM assigned a JOIN cellcounts c ON a.cell = c.cell
        )
        SELECT max(cnt_cell) AS max_cell, max(cnt_shard) AS max_shard,
               max(nsh) AS max_nsh
        FROM (
          SELECT cell, nsh, COUNT(*) OVER (PARTITION BY cell) AS cnt_cell,
                 COUNT(*) OVER (PARTITION BY cell, shell) AS cnt_shard
          FROM sharded)
        """
    ).fetchone()
    con.close()
    max_cell, max_shard, max_nsh = sizes
    assert max_cell > _S22_SHELL, "fixture must actually overflow a cell"
    assert max_nsh >= 2, "the hot cell must actually split"
    # hash shells are ~SHELL in expectation; 2x bounds the variance while
    # still proving the split keeps per-shell pair work ~SHELL², i.e.
    # TOTAL pair work linear in cell size
    assert max_shard <= 2 * _S22_SHELL
    # every src still gets real neighbors inside its shell
    assert spark_pdf.groupby("src")["rank"].max().max() == 3


def test_t34_dominance_cap_binds_and_matches_oracle(spark, skew_dir):
    from dask_lightgbm_spark.queries.text import _T34_CAP, _T34_K

    spark_pdf = all_queries()["t34_semantic_dedup"](spark, skew_dir).toPandas()
    duck_pdf = _oracle_df(skew_dir, "t34_semantic_dedup")
    assert not compare("t34_semantic_dedup", spark_pdf, duck_pdf)

    # cap-boundary determinism: the cap prefix orders on the FLOAT cs_cent,
    # which is only sound because both engines produce bit-equal cosines
    # (identical sequential folds — see the _T34_CAP comment). Pin that
    # bit-equality explicitly on this cap-BINDING fixture, beyond compare's
    # pass: every cs_cent must be exactly equal, so the (cs_cent, vec_id)
    # cap prefix cannot diverge cross-engine.
    s = spark_pdf.sort_values("vec_id").reset_index(drop=True)
    d = duck_pdf.sort_values("vec_id").reset_index(drop=True)
    assert (s["cs_cent"].values == d["cs_cent"].values).all()

    cells = spark_pdf.groupby("cell").size()
    assert cells.max() > _T34_CAP, "fixture must actually overflow a cell"
    # candidate side is bounded by K x CAP regardless of cell skew, so the
    # pair count is corpus x CAP (linear), never |cell|^2
    assert _T34_K * _T34_CAP < len(spark_pdf) ** 2
    # the hot near-dup cluster still dedups: survivors are a tiny fraction
    kept = spark_pdf[spark_pdf.kept]
    assert len(kept) < len(spark_pdf) * 0.2
    assert len(kept) >= 1


def test_t43_dedup_skew_verdict_flips(spark, tmp_path):
    """The dataset card's dedup-key skew verdict (q85's diagnostic wired
    into t43): a source where one viral text dominates the digest key
    flags dedup_key_skewed=true; a healthy all-distinct source stays
    false — and the whole card still matches the DuckDB oracle."""
    rows = []
    for i in range(200):  # viral template: one digest owns 200 rows
        rows.append((i, "breaking news template shared verbatim", "en", "hot"))
    for i in range(200, 230):
        rows.append((i, f"distinct hot-source doc number {i} words", "en", "hot"))
    for i in range(230, 330):
        rows.append((i, f"unique healthy corpus document {i} tokens", "de", "ok"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    spark_pdf = all_queries()["t43_dataset_card"](spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    duck_pdf = con.sql(all_oracles()["t43_dataset_card"]).df()
    con.close()
    assert not compare("t43_dataset_card", spark_pdf, duck_pdf)

    verdict = spark_pdf.set_index("source")["dedup_key_skewed"]
    assert bool(verdict["hot"]) is True
    assert bool(verdict["ok"]) is False
    assert spark_pdf.set_index("source")["max_dup_group"]["hot"] == 200
