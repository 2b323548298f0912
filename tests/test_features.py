"""Hashed-BOW featurization: the zero-shuffle vector path must agree with
the relational (oracled) counts view, the vectors must actually feed
MLlib training, and the large-B sparse path must agree with the COO view
at HashingTF scale (2^18 buckets) while shipping only non-zero entries —
in the unwrapped-VectorUDT struct shape the barrier training kernel's
CSR assembler consumes directly."""

import numpy as np
from pyspark.sql import functions as F

from dask_lightgbm_spark.operators.features import (
    hashed_bow,
    hashed_bow_sparse,
    hashed_bow_vectors,
)
from dask_lightgbm_spark.sources.readers import load_table

B = 32
B_BIG = 1 << 18


def test_vector_path_matches_relational_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    coo = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_bow(d, "doc_id", "text", B).collect()
    }
    from pyspark.ml.functions import vector_to_array

    vecs = hashed_bow_vectors(d, "doc_id", "text", B).select(
        "doc_id", vector_to_array("features").alias("arr")
    )
    for r in vecs.collect():
        for b, v in enumerate(r["arr"]):
            assert coo.get((r["doc_id"], b), 0) == int(v), (r["doc_id"], b)


def test_vectors_train_mllib(spark, sf_dir):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.sql.types import DoubleType

    d = load_table(spark, sf_dir, "documents")
    feats = hashed_bow_vectors(d, "doc_id", "text", B)
    labeled = feats.join(
        d.select(
            "doc_id",
            (F.col("n_chars") >= 200).cast(DoubleType()).alias("label"),
        ),
        "doc_id",
    )
    model = LogisticRegression(maxIter=5, regParam=0.01).fit(labeled)
    pred = model.transform(labeled)
    acc = pred.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    # the length proxy is learnable from token counts — wide margin
    assert acc > 0.7, acc


def test_sparse_path_matches_relational_counts_at_hashingtf_scale(spark, sf_dir):
    """B = 2^18: the dense path refuses this regime; the sparse path must
    agree with the (oracled) COO view exactly, with strictly increasing
    indices (the CSR precondition) and only non-zero entries shipped."""
    d = load_table(spark, sf_dir, "documents").limit(50)
    coo = {}
    for r in hashed_bow(d, "doc_id", "text", B_BIG).collect():
        coo.setdefault(r["doc_id"], {})[r["bucket"]] = float(r["cnt"])
    rows = hashed_bow_sparse(d, "doc_id", "text", B_BIG).collect()
    assert len(rows) == 50
    for r in rows:
        fv = r["features"]
        assert fv["type"] == 0 and fv["size"] == B_BIG
        idx, vals = list(fv["indices"]), list(fv["values"])
        assert idx == sorted(idx) and len(idx) == len(set(idx)), r["doc_id"]
        assert all(v > 0 for v in vals)
        assert dict(zip(idx, vals)) == coo.get(r["doc_id"], {}), r["doc_id"]


def test_sparse_path_is_zero_shuffle(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    plan = (
        hashed_bow_sparse(d, "doc_id", "text", B_BIG)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_sparse_structs_feed_the_csr_assembler(spark, sf_dir):
    """The featurize → Arrow → CSR handoff the docstring promises: collected
    struct rows (the same dict shape unwrap_udt + toPandas gives the barrier
    kernel) go straight through core._csr_from_unwrapped; row sums must
    equal each doc's token count (every token lands in exactly one bucket).
    Without scipy in the image the assembler densifies — same counts."""
    from dask_lightgbm_spark.core import _csr_from_unwrapped

    d = load_table(spark, sf_dir, "documents").limit(20).orderBy("doc_id")
    pdf = hashed_bow_sparse(d, "doc_id", "text", B_BIG).orderBy("doc_id").toPandas()
    mat = _csr_from_unwrapped(pdf["features"], B_BIG)
    dense = mat.toarray() if hasattr(mat, "toarray") else mat
    assert dense.shape == (20, B_BIG)
    tok_counts = [
        r["n_tok"]
        for r in d.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.trim("text"), r"[ \t\n\f\r]+"), lambda x: x != ""
                )
            ).alias("n_tok"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert np.array_equal(dense.sum(axis=1), np.array(tok_counts, dtype=np.float64))


def test_columnar_frame_builder_matches_dict_builder():
    """r13 verdict #5: predict_udf_for_vector now assembles CSR from the
    struct's child arrays directly (no ``to_dict("records")``). The
    columnar builder must be bit-identical to the dict-row builder on
    every layout the Arrow hand-off produces: all-sparse, mixed
    dense+sparse, and rows with empty index lists."""
    import pandas as pd

    from dask_lightgbm_spark.core import _csr_from_struct_frame, _csr_from_unwrapped

    nf = 16
    sparse_rows = [
        {"type": 0, "size": nf, "indices": np.array([1, 5], dtype=np.int32),
         "values": np.array([1.5, -2.0])},
        {"type": 0, "size": nf, "indices": np.array([], dtype=np.int32),
         "values": np.array([])},
        {"type": 0, "size": nf, "indices": np.array([0, 7, 15], dtype=np.int32),
         "values": np.array([3.0, 4.0, 5.0])},
    ]
    mixed_rows = sparse_rows + [
        {"type": 1, "size": nf, "indices": None,
         "values": np.arange(nf, dtype=np.float64)},
    ]
    for rows in (sparse_rows, mixed_rows):
        frame = pd.DataFrame(rows)
        a = _csr_from_unwrapped(rows, nf)
        b = _csr_from_struct_frame(frame, nf)
        da = a.toarray() if hasattr(a, "toarray") else a
        db = b.toarray() if hasattr(b, "toarray") else b
        assert da.shape == db.shape == (len(rows), nf)
        assert np.array_equal(da, db)
