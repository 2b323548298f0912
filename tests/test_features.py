"""Hashed-BOW featurization: the zero-shuffle vector path must agree with
the relational (oracled) counts view, and the vectors must actually feed
MLlib training."""

from pyspark.sql import functions as F

from dask_lightgbm_spark.operators.features import hashed_bow, hashed_bow_vectors
from dask_lightgbm_spark.sources.readers import load_table

B = 32


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
