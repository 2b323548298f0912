"""Ship this package to the Python workers, once per session.

Executor-side closures in the query layer are written to be
self-contained, but anything pickled BY REFERENCE — the histgbm model
classes the barrier trainer sends as ``model_factory``, or a user
callback — needs ``dask_lightgbm_spark`` importable inside the executor
Python workers. On a real cluster that normally means ``--py-files`` /
an installed wheel; this makes the library self-sufficient either way
(the Dask reference gets the same property from distributed's automatic
client-to-worker module distribution)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Zip the package once per session and ``addPyFile`` it so workers
    can import it regardless of the driver's cwd/PYTHONPATH."""
    sc = spark.sparkContext
    if getattr(sc, "_dls_pkg_shipped", False):
        return
    import os
    import shutil
    import tempfile

    import dask_lightgbm_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"dask_lightgbm_spark_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", os.path.dirname(pkg_dir), "dask_lightgbm_spark"
    )
    sc.addPyFile(zip_path)
    sc._dls_pkg_shipped = True
