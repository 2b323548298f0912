from dask_lightgbm_spark.sources.readers import load_table, load_tables, read_csv_glob

__all__ = ["load_table", "load_tables", "read_csv_glob"]
