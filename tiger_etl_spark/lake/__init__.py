from tiger_etl_spark.lake.table import LakeTable, MergeStats  # noqa: F401
