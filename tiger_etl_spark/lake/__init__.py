from tiger_etl_spark.lake.table import LakeTable, MergeStats  # noqa: F401
from tiger_etl_spark.lake.txn import LakeTransaction  # noqa: F401
