"""Partition-invariance audit: run every __spark_entry__ query at sf0.01
under two different (cores, shuffle_partitions, maxPartitionBytes)
regimes and bit-compare the results. A query whose output changes is
driver-fragile: the driver's correctness run may use different
parallelism than the local gate, and float partial-aggregation order
follows partitioning."""
import sys, json, math

sys.path.insert(0, "/root/repo")
from tiger_etl_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.01"


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v.hex()  # bit-exact
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def run_all(cores, shuffle, mpb):
    spark = get_spark(
        f"pinv{cores}",
        cores=cores,
        shuffle_partitions=shuffle,
        extra_conf={"spark.sql.files.maxPartitionBytes": mpb},
    )
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF)
            rows = sorted(
                tuple(norm(v) for v in r) for r in df.collect()
            )
            out[name] = (tuple(df.columns), rows)
        except Exception as exc:  # noqa: BLE001
            out[name] = ("ERROR", repr(exc)[:200])
    spark.stop()
    return out


a = run_all(4, 4, "16m")
b = run_all(16, 37, "1m")
bad = []
for name in a:
    if a[name] != b[name]:
        bad.append(name)
print("FRAGILE:", json.dumps(bad))
for name in bad:
    ra, rb = a[name][1], b[name][1]
    if isinstance(ra, list) and isinstance(rb, list):
        diffs = [(x, y) for x, y in zip(ra, rb) if x != y][:2]
        print(name, "first diffs:", diffs)
    else:
        print(name, a[name][:1], b[name][:1])
