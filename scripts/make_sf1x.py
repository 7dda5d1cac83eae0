"""Build a sf1.0-SHAPED measurement fixture by replicating sf0.1 ten
times with key offsets (cardinalities scale ~10x, like the driver's
sf1.0 vs sf0.1), written as ONE parquet file per table to mirror the
driver fixture's few-row-group layout. For RELATIVE A/B timing only —
never for correctness (the driver's sf1.0 generator is not public).

Usage: python scripts/make_sf1x.py [out_dir] [tables...]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
TABLES = sys.argv[2:] or ["lineitem", "orders", "customer", "part",
                          "supplier", "documents", "events", "embeddings"]
SRC = "/root/testdata/sf0.1"

# key columns to offset per replica so distinct cardinalities scale
OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}

# ~19 MB row groups => the 10x lineitem lands at ~6 row groups, the
# same scan-task ceiling as the driver's real sf1.0 single-file layout
ROW_GROUP_BYTES = 19 * 1024 * 1024


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("make_sf1x")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in TABLES:
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        keys = OFFSETS.get(name, [])
        offs = {k: src.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(10):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * offs[k]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        tmp = f"{OUT}/__tmp_{name}"
        out.coalesce(1).write.mode("overwrite") \
            .option("parquet.block.size", str(ROW_GROUP_BYTES)) \
            .parquet(tmp)
        part_file = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(f"{tmp}/{part_file}", f"{OUT}/{name}.parquet")
        shutil.rmtree(tmp)
        print(f"{name}: {spark.read.parquet(f'{OUT}/{name}.parquet').count()} rows")


if __name__ == "__main__":
    main()
