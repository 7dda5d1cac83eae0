"""Checkpointed build: lineage manifest, resume, invalidation."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from algebird_spark.agg import STATE_COL
from algebird_spark.sketches import HLL, from_bytes
from algebird_spark.sources.checkpoint import build_or_resume


@pytest.fixture()
def ckdir(tmp_path):
    d = tmp_path / "ck"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_build_resume_invalidate(spark, ckdir):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    s1 = build_or_resume(spark, li, ["l_returnflag"], "l_partkey",
                         lambda: HLL(p=11), ckdir)
    r1 = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate() for r in s1.collect()}
    manifest = json.load(open(f"{ckdir}/manifest.json"))
    assert manifest["metrics"]["values_processed"] == li.count()
    assert manifest["sketch"]["params"]["p"] == 11
    assert "lineage" in manifest

    # resume: same params -> served from the states parquet, same result
    s2 = build_or_resume(spark, li, ["l_returnflag"], "l_partkey",
                         lambda: HLL(p=11), ckdir)
    r2 = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate() for r in s2.collect()}
    assert r1 == r2

    # param change invalidates and rebuilds with the new params
    s3 = build_or_resume(spark, li, ["l_returnflag"], "l_partkey",
                         lambda: HLL(p=9), ckdir)
    ps = {from_bytes(bytes(r[STATE_COL])).p for r in s3.collect()}
    assert ps == {9}

    # input change (filtered frame) invalidates via the fingerprint
    half = li.filter(F.col("l_orderkey") % 2 == 0)
    s4 = build_or_resume(spark, half, ["l_returnflag"], "l_partkey",
                         lambda: HLL(p=9), ckdir)
    manifest = json.load(open(f"{ckdir}/manifest.json"))
    assert manifest["metrics"]["values_processed"] == half.count()


def test_incremental_append_only_resume(spark, tmp_path, ckdir):
    """Append-only growth sketches ONLY the new files and appends their
    partition states — incremental sketch maintenance via the monoid."""
    from pyspark.sql import Row
    src = str(tmp_path / "events_src")
    spark.createDataFrame([Row(k="a", v=i) for i in range(500)]) \
        .coalesce(1).write.parquet(src)
    df1 = spark.read.parquet(src)
    s1 = build_or_resume(spark, df1, ["k"], "v", lambda: HLL(p=12), ckdir)
    r1 = {r[0]: round(from_bytes(bytes(r[STATE_COL])).estimate())
          for r in s1.collect()}
    assert abs(r1["a"] - 500) <= 30

    # append a new file with new values + a new key
    spark.createDataFrame([Row(k="a", v=500 + i) for i in range(500)]
                          + [Row(k="b", v=i) for i in range(200)]) \
        .coalesce(1).write.mode("append").parquet(src)
    df2 = spark.read.parquet(src)
    s2 = build_or_resume(spark, df2, ["k"], "v", lambda: HLL(p=12), ckdir)
    r2 = {r[0]: round(from_bytes(bytes(r[STATE_COL])).estimate())
          for r in s2.collect()}
    manifest = json.load(open(f"{ckdir}/manifest.json"))
    assert manifest["stage"].startswith("incremental_append"), manifest["stage"]
    assert abs(r2["a"] - 1000) / 1000 <= 0.1
    assert abs(r2["b"] - 200) / 200 <= 0.15

    # incremental result == full rebuild result
    full = build_or_resume(spark, df2, ["k"], "v", lambda: HLL(p=12),
                           str(tmp_path / "ck_full"))
    rf = {r[0]: round(from_bytes(bytes(r[STATE_COL])).estimate())
          for r in full.collect()}
    assert r2 == rf

    # a REWRRITE of an old file must trigger a full rebuild, not append
    spark.createDataFrame([Row(k="a", v=i) for i in range(100)]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    df3 = spark.read.parquet(src)
    s3 = build_or_resume(spark, df3, ["k"], "v", lambda: HLL(p=12), ckdir)
    r3 = {r[0]: round(from_bytes(bytes(r[STATE_COL])).estimate())
          for r in s3.collect()}
    manifest3 = json.load(open(f"{ckdir}/manifest.json"))
    assert manifest3["stage"] == "partition_states"
    assert set(r3) == {"a"} and abs(r3["a"] - 100) <= 15


def test_rollup_or_resume_incremental_cube(spark, tmp_path, ckdir):
    """Incrementally-maintained rollup: after an append-only increment,
    every grouping level derived from the checkpointed states must
    EXACTLY equal a fresh sketch_rollup over the full input (HLL
    register-max associativity), and only the new files are sketched."""
    from pyspark.sql import Row

    from algebird_spark.agg import sketch_rollup
    from algebird_spark.sources.checkpoint import rollup_or_resume

    src = str(tmp_path / "cube_src")
    spark.createDataFrame(
        [Row(k="a", g="x", v=i) for i in range(300)]
        + [Row(k="a", g="y", v=i) for i in range(100, 400)]) \
        .coalesce(1).write.parquet(src)
    df1 = spark.read.parquet(src)

    def ests(levels_df):
        return {tuple(r[c] for c in ("k", "g", "grouping_id")):
                from_bytes(bytes(r[STATE_COL])).estimate()
                for r in levels_df.collect()}

    r1 = ests(rollup_or_resume(spark, df1, ["k", "g"], "v",
                               lambda: HLL(p=12), ckdir))
    assert r1 == ests(sketch_rollup(df1, ["k", "g"], "v",
                                    lambda: HLL(p=12)))

    # append-only increment: new values for (a, y) plus a new (b, x)
    spark.createDataFrame(
        [Row(k="a", g="y", v=400 + i) for i in range(200)]
        + [Row(k="b", g="x", v=i) for i in range(150)]) \
        .coalesce(1).write.mode("append").parquet(src)
    df2 = spark.read.parquet(src)
    r2 = ests(rollup_or_resume(spark, df2, ["k", "g"], "v",
                               lambda: HLL(p=12), ckdir))
    manifest = json.load(open(f"{ckdir}/manifest.json"))
    assert manifest["stage"].startswith("incremental_append"), \
        manifest["stage"]
    assert r2 == ests(sketch_rollup(df2, ["k", "g"], "v",
                                    lambda: HLL(p=12)))
    # the increment's level set includes the new fine key and the
    # rolled-up levels reflect the appended values
    assert ("b", "x", 0) in r2
    assert r2[(None, None, 3)] >= r1[(None, None, 3)]
