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
