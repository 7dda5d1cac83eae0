"""Smoke tests for the spark-submit entrypoints, run in-process with
the shared test session (main(argv, spark=...) skips session teardown).
"""

import json

import pytest

from pyspark.sql import functions as F

from algebird_spark.jobs import build_sketches, dedup_corpus


def test_build_sketches_job(spark, tmp_path):
    out = str(tmp_path / "out")
    m = build_sketches.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--value-col", "n_chars", "--keys", "source",
        "--sketches", "hll,kll", "--output", out,
    ], spark=spark)
    n_sources = (spark.read
                 .parquet("/root/testdata/sf0.001/documents.parquet")
                 .select("source").distinct().count())
    assert m["groups"] == n_sources
    states = spark.read.parquet(out + "/states")
    assert states.count() == n_sources
    est = [json.loads(r["presented"])
           for r in spark.read.json(out + "/estimates").collect()]
    assert all({"hll", "kll"} <= set(e) for e in est)


def test_dedup_corpus_job(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant exact dups AND a near-dup chain for one eligible doc
    base = docs.limit(60)
    exact_dup = base.limit(10).withColumn("doc_id",
                                          F.col("doc_id") + 10_000)
    near = (base.filter(F.length("text") >= 200).limit(5)
            .withColumn("doc_id", F.col("doc_id") + 20_000)
            .withColumn("text", F.concat("text", F.lit(" zzqx917"))))
    inp = str(tmp_path / "docs")
    base.unionByName(exact_dup).unionByName(near) \
        .write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "dedup")
    m = dedup_corpus.main(["--input", inp, "--output", out,
                           "--min-chars", "1"], spark=spark)
    assert m["n_input"] == 75
    assert m["n_after_exact_dedup"] == 65  # 10 exact dups removed
    # 5 planted near-dups clustered away; the base corpus itself holds
    # a couple of genuine near-dup pairs at threshold 0.7, so allow
    # a small number of additional removals
    assert 55 <= m["n_survivors"] <= 60
    surv = spark.read.parquet(out + "/survivors")
    assert surv.count() == m["n_survivors"]
    assert surv.filter(F.col("doc_id") >= 10_000).count() == 0
    clusters = spark.read.parquet(out + "/clusters")
    assert clusters.filter("keep").count() == m["n_survivors"]


def test_dedup_corpus_job_no_near_dup(spark, tmp_path):
    inp = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(40).write.mode("overwrite").parquet(inp)
    m = dedup_corpus.main(["--input", inp, "--near-dup", "none"],
                          spark=spark)
    assert m["n_input"] == 40 and m["n_survivors"] == 40


@pytest.mark.skipif("SPARK_GRAFT_BIG_TESTS" not in __import__("os").environ,
                    reason="spawns two real spark-submit JVMs (~60 s); "
                           "set SPARK_GRAFT_BIG_TESTS=1")
def test_spark_submit_deployment_shape():
    """north_rule deployment: both jobs run via real `spark-submit
    --py-files <zip>` (verified manually this round; scripted in
    scripts/submit_e2e.sh)."""
    import json
    import subprocess
    out = subprocess.run(["bash", "scripts/submit_e2e.sh"],
                         capture_output=True, text=True, timeout=600,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert lines[0]["groups"] > 0
    assert lines[1]["n_survivors"] > 0


def test_dedup_corpus_job_with_decontamination(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(30)
    phrase = "qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8"
    tainted = (docs.limit(4)
               .withColumn("doc_id", F.col("doc_id") + 5000)
               .withColumn("text", F.concat("text", F.lit(" " + phrase))))
    inp = str(tmp_path / "docs")
    docs.unionByName(tainted).write.mode("overwrite").parquet(inp)
    bpath = str(tmp_path / "bench")
    spark.createDataFrame([(phrase,)], "text string") \
        .write.mode("overwrite").parquet(bpath)
    out = str(tmp_path / "out")
    m = dedup_corpus.main(["--input", inp, "--near-dup", "none",
                           "--benchmark", bpath, "--output", out],
                          spark=spark)
    assert m["n_input"] == 34
    assert m["n_after_exact_dedup"] == 34
    assert m["n_survivors"] == 30  # the 4 tainted docs dropped
    assert m["n_decontaminated"] == 4
    # the provenance table must agree with the survivor set
    clusters = spark.read.parquet(out + "/clusters")
    kept_ids = {r["doc_id"] for r in clusters.filter("keep").collect()}
    surv_ids = {r["doc_id"] for r in
                spark.read.parquet(out + "/survivors").collect()}
    assert kept_ids == surv_ids
