"""Checkpointed sketch builds with lineage + metrics (north_rule:
"checkpointed per-partition sketch state with lineage + metrics for
resumability").

Layout under ``checkpoint_dir``:
  states/            parquet of (keys..., sketch_state, n_values)
  manifest.json      lineage: input path + fingerprint, sketch params,
                     stage, metrics (rows, values, wall seconds), UTC ts

``build_or_resume`` recomputes only when the manifest is missing or the
input fingerprint changed; otherwise it serves the persisted states —
a restarted job (driver OOM, preemption) resumes at the merge stage
instead of rescanning the input.
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..agg import COUNT_COL, SketchFactory, merge_sketches, sketch_partitions

MANIFEST = "manifest.json"


def input_fingerprint(df: DataFrame) -> dict:
    """Input identity: schema + row count + a content signal (source
    file list with sizes/mtimes), so a rewrite that preserves the row
    count — replaced partitions, updated values — still invalidates the
    checkpoint. (At warehouse scale swap the file walk for the Iceberg
    snapshot id / Delta version from the table metadata.)"""
    files = []
    try:
        for p in sorted(df.inputFiles()):
            local = p[len("file:"):] if p.startswith("file:") else p
            try:
                st = os.stat(local)
                files.append([p, int(st.st_size), int(st.st_mtime)])
            except OSError:  # remote FS: path alone still contributes
                files.append([p, -1, -1])
    except Exception:  # non-file-based source (e.g. in-memory view)
        pass
    return {"schema": df.schema.simpleString(), "rows": df.count(),
            "files": files}


def _describe_factory(factory: SketchFactory) -> dict:
    probe = factory()
    return {"kind": type(probe).__name__, "params": probe._params()}


def _incremental_files(manifest: dict, fp: dict) -> list[str] | None:
    """If the input grew APPEND-ONLY since the checkpoint (every old
    file unchanged, >= 1 new file), return the new file paths; else
    None. This is the snapshot-diff a table format provides natively
    (Iceberg incremental scan between snapshot ids) — here derived from
    the file-level fingerprint."""
    old = {tuple(f[:1])[0]: f for f in manifest.get(
        "input_fingerprint", {}).get("files", [])}
    new = {f[0]: f for f in fp.get("files", [])}
    if not old or not new:
        return None
    if manifest["input_fingerprint"].get("schema") != fp.get("schema"):
        return None
    if not set(old) < set(new):
        return None
    if any(old[p] != new[p] for p in old):  # old file rewritten
        return None
    return sorted(set(new) - set(old))


def build_or_resume(spark: SparkSession, df: DataFrame, keys: Sequence[str],
                    value_col: str, factory: SketchFactory,
                    checkpoint_dir: str, fanout: int = 0,
                    premerge: int | None = None,
                    job_id: str = "sketch_job") -> DataFrame:
    """Per-key sketch states with a persisted partition-state checkpoint.

    Resume ladder:
      1. unchanged input -> serve persisted states (merge only);
      2. APPEND-ONLY growth -> sketch ONLY the new files, append their
         partition states to the checkpoint (incremental maintenance —
         the mergeable-monoid property is exactly what makes a sketch
         over yesterday's 10^12 rows reusable when today adds 10^9);
      3. anything else (rewrite, schema change, different params) ->
         full rebuild.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    man_path = os.path.join(checkpoint_dir, MANIFEST)
    states_path = os.path.join(checkpoint_dir, "states")
    fp = input_fingerprint(df)
    desc = _describe_factory(factory)

    incr_files: list[str] | None = None
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
        compatible = (manifest.get("sketch") == desc
                      and manifest.get("keys") == list(keys)
                      and manifest.get("value_col") == value_col
                      and os.path.exists(
                          os.path.join(states_path, "_SUCCESS")))
        if compatible and manifest.get("input_fingerprint") == fp:
            states = spark.read.parquet(states_path)
            return merge_sketches(states, keys, fanout=fanout,
                                  premerge=premerge)
        if compatible:
            incr_files = _incremental_files(manifest, fp)

    t0 = time.time()
    if incr_files:
        delta = spark.read.schema(df.schema).parquet(*incr_files)
        new_states = sketch_partitions(delta, value_col, factory, keys)
        new_states.write.mode("append").parquet(states_path)
        stage = f"incremental_append({len(incr_files)} files)"
    else:
        partition_states = sketch_partitions(df, value_col, factory, keys)
        partition_states.write.mode("overwrite").parquet(states_path)
        stage = "partition_states"
    states = spark.read.parquet(states_path)
    n_states = states.count()
    n_values = states.agg({COUNT_COL: "sum"}).collect()[0][0]
    manifest = {
        "job_id": job_id,
        "stage": stage,
        "keys": list(keys),
        "value_col": value_col,
        "sketch": desc,
        "input_fingerprint": fp,
        "metrics": {
            "partition_states": int(n_states),
            "values_processed": int(n_values or 0),
            "build_seconds": round(time.time() - t0, 3),
        },
        "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "lineage": {
            "engine": "algebird_spark",
            "topology": "mapInArrow partition-combine -> parquet checkpoint"
                        " -> groupBy merge" + (f" (fanout={fanout})" if fanout else ""),
        },
    }
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return merge_sketches(states, keys, fanout=fanout, premerge=premerge)
