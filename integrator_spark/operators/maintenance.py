"""Table-maintenance operators — the jobs that keep a 100 TB parquet
lake healthy: small-file compaction and schema-evolution reads.

Small files are the dominant operational failure mode of long-running
ingestion (every streaming micro-batch and every over-parallel write
leaves shards); compaction rewrites a directory into ~target-sized
files without changing a single row. Schema evolution is its sibling:
old batches lack columns that new batches have, and the reader must
union them without rewriting history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    target_file_mb: int = 128) -> DataFrame:
    """Rewrite a parquet directory into ~target-sized files.

    File count is derived from actual input bytes (never from row
    counts); the rewrite is one job with no shuffle — coalesce only
    narrows partitions. Returns the re-read compacted frame.
    """
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(src_dir)
        for f in files if f.endswith(".parquet"))
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)


def read_with_evolution(spark: SparkSession, *batch_dirs: str) -> DataFrame:
    """Read batches written under evolving schemas as one frame
    (mergeSchema: missing columns null-fill per batch)."""
    return (spark.read.option("mergeSchema", True)
            .parquet(*batch_dirs))


def write_snapshot(df, root: str, version: int) -> None:
    """Write one immutable snapshot of a table (``v=N`` directory +
    manifest) — the minimal time-travel layout: every version is a
    complete, self-describing copy; readers never see a partial write
    because the manifest is committed last (rename is atomic on a
    POSIX/DFS dir). Lake formats (Delta/Iceberg) refine this with
    delta logs + shared data files; the read contract is the same."""
    import json
    import os

    path = os.path.join(root, f"v={version}")
    df.write.mode("overwrite").parquet(path)
    manifest = {"version": version, "path": path}
    tmp = os.path.join(root, f"_manifest.v{version}.json.tmp")
    final = os.path.join(root, f"_manifest.v{version}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, final)


def read_snapshot(spark, root: str, version: int | None = None):
    """Time-travel read: a specific version, or the latest committed
    manifest when ``version`` is None. Only versions with a committed
    manifest are visible — an interrupted write leaves no manifest and
    is invisible, which is the whole point."""
    import json
    import os

    manifests = sorted(
        (f for f in os.listdir(root)
         if f.startswith("_manifest.v") and f.endswith(".json")),
        key=lambda f: int(f[len("_manifest.v"):-len(".json")]))
    if not manifests:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    if version is None:
        chosen = manifests[-1]
    else:
        chosen = f"_manifest.v{version}.json"
        if chosen not in manifests:
            raise FileNotFoundError(f"version {version} not committed")
    with open(os.path.join(root, chosen)) as fh:
        return spark.read.parquet(json.load(fh)["path"])


def vacuum_snapshots(root: str, keep: int) -> list[int]:
    """Retention cleanup for write_snapshot trees: keep the newest
    ``keep`` committed versions, delete older data dirs AND their
    manifests (manifest first, so a reader never sees a manifest whose
    data is gone). Returns the versions removed."""
    import json
    import os
    import shutil

    manifests = sorted(
        (f for f in os.listdir(root)
         if f.startswith("_manifest.v") and f.endswith(".json")),
        key=lambda f: int(f[len("_manifest.v"):-len(".json")]))
    doomed = manifests[:-keep] if keep else manifests
    removed = []
    for mf in doomed:
        with open(os.path.join(root, mf)) as fh:
            meta = json.load(fh)
        os.remove(os.path.join(root, mf))          # manifest first
        shutil.rmtree(meta["path"], ignore_errors=True)
        removed.append(meta["version"])
    return removed
