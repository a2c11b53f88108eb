"""Per-partition checkpointed build with lineage + metrics (north_rule).

The reference build is all-or-nothing (a crashed worker loses the run,
SURVEY.md §4 "Checkpoint / resume: None").  Here the input file list is
split into P partitions; each partition's partial banks are merged and
written to ``<index>/_ckpt/partition=<id>/banks`` together with a
``manifest.json`` recording lineage (input files, sizes), metrics (rows,
windows, wall seconds) and the config hash.  A re-run skips every partition
whose manifest matches; the final merge unions the partition banks (valid
partials, since OR/max/sum merges are idempotent and associative) into the
index.  Partition outputs are written to a temp dir and renamed, so a kill
mid-partition never leaves a partial checkpoint behind.

The final publish is crash-safe too: the merged banks are written to a
sibling temp dir, the old ``manifest.json`` (the index's validity marker)
is removed FIRST, the banks dir is swapped in with an atomic
``os.replace``, and ``sources.parquet`` is rewritten before the new
manifest — so at every instant the index is either valid-and-complete or
visibly absent (``BankIndex.load`` raises instead of serving stale banks),
and a crash at any point resumes cleanly from the per-partition
checkpoints.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import ray.data as rd

from ..config import SketchConfig
from ..sources import io as bank_io
from ..pipelines.build import merge_banks, partial_banks, read_tokens

CKPT = "_ckpt"


def _partition_files(files: list[str], n_partitions: int) -> list[list[str]]:
    files = sorted(files)
    n_partitions = max(1, min(n_partitions, len(files)))
    out: list[list[str]] = [[] for _ in range(n_partitions)]
    for i, f in enumerate(files):
        out[i % n_partitions].append(f)
    return out


def _manifest_matches(path: str, files: list[str], cfg: SketchConfig) -> bool:
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return False
    # content guard: regenerated-in-place inputs must invalidate; size
    # alone misses same-size rewrites, so mtime_ns is checked too.  Each
    # mismatch is logged so an operator can tell an intentional format bump
    # (e.g. a manifest written before a key existed) from input churn.
    checks = {
        "files": (doc.get("files"), files),
        "config": (doc.get("config"), json.loads(cfg.to_json())),
        "file_bytes": (doc.get("file_bytes"), [os.path.getsize(f) for f in files]),
        "file_mtime_ns": (
            doc.get("file_mtime_ns"), [os.stat(f).st_mtime_ns for f in files]
        ),
    }
    stale = [k for k, (got, want) in checks.items() if got != want]
    if stale:
        print(
            f"[checkpoint] invalidating {path}: mismatch on {stale} "
            "(missing keys mean the manifest predates the current format)"
        )
        return False
    return True


def build_with_checkpoints(
    input_files: list[str] | str,
    cfg: SketchConfig,
    index_dir: str,
    n_partitions: int = 8,
) -> dict:
    """Build (or resume building) the index; returns a report dict with
    per-partition status.  Safe to re-invoke after any interruption."""
    if isinstance(input_files, str):
        input_files = sorted(glob.glob(os.path.join(input_files, "*.parquet")))
    parts = _partition_files(list(input_files), n_partitions)
    ckpt_root = os.path.join(index_dir, CKPT)
    os.makedirs(ckpt_root, exist_ok=True)
    report: dict = {"partitions": [], "resumed": 0, "built": 0}
    for pid, files in enumerate(parts):
        pdir = os.path.join(ckpt_root, f"partition={pid:05d}")
        manifest = os.path.join(pdir, "manifest.json")
        if _manifest_matches(manifest, files, cfg):
            report["resumed"] += 1
            report["partitions"].append({"id": pid, "status": "skipped"})
            continue
        shutil.rmtree(pdir, ignore_errors=True)
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.perf_counter()
        merged = merge_banks(partial_banks(read_tokens(files), cfg), cfg)
        merged.write_parquet(
            os.path.join(tmp, "banks"), **bank_io.BANK_PARQUET_ARGS
        )
        # metrics from the merged stats rows (small read)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        stats = pq.read_table(
            os.path.join(tmp, "banks"), columns=["shard_id", "n_docs", "n_wins"]
        )
        stats = stats.filter(pc.equal(stats["shard_id"], -1))
        wall = time.perf_counter() - t0
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(
                {
                    "partition": pid,
                    "files": files,
                    "file_bytes": [os.path.getsize(f) for f in files],
                    "file_mtime_ns": [os.stat(f).st_mtime_ns for f in files],
                    "config": json.loads(cfg.to_json()),
                    "n_docs": int(pc.sum(stats["n_docs"]).as_py() or 0),
                    "n_wins": int(pc.sum(stats["n_wins"]).as_py() or 0),
                    "wall_sec": round(wall, 3),
                    "finished_unix": time.time(),
                },
                fh, indent=2,
            )
        os.replace(tmp, pdir)  # atomic publish
        report["built"] += 1
        report["partitions"].append({"id": pid, "status": "built", "wall_sec": wall})
    # final merge across partitions (partition banks are valid partials)
    banks_dir = os.path.join(index_dir, bank_io.BANKS)
    banks_tmp = banks_dir + ".tmp"
    shutil.rmtree(banks_tmp, ignore_errors=True)
    part_files: list[str] = []
    for pid in range(len(parts)):
        part_files.extend(
            sorted(glob.glob(os.path.join(ckpt_root, f"partition={pid:05d}", "banks", "*.parquet")))
        )
    part_banks = rd.read_parquet(part_files)
    # per-partition checkpoints stay flat (internal partials); only the
    # published index gets the hive srcbucket layout
    from ..pipelines.build import write_banks

    shard_buckets = min(bank_io.N_SHARD_BUCKETS, cfg.shards)
    write_banks(
        merge_banks(part_banks, cfg), banks_tmp, bank_io.N_SRC_BUCKETS,
        shard_buckets,
    )
    # atomic-ish publish: invalidate FIRST (the manifest is the validity
    # marker BankIndex.load keys on), swap banks in one rename, then write
    # sources before the manifest — no window serves a stale or partial index
    for stale in (bank_io.MANIFEST, bank_io.SOURCES):
        try:
            os.remove(os.path.join(index_dir, stale))
        except FileNotFoundError:
            pass
    shutil.rmtree(banks_dir, ignore_errors=True)
    os.replace(banks_tmp, banks_dir)
    bank_io.write_sources_summary(index_dir, cfg)
    bank_io.write_manifest(
        index_dir, cfg,
        extra={"checkpointed": True, "n_partitions": len(parts),
               "resumed_partitions": report["resumed"],
               "src_buckets": bank_io.N_SRC_BUCKETS,
               "shard_buckets": shard_buckets},
    )
    return report
