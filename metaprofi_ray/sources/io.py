"""Bank-index on-disk layout: Parquet + JSON manifest.

Replaces the reference's Zarr matrix/index stores
(/root/reference/metaprofi/lib/zarrstore.py:235-291,
/root/reference/metaprofi/lib/build_index_zarr.py:90-97) with:

    <index_dir>/manifest.json          frozen SketchConfig + build metadata
    <index_dir>/banks/*.parquet        merged rows (source, shard_id, bits …)
    <index_dir>/sources.parquet        per-source summary (n_docs, n_wins,
                                       hll_distinct, fpr_bound, col_idx)

``sources.parquet`` is the analogue of the reference's ``Metadata`` sample-id
array (zarrstore.py:258-272) — the small side every query broadcast-joins
against (SURVEY.md §2.5 J1).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import SketchConfig
from ..sketches import bloom, hll
from ..stages.bloom_build import STATS_SHARD


# Bank Parquet codec: zstd-3 stores the sparse-fill bit rows at ~0.20x of
# the logical dense bytes (vs 0.34x for the default codec; the reference's
# PackBits+zstd-9 reaches 0.17x at 6x the write cost — measured by
# scripts/bank_bytes.py, table in BENCH/BASELINE.md).
BANK_PARQUET_ARGS = {"compression": "zstd", "compression_level": 3}

MANIFEST = "manifest.json"
BANKS = "banks"
SOURCES = "sources.parquet"

# Default hive-partition fan-out for the bank layout: banks are written
# under ``banks/srcbucket=<hash64(source) % N>/`` so (a) every shard row of
# a source lands in ONE directory (the streaming prober's order-preserving
# coalesce becomes a no-op instead of a correctness crutch) and (b) a
# source-restricted query prunes whole directories at the read — the
# bank-side mirror of what IVF cells do for ANN (TODO r3 §2).
N_SRC_BUCKETS = 16

# Second hive key: ``shardbucket = shard_id % N_SHARD_BUCKETS``.  The
# distributed-probe streaming path (stages.probe_distributed) co-partitions
# the probe set with the banks by shard bucket; with this key in the layout
# each per-bucket prober sub-pipeline reads ONLY its bucket's bank files —
# no read amplification, no bank shuffle.  Stats rows (shard_id = -1) land
# in ``shardbucket=-1``.
#
# This is ALSO the distributed query path's parallelism unit: probe plans
# build one task per bucket, so on a large cluster the bucket count should
# be sized to the cluster (a deployment knob, like shards).  The value is
# baked into each index's manifest at build time (readers use the
# manifest, never this constant), so the override only affects NEW builds
# and must be ≤ cfg.shards to be effective.
N_SHARD_BUCKETS = int(os.environ.get("METAPROFI_SHARD_BUCKETS", "8"))


def hash64_str(s: str) -> int:
    """Cross-process-deterministic 64-bit string hash (Python ``hash`` is
    salted per process and would split groupby keys / bucket layouts)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
    )


def src_bucket(source: str, n: int = N_SRC_BUCKETS) -> int:
    return hash64_str(source) % n


def with_srcbucket(t: pa.Table, n: int, shard_buckets: int = 0) -> pa.Table:
    """Append the hive-partition key column(s) (post-merge rows only — one
    row per (source, shard), so the per-row hash loop is off the hot
    path)."""
    b = [src_bucket(s, n) for s in t["source"].to_pylist()]
    t = t.append_column("srcbucket", pa.array(b, pa.int32()))
    if shard_buckets > 0:
        sid = np.asarray(t["shard_id"].to_numpy(zero_copy_only=False))
        sb = np.where(sid >= 0, sid % shard_buckets, -1).astype(np.int32)
        t = t.append_column("shardbucket", pa.array(sb, pa.int32()))
    return t


def bank_files(
    index_dir: str,
    sources: list[str] | None = None,
    shard_bucket: int | None = None,
) -> tuple[list[str], int]:
    """Bank parquet files (sorted, so bucket dirs stay contiguous) and the
    total file count.  With ``sources`` and a bucketed layout, returns only
    the files under the srcbucket dirs those sources hash to — read
    pruning the caller can assert (``len(files) < total``).
    ``shard_bucket`` additionally restricts to one shardbucket dir (plus
    the stats dir is always EXCLUDED when a shard_bucket is requested);
    on layouts without the shardbucket key the full list is returned."""
    import glob
    import re

    banks_dir = os.path.join(index_dir, BANKS)
    files = sorted(
        glob.glob(os.path.join(banks_dir, "**", "*.parquet"), recursive=True)
    )
    total = len(files)
    if not sources and shard_bucket is None:
        return files, total
    _, doc = read_manifest(index_dir)
    if sources and doc.get("src_buckets"):
        n = int(doc["src_buckets"])
        wanted = {src_bucket(s, n) for s in sources}
        pat = re.compile(r"srcbucket=(-?\d+)")
        files = [
            f for f in files
            if (m := pat.search(f)) is None or int(m.group(1)) in wanted
        ]
    if shard_bucket is not None and doc.get("shard_buckets"):
        pat = re.compile(r"shardbucket=(-?\d+)")
        files = [
            f for f in files
            if (m := pat.search(f)) is not None
            and int(m.group(1)) == shard_bucket
        ]
    return files, total


def shard_bucket_count(index_dir: str) -> int:
    """Shard buckets recorded in the manifest; 0 for layouts without the
    shardbucket hive key (distributed-probe callers fall back to one
    bucket reading everything)."""
    _, doc = read_manifest(index_dir)
    return int(doc.get("shard_buckets") or 0)


def write_manifest(index_dir: str, cfg: SketchConfig, extra: dict | None = None) -> None:
    os.makedirs(index_dir, exist_ok=True)
    doc = {"config": json.loads(cfg.to_json()), "built_unix": time.time()}
    if extra:
        doc.update(extra)
    with open(os.path.join(index_dir, MANIFEST), "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)


def read_manifest(index_dir: str) -> tuple[SketchConfig, dict]:
    with open(os.path.join(index_dir, MANIFEST)) as f:
        doc = json.load(f)
    return SketchConfig.from_json(json.dumps(doc["config"])), doc


def write_sources_summary(index_dir: str, cfg: SketchConfig) -> pa.Table:
    """Derive sources.parquet from the merged banks' stats rows — column-
    projected so the (potentially huge) bits column never leaves disk."""
    banks = pq.read_table(
        os.path.join(index_dir, BANKS),
        columns=["source", "shard_id", "n_docs", "n_wins", "n_tokens", "hll"],
    )
    stats = banks.filter(pa.compute.equal(banks["shard_id"], STATS_SHARD))
    order = pa.compute.sort_indices(stats["source"])
    stats = stats.take(order)
    n_distinct = [
        hll.estimate(hll.from_bytes(b.as_py())) for b in stats["hll"]
    ]
    tbl = pa.table(
        {
            "source": stats["source"],
            "col_idx": pa.array(np.arange(stats.num_rows, dtype=np.int32)),
            "n_docs": stats["n_docs"],
            "n_wins": stats["n_wins"],
            "n_tokens": stats["n_tokens"],
            "hll_distinct": pa.array(n_distinct, pa.float64()),
            "fpr_bound": pa.array(
                [cfg.fpr_bound(int(d)) for d in n_distinct], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(index_dir, SOURCES))
    return tbl


class BankIndex:
    """In-memory view of a bank index for broadcast probing.

    ``matrices[shard_id]`` is a (n_sources, shard_bytes) uint8 matrix whose
    row order matches ``sources`` (sorted source names == col_idx order) —
    the broadcast analogue of the reference's bit-sliced probe
    (search_index.py:420-423).  At cluster scale this object is built once on
    the driver and shipped via ``ray.put``; probers ``ray.get`` it in
    ``__init__`` (zero-copy for the numpy matrices).
    """

    def __init__(self, cfg: SketchConfig, sources: list[str],
                 matrices: dict[int, np.ndarray], summary: pa.Table):
        self.cfg = cfg
        self.sources = sources
        self.matrices = matrices
        self.summary = summary

    _memo: dict[tuple[str, float], "BankIndex"] = {}

    @classmethod
    def load(cls, index_dir: str) -> "BankIndex":
        """Load (or reuse the process-local cached) index view.  Memo key
        includes the manifest mtime so an updated/rebuilt index at the same
        path is reloaded; repeated queries in one process skip the ~1 s
        parquet decode + matrix build."""
        mpath = os.path.join(index_dir, MANIFEST)
        key = (os.path.abspath(index_dir), os.path.getmtime(mpath))
        hit = cls._memo.get(key)
        if hit is not None:
            return hit
        out = cls._load_uncached(index_dir)
        cls._memo.clear()  # keep at most one index resident
        cls._memo[key] = out
        return out

    @classmethod
    def _load_uncached(cls, index_dir: str) -> "BankIndex":
        cfg, _ = read_manifest(index_dir)
        spath = os.path.join(index_dir, SOURCES)
        if not os.path.exists(spath):
            write_sources_summary(index_dir, cfg)
        summary = pq.read_table(spath)
        sources = summary["source"].to_pylist()
        col_of = {s: i for i, s in enumerate(sources)}
        banks = pq.read_table(
            os.path.join(index_dir, BANKS),
            columns=["source", "shard_id", "bits"],
        )
        banks = banks.filter(pa.compute.greater_equal(banks["shard_id"], 0))
        matrices: dict[int, np.ndarray] = {}
        for row in range(banks.num_rows):
            sid = banks["shard_id"][row].as_py()
            if sid not in matrices:
                matrices[sid] = np.zeros(
                    (len(sources), cfg.shard_bytes), dtype=np.uint8
                )
            bits = banks["bits"][row].as_py()
            src = banks["source"][row].as_py()
            matrices[sid][col_of[src]] = bloom.decode_dense(bits, cfg.shard_bytes)
        return cls(cfg, sources, matrices, summary)

    def fill_fraction(self) -> dict[str, float]:
        """Fraction of set bits per source (summary metric, S11 analogue)."""
        out: dict[str, float] = {}
        for i, s in enumerate(self.sources):
            set_bits = sum(
                bloom.popcount_packed(mat[i].tobytes())
                for mat in self.matrices.values()
            )
            out[s] = set_bits / self.cfg.m
        return out
