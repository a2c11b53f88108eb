"""Fast vectorized bench-corpus generator.

Same schema as ``synth.generate_corpus`` but generated per-FILE with one
seeded numpy RNG (deterministic in file index), no per-doc Python loops —
built for multi-hundred-MB bench tiers.  Files are PARTITIONED BY SOURCE
(each file holds a contiguous range of one source's docs): partial sketch
rows per block then cover only 1 source × shards, keeping the build's
groupby shuffle at O(files × shards × shard_bytes) regardless of source
count — the partitioning-key discipline the 100 TB layout would use.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .synth import TOKENS_SCHEMA

BENCH_SEED = 20_260_817


def generate_corpus_fast(
    out_dir: str,
    n_docs: int,
    n_sources: int = 64,
    vocab: int = 1 << 20,
    mean_len: int = 100,
    seed: int = BENCH_SEED,
    files_per_source: int = 1,
    hot_source_frac: float = 0.25,
    max_docs_per_file: int | None = None,
) -> str:
    """Write per-source Parquet files; returns out_dir.
    One hot source holds ``hot_source_frac`` of all docs (skew exercise);
    the rest are uniform.  Doc lengths ~ 32 + Exp(mean_len-32), so k=8
    windows always exist.

    ``max_docs_per_file`` caps file size regardless of source skew (the
    north_rule's "skew-aware splitting of hot sources" applied at the
    storage layout: a hot source becomes many evenly-sized files, so no
    single read block — and therefore no single sketch task — carries the
    whole hot source as a straggler)."""
    stamp = (
        f"n_docs={n_docs} n_sources={n_sources} vocab={vocab} "
        f"mean_len={mean_len} seed={seed} files={files_per_source} "
        f"hot={hot_source_frac} maxdpf={max_docs_per_file}\n"
    )
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read() == stamp:
                return out_dir
        # parameters changed for the same dir: regenerate from scratch
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    hot = max(int(n_docs * hot_source_frac), 1)
    rest = (n_docs - hot) // (n_sources - 1) if n_sources > 1 else 0
    counts = [hot] + [rest] * (n_sources - 1)
    for s, cnt in enumerate(counts):
        src = f"src{s:03d}"
        n_files = files_per_source
        if max_docs_per_file:
            n_files = max(n_files, -(-cnt // max_docs_per_file))
        bounds = np.linspace(0, cnt, n_files + 1).astype(int)
        for f in range(n_files):
            n = int(bounds[f + 1] - bounds[f])
            if n == 0:
                continue
            rng = np.random.default_rng(seed + s * 1000 + f)
            lens = (32 + rng.exponential(max(mean_len - 32, 1), size=n)).astype(np.int64)
            total = int(lens.sum())
            if total >= 2**31:  # int32 list offsets would silently wrap
                raise ValueError(
                    f"file {src}-{f:03d} holds {total} tokens (>= 2^31); "
                    "raise files_per_source so each file stays under int32 "
                    "list-offset range"
                )
            flat = rng.integers(0, vocab, size=total, dtype=np.int32)
            offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            tokens = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
            )
            lo = int(bounds[f])
            tbl = pa.table(
                {
                    "doc_id": pa.array(
                        [f"{src}-d{lo + i:09d}" for i in range(n)], pa.string()
                    ),
                    "tokens": tokens,
                    "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
                    "source": pa.array([src] * n, pa.string()),
                },
                schema=TOKENS_SCHEMA,
            )
            pq.write_table(
                tbl, os.path.join(out_dir, f"{src}-{f:03d}.parquet"),
                row_group_size=65536,
            )
    with open(done, "w") as fh:
        fh.write(stamp)
    return out_dir
