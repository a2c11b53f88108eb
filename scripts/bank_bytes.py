#!/usr/bin/env python
"""Measure bank bytes at rest vs the reference's PackBits+zstd-9 scheme.

The reference compresses each bitmap slice with
numpy packbits → zstd level 9 (/root/reference/metaprofi/lib/utilities.py:83-92).
This engine stores packed shard rows in Parquet and relies on the column
codec.  This script builds a bench index and reports, for the banks' bits
column: logical dense bytes, bytes in the Parquet files as written
(default codec), re-encoded Parquet zstd-9 bytes, and reference-style raw
zstd-9 of the concatenated dense rows — the evidence for (or against)
adding a custom encoding.  Results are recorded in BENCH/BASELINE.md.

Usage: python scripts/bank_bytes.py [n_docs]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    from metaprofi_ray.config import SketchConfig
    from metaprofi_ray.pipelines.build import build_from_parquet
    from metaprofi_ray.sketches import bloom
    from metaprofi_ray.sources.synth_fast import generate_corpus_fast

    corpus = generate_corpus_fast(
        f"/tmp/metaprofi_bankbytes_corpus_{n_docs}", n_docs=n_docs,
        files_per_source=2,
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 24, shards=8, hll_p=14)
    index_dir = f"/tmp/metaprofi_bankbytes_idx_{n_docs}"
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        shutil.rmtree(index_dir, ignore_errors=True)
        build_from_parquet(corpus, cfg, index_dir)

    bank_files = sorted(glob.glob(os.path.join(index_dir, "banks", "**", "*.parquet"), recursive=True))
    file_bytes = sum(os.path.getsize(f) for f in bank_files)
    banks = pq.read_table(os.path.join(index_dir, "banks"))
    mask = pa.compute.greater_equal(banks["shard_id"], 0)
    bits_rows = banks.filter(mask)
    stored_col = sum(len(b.as_py() or b"") for b in bits_rows["bits"])
    dense = [
        bloom.decode_dense(b.as_py(), cfg.shard_bytes).tobytes()
        for b in bits_rows["bits"]
    ]
    logical = sum(len(d) for d in dense)

    # parquet re-encode at zstd-9 (bits column only, one row group)
    tmp_zstd = os.path.join(index_dir, "_bits_zstd9.parquet")
    bits_only = pa.table({"bits": bits_rows["bits"]})
    pq.write_table(bits_only, tmp_zstd, compression="zstd", compression_level=9)
    zstd_parquet = os.path.getsize(tmp_zstd)
    os.remove(tmp_zstd)

    # reference-style: raw zstd-9 over each dense row, summed
    import zlib

    try:
        import zstandard as zstd  # not expected in this container

        cctx = zstd.ZstdCompressor(level=9)
        ref_style = sum(len(cctx.compress(d)) for d in dense)
        ref_name = "zstd-9 per row (reference scheme)"
    except ImportError:
        ref_style = sum(len(zlib.compress(d, 9)) for d in dense)
        ref_name = "zlib-9 per row (zstd unavailable; stand-in)"

    set_bits = sum(bloom.popcount_packed(d) for d in dense)
    fill = set_bits / (cfg.m * max(1, len({r.as_py() for r in bits_rows['source']})))
    print(f"n_docs={n_docs}  bank rows={bits_rows.num_rows}  fill={fill:.4f}")
    print(f"logical dense bits bytes   : {logical:>12,}")
    print(f"stored bits column (values): {stored_col:>12,}")
    print(f"banks parquet files on disk: {file_bytes:>12,}  ({file_bytes/logical:.3f}x of logical)")
    print(f"parquet zstd-9 re-encode   : {zstd_parquet:>12,}  ({zstd_parquet/logical:.3f}x)")
    print(f"{ref_name:<27}: {ref_style:>12,}  ({ref_style/logical:.3f}x)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
