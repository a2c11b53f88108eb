"""Index summary (reference ``metaprofi summary`` /
``get_summary_from_index_store``, /root/reference/metaprofi/lib/
utilities.py:598-638): config + per-source stats + storage footprint."""

from __future__ import annotations

import glob
import os

from ..sources import io as bank_io


def index_summary(index_dir: str) -> dict:
    cfg, doc = bank_io.read_manifest(index_dir)
    import pyarrow.parquet as pq

    sources = pq.read_table(os.path.join(index_dir, bank_io.SOURCES))
    bank_files, _ = bank_io.bank_files(index_dir)
    stored = sum(os.path.getsize(f) for f in bank_files)
    return {
        "config": doc["config"],
        "n_sources": sources.num_rows,
        "n_docs": sum(sources["n_docs"].to_pylist()),
        "n_windows": sum(sources["n_wins"].to_pylist()),
        "n_tokens": sum(sources["n_tokens"].to_pylist()),
        "stored_bytes": stored,
        "logical_bank_bytes": cfg.packed_bytes * sources.num_rows,
        "bank_files": len(bank_files),
        "built_unix": doc.get("built_unix"),
        "updated_from": doc.get("updated_from"),
        "checkpointed": doc.get("checkpointed", False),
    }


def format_summary(index_dir: str) -> str:
    s = index_summary(index_dir)
    lines = ["# metaprofi_ray index summary"]
    for k, v in s.items():
        lines.append(f"{k}: {v}")
    return "\n".join(lines) + "\n"
