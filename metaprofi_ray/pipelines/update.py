"""Append/update pipeline (reference ``metaprofi update``).

The reference builds a fresh matrix for only the new samples and concatenates
new bits onto each stored slice (/root/reference/metaprofi/lib/
build_index_zarr.py:217-430, traced SURVEY.md §3.3), refusing config changes
(:261-278) and requiring a new store name (zarrstore.py:59-94).

The bank layout makes this a pure Dataset union + re-merge (SURVEY.md §2.4
A2): existing merged bank rows are themselves valid partials (OR/max/sum are
idempotent/associative), so

    union(old_banks, partials(new_data)) -> groupby(source, shard_id) -> merge

appends new sources AND extends existing ones in one pass.  The updated
index is written to a NEW directory (mirroring the reference's immutability
gate) with lineage recorded in its manifest.
"""

from __future__ import annotations

import os

import ray.data as rd

from ..config import SketchConfig
from ..sources import io as bank_io
from .build import merge_banks, partial_banks, read_tokens


def update_index(
    index_dir: str,
    new_ds: rd.Dataset,
    out_dir: str,
    cfg: SketchConfig | None = None,
) -> str:
    """Merge ``new_ds`` rows into the index at ``index_dir``; write the
    result to ``out_dir`` (must differ — updates never mutate in place)."""
    if os.path.abspath(out_dir) == os.path.abspath(index_dir):
        raise ValueError("update must write to a new directory (immutable index)")
    if os.path.exists(os.path.join(out_dir, bank_io.MANIFEST)):
        raise FileExistsError(f"index already exists at {out_dir}")
    out_banks = os.path.join(out_dir, bank_io.BANKS)
    if os.path.exists(out_banks):
        # banks without a manifest = an interrupted update; never append
        import shutil

        shutil.rmtree(out_banks)
    old_cfg, old_doc = bank_io.read_manifest(index_dir)
    if cfg is not None:
        old_cfg.validate_compatible(cfg)  # config frozen across updates
    old_banks = rd.read_parquet(os.path.join(index_dir, bank_io.BANKS))
    layout_cols = [
        c for c in ("srcbucket", "shardbucket")
        if c in (old_banks.schema().names or [])
    ]
    if layout_cols:
        # the hive partition keys are derived layout, not bank data — strip
        # them before the union so flat partials and bucketed banks merge
        old_banks = old_banks.drop_columns(layout_cols)
    new_partials = partial_banks(new_ds, old_cfg)
    merged = merge_banks(old_banks.union(new_partials), old_cfg)
    src_buckets = int(old_doc.get("src_buckets") or bank_io.N_SRC_BUCKETS)
    from .build import write_banks

    write_banks(merged, os.path.join(out_dir, bank_io.BANKS), src_buckets)
    # sources before manifest (the validity marker lands last)
    bank_io.write_sources_summary(out_dir, old_cfg)
    bank_io.write_manifest(
        out_dir, old_cfg,
        extra={"updated_from": os.path.abspath(index_dir),
               "src_buckets": src_buckets,
               "shard_buckets": bank_io.N_SHARD_BUCKETS},
    )
    return out_dir


def update_from_parquet(
    index_dir: str, path: str | list[str], out_dir: str,
    cfg: SketchConfig | None = None,
) -> str:
    return update_index(index_dir, read_tokens(path), out_dir, cfg)
