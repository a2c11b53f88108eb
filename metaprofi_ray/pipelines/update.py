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
    # carry the OLD index's bucket counts: the layout knobs are per-index
    # (manifest-recorded), not process-global
    shard_buckets = int(
        old_doc.get("shard_buckets") or bank_io.N_SHARD_BUCKETS
    )
    from .build import write_banks

    write_banks(merged, os.path.join(out_dir, bank_io.BANKS), src_buckets,
                shard_buckets)
    # sources before manifest (the validity marker lands last)
    bank_io.write_sources_summary(out_dir, old_cfg)
    bank_io.write_manifest(
        out_dir, old_cfg,
        extra={"updated_from": os.path.abspath(index_dir),
               "src_buckets": src_buckets,
               "shard_buckets": shard_buckets},
    )
    return out_dir


def update_from_parquet(
    index_dir: str, path: str | list[str], out_dir: str,
    cfg: SketchConfig | None = None,
) -> str:
    return update_index(index_dir, read_tokens(path), out_dir, cfg)


def remove_sources(
    index_dir: str, sources: list[str], out_dir: str
) -> str:
    """Write a new index at ``out_dir`` with ``sources`` removed.

    The reference cannot do this: its matrix concatenates sample columns,
    so removal means a full rebuild (build_index_zarr.py:217-430 only ever
    APPENDS).  The per-source bank-row layout makes removal a metadata-
    sized operation instead: rows are keyed by source, so dropping a
    source == filtering its rows, and the hive srcbucket layout means only
    the bucket dirs the removed sources hash to are rewritten — every
    other dir is HARDLINKED into the new index unchanged (zero data
    movement; the cluster analogue is an object-store server-side copy or
    a manifest pointer).  Equivalent to a fresh build without those
    sources, which the parity test asserts."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    if os.path.abspath(out_dir) == os.path.abspath(index_dir):
        raise ValueError("removal must write to a new directory "
                         "(immutable index)")
    if os.path.exists(os.path.join(out_dir, bank_io.MANIFEST)):
        raise FileExistsError(f"index already exists at {out_dir}")
    old_cfg, old_doc = bank_io.read_manifest(index_dir)
    known = set(
        pq.read_table(
            os.path.join(index_dir, bank_io.SOURCES), columns=["source"]
        )["source"].to_pylist()
    )
    removal = set(sources)
    unknown = removal - known
    if unknown:
        raise ValueError(f"not in index: {sorted(unknown)}")
    if removal >= known:
        raise ValueError("cannot remove every source (empty index)")

    src_buckets = int(old_doc.get("src_buckets") or 0)
    shard_buckets = int(old_doc.get("shard_buckets") or 0)
    old_banks_dir = os.path.join(index_dir, bank_io.BANKS)
    out_banks_dir = os.path.join(out_dir, bank_io.BANKS)
    if os.path.exists(out_banks_dir):
        shutil.rmtree(out_banks_dir)  # interrupted removal: restart clean

    import pyarrow as pa
    import pyarrow.compute as pc

    drop = pa.array(sorted(removal), pa.string())

    def keep_rows(t):
        return t.filter(
            pc.invert(pc.is_in(t["source"], value_set=drop))
        )

    if src_buckets > 0:
        affected = {bank_io.src_bucket(s, src_buckets) for s in removal}
        rewrite_files: list[str] = []
        for f in sorted(
            glob.glob(os.path.join(old_banks_dir, "**", "*.parquet"),
                      recursive=True)
        ):
            rel = os.path.relpath(f, old_banks_dir)
            m = [p for p in rel.split(os.sep) if p.startswith("srcbucket=")]
            b = int(m[0].split("=", 1)[1]) if m else None
            if b is not None and b not in affected:
                dst = os.path.join(out_banks_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(f, dst)  # same filesystem: zero-copy share
                except OSError:
                    shutil.copy2(f, dst)
            else:
                rewrite_files.append(f)
        if rewrite_files:
            kept = (
                rd.read_parquet(rewrite_files)
                .map_batches(keep_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
            )
            layout_cols = [
                c for c in ("srcbucket", "shardbucket")
                if c in (kept.schema().names or [])
            ]
            if layout_cols:
                kept = kept.drop_columns(layout_cols)
            from .build import write_banks

            write_banks(kept, out_banks_dir, src_buckets, shard_buckets)
    else:
        kept = (
            rd.read_parquet(old_banks_dir)
            .map_batches(keep_rows, batch_format="pyarrow",
                         zero_copy_batch=True)
        )
        from .build import write_banks

        write_banks(kept, out_banks_dir, 0)

    bank_io.write_sources_summary(out_dir, old_cfg)
    bank_io.write_manifest(
        out_dir, old_cfg,
        extra={"removed_from": os.path.abspath(index_dir),
               "removed_sources": sorted(removal),
               "src_buckets": src_buckets,
               "shard_buckets": shard_buckets},
    )
    return out_dir
