"""Build pipeline: tokens Dataset → merged sketch bank index on disk.

The Ray-Data-native replacement for the reference's ``metaprofi build``
lifecycle (/root/reference/metaprofi/metaprofi_main.py:148-163 →
zarrstore.py Phase B → build_index_zarr.py Phase C, traced in SURVEY.md §3.1):

    read_parquet(columns=[doc_id? tokens n_tok source])   # prune at the read
      → map_batches(filter n_tok >= k)                    # F2
      → map_batches(partial_sketch_batch)                 # T1/A1 partials
      → groupby(source, shard_id).map_groups(merge)       # A1 global OR-merge
      → write_parquet(index/banks)                        # S7/S8 sink

Streaming end-to-end: nothing materializes the input; the only all-to-all
exchange is the groupby over the (already batch-combined) partial rows.
"""

from __future__ import annotations

import os
from functools import partial

import pyarrow as pa

import ray.data as rd

from ..config import SketchConfig
from ..logutil import silence_empty_schema_warnings
from ..sources import io as bank_io
from ..stages.bloom_build import (
    PARTIAL_SCHEMA,
    filter_min_len,
    merge_partials,
    partial_sketch_batch,
)

TOKEN_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def read_tokens(path: str | list[str]) -> rd.Dataset:
    """Read a tokens corpus with column pruning (S1/S2 analogue)."""
    return rd.read_parquet(path, columns=TOKEN_COLUMNS)


def partial_banks(ds: rd.Dataset, cfg: SketchConfig) -> rd.Dataset:
    """Length-filter + per-batch partial sketches.

    ``batch_size=None`` gives one batch per block so each task's partial rows
    already combine every row of its block — the combiner that keeps the
    groupby shuffle at ``O(blocks × sources_per_block × shard_bytes)``.
    """
    ds = ds.map_batches(
        partial(filter_min_len, k=cfg.k),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    return ds.map_batches(
        partial(partial_sketch_batch, cfg=cfg),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def merge_banks(
    partials: rd.Dataset,
    cfg: SketchConfig,
    salt_buckets: int = 0,
    pre_coalesce: int | None = 64,
) -> rd.Dataset:
    """Global merge per (source, shard_id) — the A1 OR-merge shuffle.

    ``salt_buckets > 1`` enables the skew path (north_rule "skew-aware
    splitting of hot sources"): partial rows are first merged per
    (source, shard_id, salt) — a hot source's thousands of block partials
    split across ``salt_buckets`` reducers — then the ≤ salt_buckets
    intermediate rows per key merge in a second, tiny groupby.  The merges
    are associative/commutative, so the result is byte-identical to the
    single-level path (property-tested).

    ``pre_coalesce``: first coalesce partial rows into that many blocks
    (cheap repartition, NO key shuffle) and merge same-key rows within
    each block (``local_merge_batch``) — with source-contiguous input this
    shrinks the keyed sort's payload to roughly the final bank size."""
    if pre_coalesce:
        from ..stages.bloom_build import local_merge_batch

        partials = partials.repartition(pre_coalesce).map_batches(
            partial(local_merge_batch, cfg=cfg),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    if salt_buckets > 1:

        def add_salt(t: pa.Table) -> pa.Table:
            import hashlib

            import numpy as np

            # deterministic content-derived salt (no RNG: resume-safe)
            salts = np.empty(t.num_rows, dtype=np.int32)
            docs = t["n_docs"].to_numpy(zero_copy_only=False)
            bits = t["bits"]
            for i in range(t.num_rows):
                b = bits[i].as_py()
                seed = b[:32] if b else str(docs[i]).encode()
                salts[i] = int.from_bytes(
                    hashlib.blake2b(seed, digest_size=2).digest(), "little"
                ) % salt_buckets
            return t.append_column("salt", pa.array(salts, pa.int32()))

        salted = partials.map_batches(add_salt, batch_format="pyarrow")
        level1 = salted.groupby(["source", "shard_id", "salt"]).map_groups(
            partial(merge_partials, cfg=cfg), batch_format="pyarrow"
        )
        partials = level1
    return partials.groupby(["source", "shard_id"]).map_groups(
        partial(merge_partials, cfg=cfg), batch_format="pyarrow"
    )


def write_banks(
    merged: rd.Dataset, banks_dir: str, src_buckets: int,
    shard_buckets: int = bank_io.N_SHARD_BUCKETS,
) -> None:
    """Bank sink.  ``src_buckets > 0`` (the default layout) hive-partitions
    by ``srcbucket = hash64(source) % src_buckets`` so each source's shard
    rows land in one directory and source-restricted queries prune whole
    dirs at the read (``bank_io.bank_files``), and by ``shardbucket =
    shard_id % shard_buckets`` so the distributed-probe streaming path's
    per-bucket probers read only their bucket's files; ``src_buckets=0``
    writes the flat layout (used for internal per-partition
    checkpoints)."""
    if src_buckets > 0:
        from functools import partial as _partial

        merged = merged.map_batches(
            _partial(
                bank_io.with_srcbucket, n=src_buckets,
                shard_buckets=shard_buckets,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        cols = ["srcbucket"] + (["shardbucket"] if shard_buckets > 0 else [])
        merged.write_parquet(
            banks_dir, partition_cols=cols, **bank_io.BANK_PARQUET_ARGS
        )
    else:
        merged.write_parquet(banks_dir, **bank_io.BANK_PARQUET_ARGS)


def build_index(
    ds: rd.Dataset, cfg: SketchConfig, index_dir: str, salt_buckets: int = 0,
    src_buckets: int = bank_io.N_SRC_BUCKETS,
    shard_buckets: int | None = None,
) -> str:
    """End-to-end build; returns index_dir.

    Refuses to overwrite an existing index, mirroring the reference's
    FileExistsError gate (zarrstore.py:219-221) — updates go through
    ``pipelines.update`` instead.  ``salt_buckets`` enables the two-level
    skew-aware merge (see ``merge_banks``); ``src_buckets`` sizes the
    hive-partitioned bank layout (see ``write_banks``).
    """
    silence_empty_schema_warnings()
    banks_dir = os.path.join(index_dir, bank_io.BANKS)
    if os.path.exists(os.path.join(index_dir, bank_io.MANIFEST)):
        raise FileExistsError(f"index already exists at {index_dir}")
    if os.path.exists(banks_dir):
        # banks without a manifest = an interrupted build; never append to it
        import shutil

        shutil.rmtree(banks_dir)
    if shard_buckets is None:
        # the distributed query path's parallelism unit; more buckets than
        # shards would leave empty dirs, so clamp
        shard_buckets = min(bank_io.N_SHARD_BUCKETS, cfg.shards)
    merged = merge_banks(partial_banks(ds, cfg), cfg, salt_buckets=salt_buckets)
    write_banks(merged, banks_dir, src_buckets, shard_buckets)
    # sources before manifest: the manifest is the validity marker loaders
    # key on, so it lands last (a crash in between leaves a visibly
    # incomplete index, never a valid-looking one missing its summary)
    bank_io.write_sources_summary(index_dir, cfg)
    bank_io.write_manifest(
        index_dir, cfg,
        extra=(
            {"src_buckets": src_buckets,
             "shard_buckets": shard_buckets}
            if src_buckets > 0 else None
        ),
    )
    return index_dir


def build_from_parquet(path: str | list[str], cfg: SketchConfig, index_dir: str) -> str:
    return build_index(read_tokens(path), cfg, index_dir)


def as_sequence_level(ds: rd.Dataset) -> rd.Dataset:
    """Sequence-level mode (reference ``build-seq``,
    /root/reference/metaprofi/lib/zarrstore_seq.py:42-44): every row becomes
    its own sample — the Bloom column key switches from ``source`` to
    ``doc_id``.  Everything downstream (merge, query, update, checkpoints)
    is unchanged because it only ever keys on the ``source`` column."""

    def relabel(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("source")
        return t.set_column(i, "source", t.column("doc_id"))

    return ds.map_batches(relabel, batch_format="pyarrow", zero_copy_batch=True)


def build_seq_from_parquet(
    path: str | list[str], cfg: SketchConfig, index_dir: str
) -> str:
    """``metaprofi build-seq`` analogue: one Bloom bank per sequence."""
    return build_index(as_sequence_level(read_tokens(path)), cfg, index_dir)
