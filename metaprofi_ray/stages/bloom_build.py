"""Build-side Ray Data stages: per-batch partial sketches + groupby merge.

This replaces the reference's shared-memory accumulation architecture
(/root/reference/metaprofi/lib/bloomfilter_cython.pyx:63-134 writing one shm
column per sample, /root/reference/metaprofi/lib/zarrstore.py:314-377) with
the idiomatic Ray Data shape (SURVEY.md §2.4 A1):

    map_batches(partial_sketch)  → rows (source, shard_id, bits | sketches)
    groupby(source, shard_id).map_groups(merge)  → one merged row per key

The per-batch partial is a pure function of the batch (deterministic,
idempotent on retry); the grouped OR/max/sum merge is associative and
commutative, so Ray may schedule and re-order freely.  Shuffle volume is
``blocks × sources_per_block × shard_bytes`` — the partial aggregation inside
``map_batches`` is the combiner that makes the wide groupby cheap.

Row protocol (uniform schema so shard partials and sketch-stats partials ride
one Dataset):
  shard_id >= 0 : packed Bloom shard bits for (source, shard_id); counters 0.
  shard_id == -1: per-source stats row — HLL(distinct shingles),
                  CMS(token frequencies), t-digest/KLL(n_tok distribution),
                  n_docs / n_wins / n_tokens counters; bits null.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import SketchConfig
from ..functions.tokenize import batch_windows, list_column_parts
from ..sketches import KLL, TDigest, bloom, cms, hashing, hll

STATS_SHARD = -1

PARTIAL_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("shard_id", pa.int32()),
        ("bits", pa.large_binary()),
        ("n_docs", pa.int64()),
        ("n_wins", pa.int64()),
        ("n_tokens", pa.int64()),
        ("hll", pa.large_binary()),
        ("cms", pa.large_binary()),
        ("tdigest", pa.large_binary()),
        ("kll", pa.large_binary()),
    ]
)


def filter_min_len(batch: pa.Table, k: int) -> pa.Table:
    """Reference per-sequence length filter ``seq_len >= k``
    (bloomfilter_cython.pyx:103, lmdb_faq_index.py:240)."""
    return batch.filter(pc.greater_equal(batch["n_tok"], k))


def partial_sketch_batch(batch: pa.Table, cfg: SketchConfig) -> pa.Table:
    """One pass over an Arrow batch → partial sketch rows per source.

    Vectorized throughout: window extraction is offset arithmetic, hashing is
    lane-loop NumPy, per-source segmentation is a single stable argsort.
    """
    if batch.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    values, starts, row_of_window = batch_windows(batch, cfg.k)
    src_dict = pc.dictionary_encode(batch.column("source")).combine_chunks()
    src_codes = src_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    src_names = src_dict.dictionary.to_pylist()
    n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False)
    _, tok_offsets = list_column_parts(batch.column("tokens"))

    # hash every window once; reuse h1 for the HLL distinct-shingle sketch
    h1, h2 = hashing.hash_windows_2(
        values, starts, cfg.k, hashing.SEED_H1, hashing.SEED_H2
    )
    bits = hashing.double_hash_bits(h1, h2, cfg.h, cfg.m)

    n_src = len(src_names)
    lengths = tok_offsets[1:] - tok_offsets[:-1]
    total_tok = int(lengths.sum())
    contiguous = bool(tok_offsets[-1] - tok_offsets[0] == total_tok)
    if n_src == 1:
        # fast path for source-partitioned input (the at-scale layout):
        # no per-source sorting at all
        order = None
        seg = np.array([0, starts.shape[0]])
        row_order = None
        rseg = np.array([0, batch.num_rows])
        if contiguous:
            tok_sorted = values[tok_offsets[0] : tok_offsets[-1]]
        else:
            csum = np.concatenate([[0], np.cumsum(lengths)])
            intra = np.arange(total_tok, dtype=np.int64) - np.repeat(csum[:-1], lengths)
            tok_sorted = values[np.repeat(tok_offsets[:-1], lengths) + intra]
        tseg = np.array([0, total_tok])
    else:
        win_src = src_codes[row_of_window]
        order = np.argsort(win_src, kind="stable")
        seg = np.searchsorted(win_src[order], np.arange(n_src + 1))
        # row segmentation per source (rows arrive unsorted in general)
        row_order = np.argsort(src_codes, kind="stable")
        rseg = np.searchsorted(src_codes[row_order], np.arange(n_src + 1))
        # token segmentation per source: one gather of all token values in
        # source-grouped order (no per-row Python slicing)
        csum = np.concatenate([[0], np.cumsum(lengths)])
        intra = np.arange(total_tok, dtype=np.int64) - np.repeat(csum[:-1], lengths)
        tok_idx = np.repeat(tok_offsets[:-1], lengths) + intra
        tok_src = np.repeat(src_codes, lengths)
        tok_order = np.argsort(tok_src, kind="stable")
        tok_sorted = values[tok_idx[tok_order]]
        tseg = np.searchsorted(tok_src[tok_order], np.arange(n_src + 1))

    out: dict[str, list] = {name: [] for name in PARTIAL_SCHEMA.names}

    def emit(source, shard_id, bits_b, n_docs=0, n_wins=0, n_tokens=0,
             hll_b=None, cms_b=None, td_b=None, kll_b=None):
        out["source"].append(source)
        out["shard_id"].append(shard_id)
        out["bits"].append(bits_b)
        out["n_docs"].append(n_docs)
        out["n_wins"].append(n_wins)
        out["n_tokens"].append(n_tokens)
        out["hll"].append(hll_b)
        out["cms"].append(cms_b)
        out["tdigest"].append(td_b)
        out["kll"].append(kll_b)

    for code, name in enumerate(src_names):
        lo, hi = seg[code], seg[code + 1]
        widx = slice(lo, hi) if order is None else order[lo:hi]
        # Bloom shard partials
        for sid, packed in bloom.set_bits_sharded(bits[widx], cfg).items():
            emit(name, sid, packed)
        # per-source stats row
        rlo, rhi = rseg[code], rseg[code + 1]
        ridx = slice(rlo, rhi) if row_order is None else row_order[rlo:rhi]
        regs = hll.empty(cfg.hll_p)
        hll.update(regs, h1[widx], cfg.hll_p)
        table = cms.empty(cfg.cms_d, cfg.cms_w)
        # token frequencies over all tokens of this source's rows
        tok_cat = tok_sorted[tseg[code] : tseg[code + 1]]
        cms.update(table, tok_cat)
        td = TDigest(cfg.tdigest_delta)
        td.update(n_tok[ridx].astype(np.float64))
        ksk = KLL(cfg.kll_k)
        ksk.update(n_tok[ridx].astype(np.float64))
        emit(
            name, STATS_SHARD, None,
            n_docs=int(rhi - rlo), n_wins=int(hi - lo), n_tokens=int(tok_cat.size),
            hll_b=hll.to_bytes(regs), cms_b=cms.to_bytes(table),
            td_b=td.to_bytes(), kll_b=ksk.to_bytes(),
        )
    return pa.table(out, schema=PARTIAL_SCHEMA)


def local_merge_batch(batch: pa.Table, cfg: SketchConfig) -> pa.Table:
    """Combiner stage: merge partial rows sharing (source, shard_id) WITHIN
    one coalesced block — no shuffle involved.  With source-contiguous
    input layout this collapses each key's per-block partials to ~1 row
    before the keyed groupby, so the sort moves O(final bank) bytes rather
    than O(blocks × shard_bytes).  Output rows are still valid partials
    (merges are associative)."""
    if batch.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    src_codes = (
        pc.dictionary_encode(batch["source"])
        .combine_chunks()
        .indices.to_numpy(zero_copy_only=False)
    )
    sid = batch["shard_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sid, src_codes))
    change = (np.diff(src_codes[order]) != 0) | (np.diff(sid[order]) != 0)
    bounds = np.concatenate([[0], np.flatnonzero(change) + 1, [len(order)]])
    outs = [
        merge_partials(batch.take(order[s0:s1]), cfg)
        for s0, s1 in zip(bounds[:-1], bounds[1:])
    ]
    return pa.concat_tables(outs)


def merge_partials(group: pa.Table, cfg: SketchConfig) -> pa.Table:
    """Grouped merge for one (source, shard_id) key: OR bloom shards /
    max HLL / sum CMS / centroid- and compactor-merge the quantile sketches.
    Associative + commutative (byte-deterministic except t-digest/KLL,
    SURVEY.md §7.3), so any merge tree Ray picks yields the same index."""
    shard_id = int(group["shard_id"][0].as_py())
    source = group["source"][0].as_py()
    if shard_id >= 0:
        merged = bloom.or_merge(
            [v for v in group["bits"].to_pylist() if v is not None],
            shard_bytes=cfg.shard_bytes,
        )
        return pa.table(
            {
                "source": [source],
                "shard_id": pa.array([shard_id], pa.int32()),
                "bits": pa.array([merged], pa.large_binary()),
                "n_docs": pa.array([0], pa.int64()),
                "n_wins": pa.array([0], pa.int64()),
                "n_tokens": pa.array([0], pa.int64()),
                "hll": pa.array([None], pa.large_binary()),
                "cms": pa.array([None], pa.large_binary()),
                "tdigest": pa.array([None], pa.large_binary()),
                "kll": pa.array([None], pa.large_binary()),
            },
            schema=PARTIAL_SCHEMA,
        )
    regs = hll.empty(cfg.hll_p)
    table = cms.empty(cfg.cms_d, cfg.cms_w)
    td = TDigest(cfg.tdigest_delta)
    ksk = KLL(cfg.kll_k)
    for row in range(group.num_rows):
        regs = hll.merge(regs, hll.from_bytes(group["hll"][row].as_py()))
        table = cms.merge(table, cms.from_bytes(group["cms"][row].as_py(), cfg.cms_d, cfg.cms_w))
        td = td.merge(TDigest.from_bytes(group["tdigest"][row].as_py()))
        ksk = ksk.merge(KLL.from_bytes(group["kll"][row].as_py()))
    return pa.table(
        {
            "source": [source],
            "shard_id": pa.array([STATS_SHARD], pa.int32()),
            "bits": pa.array([None], pa.large_binary()),
            "n_docs": pa.array([int(pc.sum(group["n_docs"]).as_py())], pa.int64()),
            "n_wins": pa.array([int(pc.sum(group["n_wins"]).as_py())], pa.int64()),
            "n_tokens": pa.array([int(pc.sum(group["n_tokens"]).as_py())], pa.int64()),
            "hll": pa.array([hll.to_bytes(regs)], pa.large_binary()),
            "cms": pa.array([cms.to_bytes(table)], pa.large_binary()),
            "tdigest": pa.array([td.to_bytes()], pa.large_binary()),
            "kll": pa.array([ksk.to_bytes()], pa.large_binary()),
        },
        schema=PARTIAL_SCHEMA,
    )
