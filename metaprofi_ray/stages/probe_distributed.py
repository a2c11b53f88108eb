"""Distributed-probe streaming query path — probe set as a DATASET.

The broadcast streaming prober (``stages.probe_sharded``) builds ONE
monolithic ``QueryProbeSet`` serially on the driver and ships it whole to
every prober actor.  That build is the streaming path's scale ceiling at
≫100k queries (VERDICT r3 #4; the reference's equivalent planning step is
also centralized, search_index.py:299-309 — this is a beyond-reference
scale feature).  Here the probe set never exists in one piece anywhere:

  1. PREP (parallel ``map_batches`` over the query Dataset): hash every
     query window, bucket probe entries by ``sb = shard_id % NSB`` and
     write them as a hive-partitioned parquet probeset
     (``probeset/sb=N/``), alongside one per-QUERY meta row
     (``sb=-1``: query_id, window count, the query's (shard, window)
     constraint structure) — all vectorized, all distributed.
  2. PROBE: one bank sub-pipeline per shard bucket.  The bank layout is
     hive-partitioned by the SAME key (``banks/.../shardbucket=N/``,
     ``sources.io.with_srcbucket``), so each sub-pipeline READS only its
     bucket's bank files, and its prober actors load only their bucket's
     probe slice in ``__init__`` — 1/NSB of the probe set per actor, read
     from parquet, never from the driver.  Per-batch math is the same
     fully-vectorized gather/reduceat/packbits protocol as
     ``probe_sharded.ShardProber``.
  3. REDUCE (``groupby(kb).map_groups``): mask rows AND per (query,
     source); the per-query structure the finalizer needs (name, window
     count, missing-shard correction masks) arrives as co-shuffled meta
     rows keyed by the same ``kb = qh % NKB`` — not as a broadcast probe
     object.  Mask rows come in two shapes: per-(query, source) PAIR rows
     (small query sets) or per-(source, kb) LANE rows carrying every
     query's packed mask for that bucket (``_emit_lanes``; same payload
     bytes, ~Q/NKB fewer rows — the shuffle is row-count-bound, so lanes
     halve the 1M-query end-to-end wall).

Requires unique ``query_id`` values (rows are keyed by a 64-bit blake2b of
the id).  Results are identical to ``query_index`` / the broadcast
streaming path (property-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import SketchConfig
from ..functions.tokenize import batch_windows
from ..sketches import bloom
from ..sources.io import hash64_str
from .probe import HITS_SCHEMA, min_windows

N_REDUCE_BUCKETS = 64

PREP_SCHEMA = pa.schema(
    [
        ("sb", pa.int32()),
        ("e_shard", pa.large_binary()),
        ("e_local", pa.large_binary()),
        ("e_qh", pa.large_binary()),
        ("e_win", pa.large_binary()),
        ("qh", pa.uint64()),
        ("qid", pa.large_string()),
        ("nw", pa.int32()),
        ("c_shard", pa.large_binary()),
        ("c_win", pa.large_binary()),
        ("kb", pa.int32()),
    ]
)

MASK_SCHEMA = pa.schema(
    [
        ("kb", pa.int32()),
        ("kind", pa.int8()),  # 0 = pair mask, 1 = query meta
        ("qh", pa.uint64()),
        ("si", pa.uint64()),
        ("mask", pa.large_binary()),
        ("qid", pa.large_string()),
        ("nw", pa.int32()),
        ("c_shard", pa.large_binary()),
        ("c_win", pa.large_binary()),
    ]
)


def _entry_widths(cfg: SketchConfig) -> tuple[str, str]:
    """(shard_dtype, local_dtype) for probeset entry payloads: 4-byte when
    the config guarantees the values fit (shard ids < cfg.shards; local
    bit offsets < cfg.shard_bits), else 8-byte.  Decoders never consult
    the config — every blob travels next to a win blob whose width is
    fixed at 4 B/entry, so the itemsize is re-derived from the byte
    lengths (``len(shard_blob) // (len(win_blob) // 4)``).  That makes
    the format self-describing: legacy 8-byte probesets persisted by
    older builds keep decoding, and prep/decode can never disagree."""
    shard_dt = "<i4" if cfg.shards <= 0x7FFFFFFF else "<i8"
    local_dt = "<i4" if cfg.shard_bits <= 0x7FFFFFFF else "<i8"
    return shard_dt, local_dt


def prep_probe_batch(
    t: pa.Table, cfg: SketchConfig, nsb: int, nkb: int = N_REDUCE_BUCKETS
) -> pa.Table:
    """One query batch → probeset rows (entry rows per shard bucket + one
    meta row per query).  Pure array math; run inside ``map_batches``."""
    values, starts, row_of_window = batch_windows(t, cfg.k)
    qids = t["query_id"].to_pylist()
    n_q = len(qids)
    qh = np.array([hash64_str(q) for q in qids], dtype=np.uint64)
    n_wins_total = int(starts.shape[0])
    seg = np.searchsorted(row_of_window, np.arange(n_q))
    nw = np.diff(np.append(seg, n_wins_total)).astype(np.int32)

    out: dict[str, list] = {name: [] for name in PREP_SCHEMA.names}

    def _entry_row(sb_val, e_shard, e_local, e_qh, e_win):
        out["sb"].append(int(sb_val))
        out["e_shard"].append(e_shard)
        out["e_local"].append(e_local)
        out["e_qh"].append(e_qh)
        out["e_win"].append(e_win)
        out["qh"].append(0)
        out["qid"].append("")
        out["nw"].append(0)
        out["c_shard"].append(b"")
        out["c_win"].append(b"")
        out["kb"].append(-1)

    shard_dt, local_dt = _entry_widths(cfg)
    if n_wins_total:
        bits = bloom.bits_for_windows(values, starts, cfg)  # (n_wins, h)
        h = bits.shape[1]
        flat = bits.reshape(-1)
        ewin_g = np.repeat(np.arange(n_wins_total, dtype=np.int64), h)
        eq = np.repeat(row_of_window, h)
        win_local = (ewin_g - seg[eq]).astype(np.int32)
        shard = (flat // cfg.shard_bits).astype(np.int64)
        local = (flat % cfg.shard_bits).astype(np.int64)
        sb = (shard % nsb).astype(np.int32)
        order = np.argsort(sb, kind="stable")
        sb_s = sb[order]
        bounds = np.flatnonzero(np.diff(sb_s)) + 1
        for s0, s1 in zip(
            np.concatenate([[0], bounds]),
            np.concatenate([bounds, [len(sb_s)]]),
        ):
            sl = order[s0:s1]
            _entry_row(
                sb_s[s0],
                shard[sl].astype(shard_dt).tobytes(),
                local[sl].astype(local_dt).tobytes(),
                qh[eq[sl]].astype("<u8").tobytes(),
                win_local[sl].astype("<i4").tobytes(),
            )
        # per-query meta rows (constraint structure for the reduce;
        # entries sorted by query so each query's slice is contiguous)
        c_order = np.lexsort((win_local, eq))
        eq_s = eq[c_order]
        q_bounds = np.flatnonzero(np.diff(eq_s)) + 1
        for s0, s1 in zip(
            np.concatenate([[0], q_bounds]),
            np.concatenate([q_bounds, [len(eq_s)]]),
        ):
            sl = c_order[s0:s1]
            q = int(eq_s[s0])
            out["sb"].append(-1)
            out["e_shard"].append(b"")
            out["e_local"].append(b"")
            out["e_qh"].append(b"")
            out["e_win"].append(b"")
            out["qh"].append(int(qh[q]))
            out["qid"].append(qids[q])
            out["nw"].append(int(nw[q]))
            out["c_shard"].append(shard[sl].astype(shard_dt).tobytes())
            out["c_win"].append(win_local[sl].astype("<i4").tobytes())
            out["kb"].append(int(qh[q] % np.uint64(nkb)))
    return pa.table(
        {n: pa.array(out[n], PREP_SCHEMA.field(n).type)
         for n in PREP_SCHEMA.names},
        schema=PREP_SCHEMA,
    )


class _ProbesetLayout:
    """Per-query byte-aligned GLOBAL mask layout, built from the
    probeset's meta slice.  Queries are ordered KB-MAJOR (``kb = qh %
    N_REDUCE_BUCKETS``), qh-ascending within each bucket — exactly the
    order the lane reduce derives from its meta rows — so lane emission
    is pure offset arithmetic over the packed matrix (no byte gather; the
    former qh-global order needed an O(S x L) permutation per probe
    batch).  Identical for EVERY shard bucket of a probeset — cached per
    probeset_dir so a worker that probes several buckets reads the meta
    and builds the 2M-bit template once, not once per bucket (plan
    builds were ~90% of probe-task time at 50k queries before this
    split)."""

    def __init__(self, probeset_dir: str):
        import os

        import pyarrow.parquet as pq

        meta = pq.read_table(
            os.path.join(probeset_dir, "sb=-1"), columns=["qh", "nw"]
        )
        qh = meta["qh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nw = meta["nw"].to_numpy(zero_copy_only=False).astype(np.int64)
        kb_of = (qh % np.uint64(N_REDUCE_BUCKETS)).astype(np.int64)
        order = np.lexsort((qh, kb_of))  # kb-major, qh-ascending within
        self.qh_layout = qh[order]
        self.nw_layout = nw[order]
        pad_bits = ((self.nw_layout + 7) // 8) * 8
        bit_off = np.concatenate([[0], np.cumsum(pad_bits)]).astype(np.int64)
        L = int(bit_off[-1])
        # template via a +1/-1 delta + running sum — two passes over an
        # int8 array instead of four O(L) int64 temporaries (the gather
        # form moved ~0.5 GB through memory at 1M queries; this moves
        # ~2 × L bytes)
        delta = np.zeros(L + 1, dtype=np.int8)
        delta[bit_off[:-1]] = 1
        np.subtract.at(delta, bit_off[:-1] + self.nw_layout, 1)
        self.template = np.cumsum(delta[:-1], dtype=np.int8).view(np.bool_)
        self.bit_off = bit_off
        self.byte_off = (bit_off // 8).astype(np.int64)
        self.n_queries = len(self.qh_layout)
        # ``lane_bounds[kb]:lane_bounds[kb+1]`` is bucket kb's byte range
        # directly in the packed layout (kb-major order makes each bucket
        # contiguous).  Lane mode emits ONE mask row per (source, kb)
        # instead of one per (query, source) — the same payload bytes
        # with ~Q/NKB fewer rows, which is what the mask shuffle's cost
        # is proportional to at large query counts.
        kb_bounds = np.searchsorted(
            kb_of[order], np.arange(N_REDUCE_BUCKETS + 1)
        )
        self.lane_bounds = self.byte_off[kb_bounds]
        self.kb_bounds = kb_bounds
        # probe-entry slot lookup: entries arrive keyed by qh, so keep an
        # ascending-qh view + the map back to layout slots
        asc = np.argsort(self.qh_layout, kind="stable")
        self.qh_asc = self.qh_layout[asc]
        self.slot_of_asc = asc.astype(np.int64)
        self.nbytes = int(
            self.template.nbytes + self.bit_off.nbytes * 2
            + self.qh_layout.nbytes * 2 + self.nw_layout.nbytes
            + self.slot_of_asc.nbytes
        )


_LAYOUT_MEMO: "dict[tuple, _ProbesetLayout]" = {}
_LAYOUT_MEMO_MAX = 2


def _probeset_version(probeset_dir: str) -> float:
    """Cheap content version for the memo keys: the meta dir's mtime.
    A probeset REWRITTEN at the same caller-supplied path (the reuse API)
    must not be served from a warm worker's cache — stale qh layouts
    would silently drop every reduce pair."""
    import os

    try:
        return os.path.getmtime(os.path.join(probeset_dir, "sb=-1"))
    except OSError:
        return -1.0


def _layout_for(probeset_dir: str) -> _ProbesetLayout:
    key = (probeset_dir, _probeset_version(probeset_dir))
    layout = _LAYOUT_MEMO.pop(key, None)
    if layout is None:
        layout = _ProbesetLayout(probeset_dir)
    _LAYOUT_MEMO[key] = layout
    while len(_LAYOUT_MEMO) > _LAYOUT_MEMO_MAX:
        _LAYOUT_MEMO.pop(next(iter(_LAYOUT_MEMO)))
    return layout


class SliceProbePlan:
    """Per-shard-bucket probe structures, built from the probeset parquet
    (shared layout + one sb slice) — the distributed analogue of
    ``probe_sharded.QueryProbeSet``, 1/NSB the entry payload, never built
    on the driver.  The layout is shared by every bucket so the reduce
    can AND masks from different buckets positionally."""

    def __init__(self, probeset_dir: str, sb: int, cfg: SketchConfig,
                 layout: "_ProbesetLayout | None" = None):
        import os

        import pyarrow.parquet as pq

        if layout is None:
            layout = _layout_for(probeset_dir)
        self.qh_layout = layout.qh_layout
        self.nw_layout = layout.nw_layout
        self.template = layout.template
        self.bit_off = layout.bit_off
        self.byte_off = layout.byte_off
        self.n_queries = layout.n_queries
        self.lane_bounds = layout.lane_bounds
        self.kb_bounds = layout.kb_bounds
        self.qh_asc = layout.qh_asc
        self.slot_of_asc = layout.slot_of_asc
        # the shared layout is counted by its own memo, not per plan
        self.nbytes = 0

        slice_dir = os.path.join(probeset_dir, f"sb={sb}")
        self.shard_plan: dict[int, dict] = {}
        if not os.path.isdir(slice_dir):
            return
        ent = pq.read_table(
            slice_dir, columns=["e_shard", "e_local", "e_qh", "e_win"]
        )

        def _cat(col, dt):
            # all blobs concatenated == the column's contiguous values
            # buffer (large_binary offsets are monotone over the combined
            # chunks) — one zero-copy view instead of an as_py() per row
            off, dat = _binary_col_views(ent[col])
            if off.size == 0 or off[-1] == off[0]:
                return np.empty(0, dtype=dt)
            seg = np.ascontiguousarray(dat[off[0] : off[-1]])
            return seg.view(dt)

        e_win_raw = _cat("e_win", "<i4")
        n_ent = int(e_win_raw.size)
        if n_ent == 0:
            return

        def _cat_entries(col):
            # self-describing width (see _entry_widths): the win blob is
            # 4 B/entry, so itemsize = total bytes / entry count — legacy
            # 8-byte probesets and narrow 4-byte ones both decode
            off, dat = _binary_col_views(ent[col])
            seg = np.ascontiguousarray(dat[off[0] : off[-1]])
            return seg.view(f"<i{seg.size // n_ent}")

        shard = _cat_entries("e_shard")
        local = _cat_entries("e_local")
        e_qh = _cat("e_qh", "<u8")
        e_win = e_win_raw.astype(np.int64)
        slot = self.slot_of_asc[np.searchsorted(self.qh_asc, e_qh)]
        flat_pos = self.bit_off[slot] + e_win
        order = np.lexsort((flat_pos, shard))
        shard_s = shard[order]
        bounds = np.flatnonzero(np.diff(shard_s)) + 1
        for s0, s1 in zip(
            np.concatenate([[0], bounds]),
            np.concatenate([bounds, [len(shard_s)]]),
        ):
            sl = order[s0:s1]
            fp = flat_pos[sl]
            # fp is ascending within the shard segment (lexsort above), so
            # unique/first-index/constrained-slot all fall out of diffs —
            # no re-sorts (np.unique sorts even sorted input; these were
            # ~1/3 of plan-build time at the 1M-query tier)
            seg_starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(fp)) + 1]
            ).astype(np.int64)
            uniq = fp[seg_starts]
            slots = (
                np.searchsorted(self.bit_off, uniq, side="right") - 1
            )
            q_constrained = slots[
                np.concatenate([[0], np.flatnonzero(np.diff(slots)) + 1])
            ] if slots.size else slots
            self.shard_plan[int(shard_s[s0])] = {
                "local_sorted": local[sl],
                "win_seg": seg_starts,
                "flat_pos": uniq,
                "q_constrained": q_constrained,
            }
        self.nbytes += int(
            sum(
                sum(a.nbytes for a in p.values())
                for p in self.shard_plan.values()
            )
        )


@ray.remote
def _build_layout_task(probeset_dir: str) -> "_ProbesetLayout":
    """The probeset layout, built ONCE for all buckets (it is identical
    for every bucket; at 1M queries it costs a meta scan + O(L) template
    work the plan builds should not each repeat)."""
    return _ProbesetLayout(probeset_dir)


@ray.remote
def _build_plan_task(
    probeset_dir: str, sb: int, cfg, layout=None
) -> "SliceProbePlan":
    """One bucket's plan, built ONCE in a Ray task.  The returned object
    lands in the object store, so every probe task on every node reads the
    same numpy payloads zero-copy from local plasma instead of re-decoding
    the probeset parquet per (worker x bucket) — at the 1M-query tier that
    replaces up to workers x NSB plan builds with exactly NSB."""
    import os

    plan = SliceProbePlan(probeset_dir, sb, cfg, layout=layout)
    if os.environ.get("METAPROFI_PLAN_LOG"):
        with open(os.environ["METAPROFI_PLAN_LOG"], "a") as f:
            f.write(f"{os.getpid()} broadcast {sb}\n")
    return plan


# Driver-side memo of the plan-build wave keyed by probeset content
# version: repeated queries against a REUSED probeset (the ``probeset_dir``
# API, the same panel against several thetas / source filters) skip the
# whole rebuild — at the 1M-query tier the wave is seconds of layout +
# per-bucket decode work.  Holding the refs pins the plasma plans
# (~60 MB x NSB at 1M queries), so only the last few probesets are kept.
_PLAN_REFS_MEMO: "dict[tuple, dict]" = {}
_PLAN_REFS_MEMO_MAX = 2


def build_plan_refs(probeset_dir: str, nsb: int, cfg) -> dict:
    """Kick off the layout build then the NSB plan builds in parallel;
    returns {sb: ObjectRef}.  Non-blocking — probe tasks block on their
    bucket's ref only; the layout ref resolves as a task dependency
    (zero-copy numpy from plasma), so the layout is built exactly once.
    Memoized per (probeset content version, nsb, cfg): a reused probeset
    reuses the plasma-resident plans instead of rebuilding the wave."""
    key = (probeset_dir, _probeset_version(probeset_dir), nsb, cfg)
    refs = _PLAN_REFS_MEMO.pop(key, None)
    if refs is None:
        layout_ref = _build_layout_task.remote(probeset_dir)
        refs = {
            sb: _build_plan_task.remote(probeset_dir, sb, cfg, layout_ref)
            for sb in range(nsb)
        }
    _PLAN_REFS_MEMO[key] = refs  # dict order == LRU order
    while len(_PLAN_REFS_MEMO) > _PLAN_REFS_MEMO_MAX:
        _PLAN_REFS_MEMO.pop(next(iter(_PLAN_REFS_MEMO)))
    return refs


# Per-process cache of plasma-backed plans keyed by ObjectRef so a worker
# deserializes each shared plan's dict structure once (array payloads stay
# zero-copy views over plasma either way).  Holding the views PINS the
# plasma objects, so the cap is byte-based like _PLAN_MEMO's (a count cap
# of 16 could pin ~5 GB of object store across successive 1M-query runs
# on a long-lived worker — each large plan is ~300 MB).
_SHARED_PLAN_CACHE: "dict[bytes, SliceProbePlan]" = {}
_SHARED_PLAN_CACHE_BYTES_MAX = 1 << 30


def _plan_from_ref(ref) -> "SliceProbePlan":
    key = ref.binary()
    plan = _SHARED_PLAN_CACHE.pop(key, None)
    if plan is None:
        plan = ray.get(ref)
    _SHARED_PLAN_CACHE[key] = plan  # dict order == LRU order
    total = sum(
        getattr(p, "nbytes", 0) for p in _SHARED_PLAN_CACHE.values()
    )
    while total > _SHARED_PLAN_CACHE_BYTES_MAX and len(_SHARED_PLAN_CACHE) > 1:
        oldest = next(iter(_SHARED_PLAN_CACHE))
        total -= getattr(_SHARED_PLAN_CACHE.pop(oldest), "nbytes", 0)
    return plan


# Process-level plan memo for the TASK-pool prober WITHOUT broadcast refs
# (direct library calls, tests): Ray tasks run in reusable worker
# processes, so each worker decodes a given probe slice once and serves
# every later batch of that bucket from memory (the BankIndex.load
# discipline).  BYTE-capped LRU, not count-capped: at 50k queries a plan
# is ~15 MB and all NSB buckets stay resident (a count cap of 4 thrashed
# against nsb=8 — plan rebuilds were ~95% of probe-task time); at 1M
# queries plans are ~300 MB and the cap holds a few, which is the right
# degradation.
_PLAN_MEMO: "dict[tuple, SliceProbePlan]" = {}
_PLAN_MEMO_BYTES_MAX = 1 << 30


def _plan_for(probeset_dir: str, sb: int, cfg: SketchConfig) -> "SliceProbePlan":
    key = (probeset_dir, sb, _probeset_version(probeset_dir))
    plan = _PLAN_MEMO.pop(key, None)
    if plan is None:
        plan = SliceProbePlan(probeset_dir, sb, cfg)
        import os as _os
        if _os.environ.get("METAPROFI_PLAN_LOG"):
            with open(_os.environ["METAPROFI_PLAN_LOG"], "a") as f:
                f.write(f"{_os.getpid()} {sb}\n")
    _PLAN_MEMO[key] = plan  # re-insert: dict order == LRU order
    total = sum(getattr(p, "nbytes", 0) for p in _PLAN_MEMO.values())
    while total > _PLAN_MEMO_BYTES_MAX and len(_PLAN_MEMO) > 1:
        oldest = next(iter(_PLAN_MEMO))  # dict order == LRU order
        total -= getattr(_PLAN_MEMO.pop(oldest), "nbytes", 0)
    return plan


def probe_bucket_batch(
    bank_batch: pa.Table, *, probeset_dir: str, sb: int, cfg: SketchConfig,
    nkb: int = N_REDUCE_BUCKETS, lane_mode: bool = False,
) -> pa.Table:
    """TASK-pool stage over ONE shard bucket's bank files: emits
    per-(query, source) mask rows.  A task pool (not an actor pool)
    because NSB concurrent sub-pipelines would each reserve actor CPUs —
    more pools than cores deadlocks a small cluster; tasks share the
    process-level plan memo instead.  The batch math mirrors
    ``probe_sharded.ShardProber`` (gather + reduceat + one packbits)."""
    plan = _plan_for(probeset_dir, sb, cfg)
    return _probe_with_plan(plan, bank_batch, nkb, lane_mode)


def probe_any_batch(
    bank_batch: pa.Table, *, probeset_dir: str, nsb: int, cfg: SketchConfig,
    nkb: int = N_REDUCE_BUCKETS, plan_refs: dict | None = None,
    lane_mode: bool = False,
) -> pa.Table:
    """Single-pipeline prober: ONE read of the bank files feeds one task
    pool; each task splits its batch by ``sb = shard_id % nsb`` and probes
    every slice against that bucket's plan.  With ``plan_refs`` (the
    default pipeline path) plans come zero-copy from the object store —
    built exactly once per bucket by ``build_plan_refs``; without refs
    (direct calls, tests) each worker builds via the process-level memo.
    With the hive shardbucket layout a block is one file = one bucket, so
    the split is usually a no-op — but this stage stays correct on any
    block layout, and collapsing NSB sub-pipelines into one removes NSB
    reads, repartitions and a union tree of per-pipeline barriers (the
    fixed overhead that dominated small query sets)."""
    if bank_batch.num_rows == 0:
        return MASK_SCHEMA.empty_table()
    sid = np.asarray(bank_batch["shard_id"].to_numpy(zero_copy_only=False))
    ok = sid >= 0
    sb_row = np.where(ok, sid % nsb, -1)
    present = [int(s) for s in np.unique(sb_row) if s >= 0]
    parts = []
    for sb in present:
        sel = sb_row == sb
        sub = bank_batch if sel.all() else bank_batch.filter(pa.array(sel))
        if plan_refs is not None and sb in plan_refs:
            plan = _plan_from_ref(plan_refs[sb])
        else:
            plan = _plan_for(probeset_dir, sb, cfg)
        parts.append(_probe_with_plan(plan, sub, nkb, lane_mode))
    if not parts:
        return MASK_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def _probe_with_plan(
    plan: "SliceProbePlan", bank_batch: pa.Table, nkb: int,
    lane_mode: bool = False,
) -> pa.Table:
        empty = MASK_SCHEMA.empty_table()
        if not plan.shard_plan or bank_batch.num_rows == 0:
            return empty
        sources = np.asarray(bank_batch["source"].to_pylist(), dtype=object)
        shard_ids = np.asarray(
            bank_batch["shard_id"].to_numpy(zero_copy_only=False)
        )
        bits_col = bank_batch["bits"]
        valid = np.flatnonzero(
            np.array(
                [sid >= 0 and int(sid) in plan.shard_plan
                 for sid in shard_ids]
            )
        )
        if valid.size == 0:
            return empty
        all_src = sorted({str(s) for s in sources[valid]})
        # the (sources × total-window-bits) work matrix grows with the
        # query count; at the 1M-query tier it would be tens of MB per
        # source, so process the batch in source chunks bounded to
        # ~128 MB of matrix — output tables concatenate seamlessly
        L_bits = plan.template.size
        per_chunk = max(1, (1 << 27) // max(L_bits, 1))
        if len(all_src) > per_chunk:
            chunks = [
                all_src[i : i + per_chunk]
                for i in range(0, len(all_src), per_chunk)
            ]
            parts = []
            for chunk in chunks:
                keep = np.isin(
                    np.array([str(s) for s in sources], dtype=object),
                    np.array(chunk, dtype=object),
                )
                parts.append(
                    _probe_with_plan(
                        plan, bank_batch.filter(pa.array(keep)), nkb,
                        lane_mode,
                    )
                )
            return pa.concat_tables(parts)
        src_names = all_src
        src_slot = {s: i for i, s in enumerate(src_names)}
        S = len(src_names)
        Q = plan.n_queries
        L = plan.template.size
        mat = np.broadcast_to(plan.template, (S, L)).copy()
        constrained = np.zeros((S, Q), dtype=bool)
        for r in valid:
            p = plan.shard_plan[int(shard_ids[r])]
            buf = bits_col[int(r)].as_py()
            bank = bloom.decode_dense(buf, len(buf) - 1)
            loc = p["local_sorted"]
            present = (bank[loc // 8] >> (loc % 8).astype(np.uint8)) & 1
            win_ok = np.bitwise_and.reduceat(
                present, p["win_seg"]
            ).astype(bool)
            row = src_slot[str(sources[r])]
            mat[row, p["flat_pos"]] &= win_ok
            constrained[row, p["q_constrained"]] = True
        packed = np.packbits(mat, axis=1, bitorder="little")
        if lane_mode:
            if nkb != N_REDUCE_BUCKETS:
                raise ValueError(
                    "lane mode requires nkb == N_REDUCE_BUCKETS "
                    "(the layout's lane grouping is built for it)"
                )
            return _emit_lanes(plan, packed, constrained, src_names)
        LB = packed.shape[1]
        byte_off = plan.byte_off
        offsets = np.empty(S * Q + 1, dtype=np.int64)
        offsets[:-1] = (
            np.arange(S, dtype=np.int64)[:, None] * LB + byte_off[None, :-1]
        ).ravel()
        offsets[-1] = S * LB
        mask_arr = pa.Array.from_buffers(
            pa.large_binary(),
            S * Q,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(packed.tobytes())],
        )
        shash = np.array([hash64_str(s) for s in src_names], dtype=np.uint64)
        qh_tile = np.tile(plan.qh_layout, S)
        n = S * Q
        full = pa.table(
            {
                "kb": pa.array(
                    (qh_tile % np.uint64(nkb)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "qh": pa.array(qh_tile),
                "si": pa.array(np.repeat(shash, Q)),
                "mask": mask_arr,
                "qid": pa.array([""] * n, pa.large_string()),
                "nw": pa.array(np.zeros(n, dtype=np.int32)),
                "c_shard": pa.array([b""] * n, pa.large_binary()),
                "c_win": pa.array([b""] * n, pa.large_binary()),
            },
            schema=MASK_SCHEMA,
        )
        return full.filter(pa.array(constrained.ravel()))


def _emit_lanes(
    plan: "SliceProbePlan", packed: np.ndarray, constrained: np.ndarray,
    src_names: list,
) -> pa.Table:
    """Lane-mode mask rows: ONE row per (source, reduce bucket), carrying
    the concatenated packed masks of every query in that bucket.  The
    layout is kb-major, so each bucket's bytes are already contiguous in
    ``packed`` — emission is offset arithmetic over the packed matrix, no
    per-batch byte gather.  Same payload bytes as the per-pair rows,
    ~n_queries/NKB fewer of them — the mask shuffle's sort cost is
    row-count-bound, so this is the ≫100k-query scale form.  A (source,
    kb) cell with no constrained query is omitted; omitted lanes are
    AND-identity by construction (the template leaves every valid window
    bit set), so the reduce's AND over the lanes that DO arrive is
    exact."""
    S = len(src_names)
    if plan.n_queries == 0:
        return MASK_SCHEMA.empty_table()
    # any-constrained per (source, kb): a 64-segment reduceat instead of a
    # full S x (Q+1) int64 cumsum (a ~128 MB temporary at 1M queries);
    # reduceat yields constrained[:, start] for EMPTY segments, so mask
    # those out
    nonempty = plan.kb_bounds[1:] > plan.kb_bounds[:-1]
    starts = np.minimum(plan.kb_bounds[:-1], constrained.shape[1] - 1)
    seg = (
        np.logical_or.reduceat(constrained, starts, axis=1)
        & nonempty[None, :]
    )
    emit = seg.ravel()
    if not emit.any():
        return MASK_SCHEMA.empty_table()
    lanes = packed
    LB = lanes.shape[1]
    nkb = plan.lane_bounds.shape[0] - 1
    n = S * nkb
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[:-1] = (
        np.arange(S, dtype=np.int64)[:, None] * LB
        + plan.lane_bounds[None, :-1]
    ).ravel()
    offsets[-1] = S * LB
    mask_arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(lanes.tobytes())],
    )
    shash = np.array([hash64_str(s) for s in src_names], dtype=np.uint64)
    full = pa.table(
        {
            "kb": pa.array(
                np.tile(np.arange(nkb, dtype=np.int32), S)
            ),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "qh": pa.array(np.zeros(n, dtype=np.uint64)),
            "si": pa.array(np.repeat(shash, nkb)),
            "mask": mask_arr,
            "qid": pa.array([""] * n, pa.large_string()),
            "nw": pa.array(np.zeros(n, dtype=np.int32)),
            "c_shard": pa.array([b""] * n, pa.large_binary()),
            "c_win": pa.array([b""] * n, pa.large_binary()),
        },
        schema=MASK_SCHEMA,
    )
    return full.filter(pa.array(emit))


def meta_to_reduce_rows(t: pa.Table) -> pa.Table:
    """Probeset meta rows → reduce-side query rows (kind=1), co-shuffled
    with the masks by the same kb key."""
    n = t.num_rows
    return pa.table(
        {
            "kb": t["kb"].combine_chunks().cast(pa.int32()),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "qh": t["qh"].combine_chunks().cast(pa.uint64()),
            "si": pa.array(np.zeros(n, dtype=np.uint64)),
            "mask": pa.array([b""] * n, pa.large_binary()),
            "qid": t["qid"].combine_chunks().cast(pa.large_string()),
            "nw": t["nw"].combine_chunks().cast(pa.int32()),
            "c_shard": t["c_shard"].combine_chunks().cast(pa.large_binary()),
            "c_win": t["c_win"].combine_chunks().cast(pa.large_binary()),
        },
        schema=MASK_SCHEMA,
    )


def meta_to_packed_rows(t: pa.Table) -> pa.Table:
    """Lane-mode meta: pack each batch's per-query meta rows into ONE row
    per kb (kind=2) — the meta-side mirror of ``_emit_lanes``.  At 1M+
    queries the per-query meta rows are the mask shuffle's row-count
    dominator once lanes exist; packing drops sort input from O(queries)
    to O(batches × NKB) rows with identical bytes.

    Wire format (internal to this module):
      ``nw``      = n, the packed query count
      ``mask``    = qh (u8×n) | nw (i4×n) | nent (i4×n) |
                    qid_off (i8×(n+1), relative) | qid utf8 bytes
      ``c_shard`` = the n queries' c_shard blobs concatenated
      ``c_win``   = the n queries' c_win blobs concatenated
    ``nent`` is each query's (shard, window) entry count, recovering the
    per-query slices of c_win (×4 bytes) and c_shard (× its self-described
    itemsize — 4 or 8 bytes, see ``_entry_widths``)."""
    if t.num_rows == 0:
        return MASK_SCHEMA.empty_table()
    kb = t["kb"].combine_chunks().to_numpy(zero_copy_only=False)
    qh = t["qh"].combine_chunks().to_numpy(zero_copy_only=False)
    nw = (
        t["nw"].combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.int32)
    )
    cs_off, cs_dat = _binary_col_views(t["c_shard"])
    cw_off, cw_dat = _binary_col_views(t["c_win"])
    qid_c = t["qid"].combine_chunks().cast(pa.large_string())
    q_off = np.frombuffer(qid_c.buffers()[1], dtype=np.int64)[
        qid_c.offset : qid_c.offset + len(qid_c) + 1
    ]
    q_buf = qid_c.buffers()[2]
    q_dat = (
        np.frombuffer(q_buf, dtype=np.uint8)
        if q_buf is not None
        else np.empty(0, dtype=np.uint8)
    )

    out = {name: [] for name in MASK_SCHEMA.names}
    order = np.argsort(kb, kind="stable")
    kb_s = kb[order]
    bounds = np.concatenate(
        [[0], np.flatnonzero(np.diff(kb_s)) + 1, [len(kb_s)]]
    )
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        rows = order[s0:s1]
        n = len(rows)
        cs_cat, _ = _gather_ragged(cs_dat, cs_off, rows)
        cw_cat, cw_bnd = _gather_ragged(cw_dat, cw_off, rows)
        # entry counts from the fixed-width (4 B/entry) win blob — the
        # shard blob's width is 4 or 8 B/entry (see _entry_widths)
        nent = ((cw_bnd[1:] - cw_bnd[:-1]) // 4).astype(np.int32)
        qd_cat, qd_bnd = _gather_ragged(q_dat, q_off, rows)
        blob = b"".join(
            [
                qh[rows].astype("<u8").tobytes(),
                nw[rows].astype("<i4").tobytes(),
                nent.tobytes(),
                qd_bnd.astype("<i8").tobytes(),
                qd_cat.tobytes(),
            ]
        )
        out["kb"].append(int(kb_s[s0]))
        out["kind"].append(2)
        out["qh"].append(0)
        out["si"].append(0)
        out["mask"].append(blob)
        out["qid"].append("")
        out["nw"].append(n)
        out["c_shard"].append(cs_cat.tobytes())
        out["c_win"].append(cw_cat.tobytes())
    return pa.table(
        {n: pa.array(out[n], MASK_SCHEMA.field(n).type)
         for n in MASK_SCHEMA.names},
        schema=MASK_SCHEMA,
    )


def _unpack_meta_rows(group: pa.Table, rows: np.ndarray):
    """Inverse of ``meta_to_packed_rows`` over a group's kind=2 rows:
    returns (qh, nw, nent, qid_arrays, cs_cat, cw_cat) concatenated in
    row order — all numpy except the per-row zero-copy Arrow qid arrays."""
    nw_col = group["nw"].combine_chunks().to_numpy(zero_copy_only=False)
    m_off, m_dat = _binary_col_views(group["mask"])
    cs_off, cs_dat = _binary_col_views(group["c_shard"])
    cw_off, cw_dat = _binary_col_views(group["c_win"])
    qhs, nws, nents, qid_arrays = [], [], [], []
    for r in rows:
        r = int(r)
        n = int(nw_col[r])
        blob = m_dat[m_off[r] : m_off[r + 1]]
        p = 0
        qhs.append(blob[p : p + 8 * n].copy().view("<u8")); p += 8 * n
        nws.append(blob[p : p + 4 * n].copy().view("<i4")); p += 4 * n
        nents.append(blob[p : p + 4 * n].copy().view("<i4")); p += 4 * n
        qd_bnd = blob[p : p + 8 * (n + 1)].copy().view("<i8")
        p += 8 * (n + 1)
        qd = blob[p:]
        qid_arrays.append(
            pa.Array.from_buffers(
                pa.large_string(), n,
                [None, pa.py_buffer(qd_bnd.tobytes()),
                 pa.py_buffer(qd.tobytes())],
            )
        )
    cs_cat, _ = _gather_ragged(cs_dat, cs_off, rows)
    cw_cat, _ = _gather_ragged(cw_dat, cw_off, rows)
    return (
        np.concatenate(qhs) if qhs else np.empty(0, dtype=np.uint64),
        np.concatenate(nws) if nws else np.empty(0, dtype=np.int32),
        np.concatenate(nents) if nents else np.empty(0, dtype=np.int32),
        qid_arrays,
        cs_cat,
        cw_cat,
    )


def make_distributed_reduce(theta: int, source_shards_ref,
                            theta_compat: str = "exact",
                            lane_mode: bool = False):
    """groupby(kb) finalizer: AND each (query, source) pair's bucket masks,
    clear windows probed in shards the source has NO bank row for (the
    per-query correction structure arrives as co-shuffled meta rows, not a
    broadcast probe object), count windows, apply theta.  With
    ``lane_mode`` the kind=0 rows are per-(source, kb) LANES covering every
    query in the bucket (see ``_emit_lanes``) and the reduce is the
    vectorized ``_reduce_lane_group``."""

    cache: dict = {}
    POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

    def _fill_cache(group_needed: bool = True) -> None:
        if "src" in cache:
            return
        src_shards: dict[str, set[int]] = ray.get(source_shards_ref)
        full: set[int] = set()
        for sh in src_shards.values():
            full |= sh
        cache["src"] = {
            int(hash64_str(s)): np.array(sorted(sh), dtype=np.int64)
            for s, sh in src_shards.items()
        }
        cache["name"] = {int(hash64_str(s)): s for s in src_shards}
        cache["full"] = np.array(sorted(full), dtype=np.int64)
        cache["is_full"] = {
            h: arr.size == cache["full"].size
            for h, arr in cache["src"].items()
        }

    if lane_mode:
        def reduce_lanes(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return HITS_SCHEMA.empty_table()
            _fill_cache()
            return _reduce_lane_group(
                group, cache, POP, theta, theta_compat
            )

        return reduce_lanes

    def reduce_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        if "src" not in cache:
            src_shards: dict[str, set[int]] = ray.get(source_shards_ref)
            full: set[int] = set()
            for sh in src_shards.values():
                full |= sh
            cache["src"] = {
                int(hash64_str(s)): np.array(sorted(sh), dtype=np.int64)
                for s, sh in src_shards.items()
            }
            cache["name"] = {int(hash64_str(s)): s for s in src_shards}
            cache["full"] = np.array(sorted(full), dtype=np.int64)
            # a source holding a row for EVERY shard any source holds can
            # never need the missing-shard correction for a query whose
            # probed shards all exist in the index — the vectorized fast
            # path below keys on this pair of precomputed flags
            cache["is_full"] = {
                h: arr.size == cache["full"].size
                for h, arr in cache["src"].items()
            }
        src_shards_by_hash = cache["src"]
        name_of = cache["name"]
        full_arr = cache["full"]
        is_full = cache["is_full"]

        kinds = group["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        meta_idx = np.flatnonzero(kinds == 1)
        pair_idx = np.flatnonzero(kinds == 0)
        if pair_idx.size == 0 or meta_idx.size == 0:
            return HITS_SCHEMA.empty_table()
        qh_all = group["qh"].combine_chunks().to_numpy(zero_copy_only=False)
        # per-query info
        qinfo: dict[int, dict] = {}
        qid_col = group["qid"]
        nw_col = group["nw"]
        cs_col = group["c_shard"]
        cw_col = group["c_win"]
        for i in meta_idx:
            i = int(i)
            c_win = np.frombuffer(cw_col[i].as_py(), dtype="<i4")
            cs_buf = cs_col[i].as_py()
            # shard blob width is self-described by the 4 B/entry win blob
            cs_item = len(cs_buf) // c_win.size if c_win.size else 8
            c_shard = np.frombuffer(cs_buf, dtype=f"<i{cs_item}")
            qinfo[int(qh_all[i])] = {
                "qid": qid_col[i].as_py(),
                "nw": int(nw_col[i].as_py()),
                "c_shard": c_shard,
                "c_win": c_win,
                # every probed shard exists somewhere in the index → a
                # full source needs no correction for this query
                "in_full": bool(
                    np.isin(np.unique(c_shard), full_arr).all()
                ),
            }

        si_all = group["si"].combine_chunks().to_numpy(zero_copy_only=False)
        mask_col = group["mask"].combine_chunks()
        o_buf = mask_col.buffers()[1]
        off = np.frombuffer(o_buf, dtype=np.int64)[
            mask_col.offset : mask_col.offset + len(mask_col) + 1
        ]
        data_buf = mask_col.buffers()[2]
        vals = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None
            else np.empty(0, dtype=np.uint8)
        )
        lens = off[1:] - off[:-1]

        qi = qh_all[pair_idx]
        si = si_all[pair_idx]
        order = pair_idx[np.lexsort((qi, si))]
        qi_s = qh_all[order]
        si_s = si_all[order]
        change = (np.diff(qi_s) != 0) | (np.diff(si_s) != 0)
        seg = np.concatenate([[0], np.flatnonzero(change) + 1])
        seg_end = np.concatenate([seg[1:], [len(order)]])
        first = order[seg]

        out_q: list = []
        out_s: list = []
        out_w: list = []
        out_n: list = []
        out_f: list = []

        def finalize_pair(p: int) -> None:
            rows = order[seg[p] : seg_end[p]]
            r0 = int(rows[0])
            acc = vals[off[r0] : off[r0] + lens[r0]].copy()
            for r in rows[1:]:
                r = int(r)
                acc &= vals[off[r] : off[r] + lens[r]]
            q = qinfo.get(int(qh_all[r0]))
            if q is None:
                return
            nw = q["nw"]
            if nw == 0:
                return
            bits = np.unpackbits(acc, bitorder="little")[:nw].astype(bool)
            have = src_shards_by_hash.get(int(si_all[r0]))
            if have is not None:
                miss = ~np.isin(q["c_shard"], have)
                if miss.any():
                    bits[q["c_win"][miss]] = False
            found = int(bits.sum())
            if found < int(min_windows(nw, theta, theta_compat)):
                return
            out_q.append(q["qid"])
            out_s.append(name_of.get(int(si_all[r0]), ""))
            out_w.append(found)
            out_n.append(nw)
            out_f.append(round(found * 100.0 / nw, 2))

        # fast path: (full source, index-resident query) pairs need no
        # missing-shard correction — batch them by mask length; everything
        # else goes through the per-pair finalizer
        probed_ok = np.empty(len(seg), dtype=bool)
        nw_arr = np.empty(len(seg), dtype=np.int64)
        for p in range(len(seg)):
            r0 = int(first[p])
            q = qinfo.get(int(qh_all[r0]))
            if q is None:
                probed_ok[p] = False
                nw_arr[p] = 0
                continue
            nw_arr[p] = q["nw"]
            probed_ok[p] = (
                q["in_full"] and is_full.get(int(si_all[r0]), False)
            )
        seg_lens = lens[first]
        arrays: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for Lb in np.unique(seg_lens):
            sel = np.flatnonzero(seg_lens == Lb)
            is_fast = probed_ok[sel] & (nw_arr[sel] > 0)
            fast = sel[is_fast]
            for p in sel[~is_fast]:
                finalize_pair(int(p))
            if fast.size == 0:
                continue
            counts = seg_end[fast] - seg[fast]
            row_idx = np.concatenate(
                [order[seg[p] : seg_end[p]] for p in fast]
            )
            gather = off[row_idx][:, None] + np.arange(int(Lb))[None, :]
            stacked = vals[gather]
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            final = np.bitwise_and.reduceat(stacked, starts, axis=0)
            found = POP[final].sum(axis=1)
            rep = first[fast]
            nw = nw_arr[fast]
            hit = found >= min_windows(nw, theta, theta_compat)
            arrays.append((rep[hit], found[hit], nw[hit]))

        for rep, found, nw in arrays:
            for r, f, n in zip(rep, found, nw):
                q = qinfo[int(qh_all[int(r)])]
                out_q.append(q["qid"])
                out_s.append(name_of.get(int(si_all[int(r)]), ""))
                out_w.append(int(f))
                out_n.append(int(n))
                out_f.append(round(int(f) * 100.0 / int(n), 2))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "source": pa.array(out_s, pa.string()),
                "wins_found": pa.array(out_w, pa.int64()),
                "n_wins": pa.array(out_n, pa.int64()),
                "fraction": pa.array(out_f, pa.float64()),
            },
            schema=HITS_SCHEMA,
        )

    return reduce_bucket


def _binary_col_views(col: "pa.ChunkedArray"):
    """(offsets, data) numpy views over a combined large_binary column."""
    c = col.combine_chunks()
    off = np.frombuffer(c.buffers()[1], dtype=np.int64)[
        c.offset : c.offset + len(c) + 1
    ]
    buf = c.buffers()[2]
    dat = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return off, dat


def _gather_ragged(dat: np.ndarray, off: np.ndarray, rows: np.ndarray):
    """Concatenate ``dat[off[r]:off[r+1]]`` for each r in ``rows`` (a copy,
    so the result is aligned for dtype views); returns (flat, bounds)."""
    lens = off[rows + 1] - off[rows]
    bnd = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(bnd[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8), bnd
    gidx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(bnd[:-1], lens)
        + np.repeat(off[rows], lens)
    )
    return dat[gidx], bnd


def _reduce_lane_group(
    group: pa.Table, cache: dict, POP: np.ndarray, theta: int,
    theta_compat: str,
) -> pa.Table:
    """Lane-mode reduce for ONE kb group: derive the bucket's local mask
    layout from its meta rows (qh-sorted, byte-padded — the same order the
    probe's kb-major layout produced), AND each source's lanes bytewise,
    popcount per query region, apply the missing-shard correction only to
    the (source, query) cells that can need it, and threshold.  All array
    math except the (rare) per-query correction fix-ups."""
    empty = HITS_SCHEMA.empty_table()
    kinds = group["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    meta_idx = np.flatnonzero(kinds == 2)
    lane_idx = np.flatnonzero(kinds == 0)
    if lane_idx.size == 0:
        return empty

    src_shards_by_hash = cache["src"]
    name_of = cache["name"]
    full_arr = cache["full"]
    is_full = cache["is_full"]

    si_all = group["si"].combine_chunks().to_numpy(zero_copy_only=False)

    # ---- kb-local layout from the meta rows (kind=2 packed, the lane
    # default; kind=1 per-query rows accepted as a fallback) -------------
    if meta_idx.size:
        qh_cat, nw_cat, nent_cat, qid_arrays, cs_cat, cw_cat = (
            _unpack_meta_rows(group, meta_idx)
        )
    else:
        m1 = np.flatnonzero(kinds == 1)
        if m1.size == 0:
            return empty
        qh_cat = group["qh"].combine_chunks().to_numpy(
            zero_copy_only=False
        )[m1]
        nw_cat = group["nw"].combine_chunks().to_numpy(
            zero_copy_only=False
        )[m1].astype(np.int32)
        cs_off, cs_dat = _binary_col_views(group["c_shard"])
        cw_off, cw_dat = _binary_col_views(group["c_win"])
        cs_cat, _ = _gather_ragged(cs_dat, cs_off, m1)
        cw_cat, cw_b1 = _gather_ragged(cw_dat, cw_off, m1)
        nent_cat = ((cw_b1[1:] - cw_b1[:-1]) // 4).astype(np.int32)
        qid_arrays = [
            group["qid"].combine_chunks().cast(pa.large_string())
            .take(pa.array(m1))
        ]
    if qh_cat.size == 0:
        return empty
    order_m = np.argsort(qh_cat, kind="stable")
    nw_loc = nw_cat[order_m].astype(np.int64)
    pad = (nw_loc + 7) // 8
    off_loc = np.concatenate([[0], np.cumsum(pad)]).astype(np.int64)
    Lk = int(off_loc[-1])
    Qk = len(order_m)
    qid_all = (
        pa.concat_arrays(qid_arrays)
        if len(qid_arrays) > 1
        else qid_arrays[0]
    )

    # constraint structure re-sliced into qh-sorted order (entries are
    # (shard, window) pairs; every query has >= 1 entry).  The shard
    # blob's itemsize is self-described: total bytes / total entries
    # (4 or 8 B/entry, see _entry_widths; uniform within one probeset)
    ent_b = np.concatenate([[0], np.cumsum(nent_cat.astype(np.int64))])
    n_ent_tot = int(ent_b[-1])
    cs_item = cs_cat.size // n_ent_tot if n_ent_tot else 8
    cs_sorted, cs_bnd = _gather_ragged(cs_cat, ent_b * cs_item, order_m)
    cw_sorted, _ = _gather_ragged(cw_cat, ent_b * 4, order_m)
    shards_cat = cs_sorted.view(f"<i{cs_item}")
    wins_cat = cw_sorted.view("<i4")
    q_bnd = (cs_bnd // cs_item).astype(np.int64)
    in_full_q = np.logical_and.reduceat(
        np.isin(shards_cat, full_arr), q_bnd[:-1]
    ) if shards_cat.size else np.zeros(Qk, dtype=bool)

    # ---- lanes grouped by source ---------------------------------------
    m_off, m_dat = _binary_col_views(group["mask"])
    order_l = lane_idx[np.argsort(si_all[lane_idx], kind="stable")]
    si_s = si_all[order_l]
    seg_b = np.concatenate([[0], np.flatnonzero(np.diff(si_s)) + 1])
    seg_e = np.concatenate([seg_b[1:], [len(order_l)]])

    thr = min_windows(nw_loc, theta, theta_compat)
    # window-key stride for the (query, window) dedupe in the vectorized
    # missing-shard correction below
    Wmax = int(nw_loc.max()) + 1 if Qk else 1

    hit_midx: list[np.ndarray] = []
    hit_w: list[np.ndarray] = []
    hit_n: list[np.ndarray] = []
    hit_src: list[str] = []
    hit_len: list[int] = []
    span = np.arange(Lk, dtype=np.int64)[None, :]
    for p in range(len(seg_b)):
        rows = order_l[seg_b[p] : seg_e[p]]
        if int(m_off[rows[0] + 1] - m_off[rows[0]]) != Lk:
            raise ValueError("lane length mismatch: probeset/meta desync")
        stacked = m_dat[m_off[rows][:, None] + span]
        final = (
            np.bitwise_and.reduce(stacked, axis=0)
            if stacked.shape[0] > 1
            else stacked[0]
        )
        counts = np.add.reduceat(POP[final], off_loc[:-1])
        sh = int(si_s[seg_b[p]])
        have = src_shards_by_hash.get(sh)
        if have is None:
            continue
        if is_full.get(sh, False):
            flagged = np.flatnonzero(~in_full_q)
        else:
            ok = (
                np.logical_and.reduceat(
                    np.isin(shards_cat, have), q_bnd[:-1]
                )
                if shards_cat.size
                else np.zeros(Qk, dtype=bool)
            )
            flagged = np.flatnonzero(~ok)
        if flagged.size:
            # vectorized correction: a window probed through a shard this
            # source lacks cannot be confirmed, so its bit must not count.
            # Gather every flagged query's (shard, window) entries at once,
            # keep the entries whose shard is missing, dedupe (query,
            # window) — a window appears once per hash function, zeroing is
            # idempotent — and subtract the popcount of the SET bits at
            # exactly those positions.  Equivalent to the former per-query
            # unpackbits/zero/repack, with no per-cell Python (adversarial
            # sparse-shard indexes flag ~S x Q cells).
            lens_f = q_bnd[flagged + 1] - q_bnd[flagged]
            total = int(lens_f.sum())
            if total:
                csum_f = np.cumsum(lens_f)
                gidx = np.arange(total, dtype=np.int64) + np.repeat(
                    q_bnd[flagged] - np.concatenate(([0], csum_f[:-1])),
                    lens_f,
                )
                miss_e = ~np.isin(shards_cat[gidx], have)
                if miss_e.any():
                    qi_m = np.repeat(flagged, lens_f)[miss_e].astype(
                        np.int64
                    )
                    win_m = wins_cat[gidx[miss_e]].astype(np.int64)
                    key = np.unique(qi_m * Wmax + win_m)
                    qi_u = key // Wmax
                    win_u = key % Wmax
                    byte = off_loc[qi_u] + (win_u >> 3)
                    is_set = (final[byte] >> (win_u & 7)) & 1
                    counts = counts - np.bincount(
                        qi_u, weights=is_set, minlength=Qk
                    ).astype(counts.dtype)
        hit = np.flatnonzero((counts >= thr) & (nw_loc > 0))
        if hit.size == 0:
            continue
        hit_midx.append(order_m[hit])
        hit_w.append(counts[hit])
        hit_n.append(nw_loc[hit])
        hit_src.append(name_of.get(sh, ""))
        hit_len.append(int(hit.size))
    if not hit_midx:
        return empty
    all_midx = np.concatenate(hit_midx)
    all_w = np.concatenate(hit_w).astype(np.int64)
    all_n = np.concatenate(hit_n).astype(np.int64)
    qids = qid_all.take(pa.array(all_midx)).cast(pa.string())
    srcs = pa.array(
        np.repeat(np.array(hit_src, dtype=object), hit_len), pa.string()
    )
    fracs = (all_w * 100.0 / all_n).round(2)  # matches probe.py's rounding
    return pa.table(
        {
            "query_id": qids,
            "source": srcs,
            "wins_found": pa.array(all_w),
            "n_wins": pa.array(all_n),
            "fraction": pa.array(fracs),
        },
        schema=HITS_SCHEMA,
    )
