"""Query pipeline: exact / theta containment search against a bank index.

Ray-Data-native replacement for ``metaprofi search_index``
(/root/reference/metaprofi/lib/search_index.py:32-398, traced SURVEY.md §3.2):
the index is loaded once, broadcast via ``ray.put``, and probed by an actor
pool inside ``map_batches`` — no LMDB caches, no fork pools.

theta=100 reproduces exact search (every window present, A4); theta<100 is
approximate containment with threshold ``ceil(n_wins * theta / 100)`` (A5,
search_index.py:532).  Results are a Dataset of
``(query_id, source, wins_found, n_wins, fraction)`` hit rows; a text report
formatter mirrors the reference's output for parity (S9/S10).
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray
import ray.data as rd

from ..logutil import silence_empty_schema_warnings
from ..sources.io import BankIndex
from ..stages.probe import HITS_SCHEMA, probe_batch


def query_index(
    index_dir: str,
    queries: rd.Dataset,
    theta: int = 100,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 1024,
    theta_compat: str = "exact",
) -> rd.Dataset:
    """Probe a query Dataset (query_id, tokens) against the index on disk.

    Validates theta like the reference CLI (metaprofi_main.py:251-253).
    The loaded index is broadcast ONCE (`ray.put`), not per batch.
    ``concurrency`` now only sizes the block split of a single-block query
    source (the probe runs as a task pool, which autoscales on its own).
    """
    if not 1 <= theta <= 100:
        raise ValueError("theta must be in [1, 100]")
    silence_empty_schema_warnings()
    index = BankIndex.load(index_dir)
    index_ref = ray.put(index)
    # a single-block query source (from_arrow / one small file) would feed
    # ONE task no matter the parallelism — spread it first
    pool_max = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    try:
        if queries.num_blocks() < pool_max:
            queries = queries.repartition(pool_max * 2)
    except Exception:
        pass  # planning-time block count unavailable: leave layout as-is
    # TASK pool, not actor pool: the only per-worker state is the broadcast
    # index, and ray.get(index_ref) inside a task is a zero-copy plasma
    # read — so tasks skip the actor-spawn cost entirely (6x lower wall
    # time on a warm 2k-query call) while autoscaling freely.  The
    # stateful-actor form survives in QueryService (interactive path) and
    # ShardProber (streaming path), where state is rebuilt per batch
    # otherwise.
    from functools import partial

    return queries.map_batches(
        partial(_probe_task, index_ref=index_ref, theta=theta,
                theta_compat=theta_compat),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )


def _probe_task(
    batch: pa.Table, *, index_ref, theta: int, theta_compat: str = "exact"
) -> pa.Table:
    return probe_batch(batch, ray.get(index_ref), theta,
                       theta_compat=theta_compat)


def query_index_streaming(
    index_dir: str,
    queries: pa.Table,
    theta: int = 100,
    concurrency: int | tuple[int, int] = (1, 8),
    theta_compat: str = "exact",
    sources: list[str] | None = None,
    lane_mode: bool | None = None,
) -> rd.Dataset:
    """Scale path: the BANK dataset streams (never broadcast, never fully in
    memory) while the query probe set is broadcast — for indexes whose
    banks exceed worker memory (reference configs reach m = 4×10^10).

    Equivalent results to ``query_index`` (property-tested); shuffle volume
    is one small mask row per (query, source) pair constrained by each bank
    batch — never the query × source cross product — independent of m.
    See ``stages.probe_sharded`` for the protocol.

    ``sources`` restricts the search to those bank columns; on the (default)
    hive srcbucket layout only the matching bucket directories are READ —
    ``bank_io.bank_files`` exposes the pruned/total file counts a caller or
    test can assert — and an exact membership filter inside the first
    ``map_batches`` removes same-bucket neighbours.

    ``lane_mode`` picks the mask-shuffle protocol (see
    ``query_index_streaming_distributed`` — same semantics): per-(query,
    source) pair rows, or per-(source, reduce-bucket) LANE rows carrying
    all of a bucket's query masks in one row.  ``None`` (default) chooses
    lanes at ≥ 4096 queries.  Results are identical (property-tested).
    """
    import pyarrow.parquet as pq

    from ..sources import io as bank_io
    from ..stages.probe_sharded import (
        QueryProbeSet,
        ShardProber,
        make_reduce_masks,
    )

    if not 1 <= theta <= 100:
        raise ValueError("theta must be in [1, 100]")
    silence_empty_schema_warnings()
    cfg, doc = bank_io.read_manifest(index_dir)
    probe_ref = ray.put(QueryProbeSet(queries, cfg))
    files, _total = bank_io.bank_files(index_dir, sources=sources)
    keys = pq.read_table(files, columns=["source", "shard_id"])
    source_shards: dict[str, set[int]] = {}
    src_filter = frozenset(sources) if sources else None
    for s, sid in zip(keys["source"].to_pylist(), keys["shard_id"].to_pylist()):
        if sid >= 0 and (src_filter is None or s in src_filter):
            source_shards.setdefault(s, set()).add(sid)
    source_shards_ref = ray.put(source_shards)
    banks = rd.read_parquet(files, columns=["source", "shard_id", "bits"])
    if src_filter is not None:
        import pyarrow.compute as pc

        allowed = pa.array(sorted(src_filter), pa.string())

        def keep_sources(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["source"], value_set=allowed))

        banks = banks.map_batches(
            keep_sources, batch_format="pyarrow", zero_copy_batch=True
        )
    # a source whose shard rows scatter across B probe batches emits B×
    # the mask rows of a co-located one.  The srcbucket hive layout keeps a
    # source's rows inside ONE srcbucket directory but SPREAD over its
    # shardbucket subdirs, so the ORDER-PRESERVING coalesce (repartition
    # without shuffle — no all-to-all) must target one block per srcbucket
    # dir: the sorted file list keeps each dir's files adjacent, and rows
    # hash-distribute evenly across srcbuckets, so a row-count split at
    # n_srcbuckets blocks lines up with dir boundaries.  (A row-count
    # target ignoring dirs split every source across ~8 shardbucket files
    # and inflated reduce volume ~8× — measured 4 s → 10 s at 10k
    # queries.)  Flat layouts keep the old fragmentation-based target.
    n_files = len(files)
    pool_max = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    n_srcbuckets = int(doc.get("src_buckets") or 0)
    if n_srcbuckets > 0:
        target = max(n_srcbuckets, 2 * pool_max)
    else:
        target = max(2 * pool_max, n_files // 4)
    if n_files > target:
        banks = banks.repartition(target)
    if lane_mode is None:
        lane_mode = queries.num_rows >= 4096
    masks = banks.map_batches(
        ShardProber,
        fn_constructor_args=(probe_ref, lane_mode),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
        num_cpus=1,
    )
    # coarse-bucket reduce: the shuffle produces 64 groups (kb = 64-bit
    # (query ^ source) hash % 64 in pair mode, query hash % 64 in lane
    # mode), each finalizing its pairs/lanes in-process (per-pair Ray
    # dispatch would dominate at scale)
    return masks.groupby("kb").map_groups(
        make_reduce_masks(probe_ref, theta, source_shards_ref,
                          theta_compat=theta_compat, lane_mode=lane_mode),
        batch_format="pyarrow",
    )


def _sweep_stale_probesets(ttl_sec: float = 3600.0) -> None:
    """Remove auto-created ``/tmp/metaprofi_probeset_*`` dirs untouched for
    ``ttl_sec`` — the distributed path leaves probe sets on disk for reuse
    across calls, and long-lived services would otherwise accrete them.
    Only anonymous (12-hex-digit uuid-named) dirs are swept;
    caller-supplied ``probeset_dir`` paths are never touched (reused dirs
    also get their mtime refreshed per query, so only genuinely idle dirs
    age out).  Races are benign: a concurrent query that just created its
    dir keeps a fresh mtime."""
    import glob
    import os
    import re
    import shutil

    now = time.time()
    anon = re.compile(r"/metaprofi_probeset_[0-9a-f]{12}$")
    for d in glob.glob("/tmp/metaprofi_probeset_????????????"):
        if not anon.search(d):
            continue
        try:
            if now - os.path.getmtime(d) > ttl_sec:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            continue


def query_index_streaming_distributed(
    index_dir: str,
    queries: "rd.Dataset | pa.Table",
    theta: int = 100,
    concurrency: int | tuple[int, int] = (1, 8),
    theta_compat: str = "exact",
    sources: list[str] | None = None,
    probeset_dir: str | None = None,
    lane_mode: bool | None = None,
) -> rd.Dataset:
    """≫100k-query scale path: BOTH sides stream.  The probe set is never
    built on the driver and never broadcast — a parallel ``map_batches``
    pass hashes the query windows and writes a hive-partitioned probeset
    (``sb=<shard bucket>`` entry slices + per-query meta under ``sb=-1``);
    per-bucket prober actors load only their slice in ``__init__`` from the
    bank layout's matching ``shardbucket=N`` files, and the reduce gets the
    per-query finalization structure as co-shuffled meta rows.  See
    ``stages.probe_distributed`` for the protocol; results equal
    ``query_index`` / ``query_index_streaming`` (property-tested; requires
    unique ``query_id`` values).

    ``probeset_dir`` may be passed to reuse a prepared probe set across
    calls (e.g. the same query panel against several indexes).

    ``lane_mode`` picks the mask-shuffle protocol: per-(query, source)
    pair rows (exactly what the reduce consumes, best when sources ≫
    queries) or per-(source, reduce-bucket) LANE rows carrying all of a
    bucket's query masks in one row (~n_queries/64 fewer rows for the
    same bytes — the shuffle at large query counts is row-count-bound,
    so this is the ≫100k-query form).  ``None`` (default) chooses lanes
    when the probe set holds ≥ 4096 queries.  Results are identical
    (property-tested)."""
    import os
    import uuid

    import pyarrow.parquet as pq

    from ..sources import io as bank_io
    from ..stages.probe_distributed import (
        build_plan_refs,
        make_distributed_reduce,
        meta_to_packed_rows,
        meta_to_reduce_rows,
        prep_probe_batch,
        probe_any_batch,
    )

    if not 1 <= theta <= 100:
        raise ValueError("theta must be in [1, 100]")
    silence_empty_schema_warnings()
    cfg, _ = bank_io.read_manifest(index_dir)
    nsb = bank_io.shard_bucket_count(index_dir) or 1
    pool_max = concurrency[1] if isinstance(concurrency, tuple) else concurrency

    if isinstance(queries, pa.Table):
        # one block + repartition, NOT driver-side table.slice() blocks:
        # pickling a sliced Arrow table ships the WHOLE backing buffers
        # per slice (measured 64x inflation at 1M queries), while Ray's
        # block split compacts.  Parquet-fed callers skip this entirely
        # (scripts/probe_scale_bench.py --e2e --pq).
        qds = rd.from_arrow(queries)
    else:
        qds = queries
    try:
        # the PREP pass is a pure map over the query set — parallelize it
        # to the cluster, not to the prober pool knob (16 prep tasks on a
        # 32-CPU node halved e2e prep before this)
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            ncpu = 0
        prep_target = max(pool_max * 2, ncpu * 2)
        if qds.num_blocks() < prep_target:
            qds = qds.repartition(prep_target)
    except Exception:
        pass
    if probeset_dir is None:
        _sweep_stale_probesets()
        probeset_dir = f"/tmp/metaprofi_probeset_{uuid.uuid4().hex[:12]}"
    if not os.path.isdir(os.path.join(probeset_dir, "sb=-1")):
        from functools import partial

        qds.map_batches(
            partial(prep_probe_batch, cfg=cfg, nsb=nsb),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(probeset_dir, partition_cols=["sb"])
    else:
        # reuse: refresh the dir mtime so an actively-reused probeset
        # never ages into the sweep window mid-use
        try:
            os.utime(probeset_dir, None)
        except OSError:
            pass
    meta_dir = os.path.join(probeset_dir, "sb=-1")
    if not os.path.isdir(meta_dir):
        return rd.from_arrow(empty_hits())  # no query yields any window

    # build each bucket's probe plan EXACTLY ONCE, in parallel tasks; probe
    # tasks read the shared plans zero-copy from the object store (per-node
    # plasma broadcast on a cluster) instead of each worker re-decoding its
    # buckets' probeset slices
    plan_refs = build_plan_refs(probeset_dir, nsb, cfg)

    if lane_mode is None:
        # row counts live in the parquet footers — no data read
        import glob as _glob

        n_queries = sum(
            pq.read_metadata(f).num_rows
            for f in _glob.glob(os.path.join(meta_dir, "*.parquet"))
        )
        lane_mode = n_queries >= 4096

    # small driver-side source map (O(sources), the same two key columns
    # the broadcast streaming path reads) — names + per-source shard sets
    # for the reduce's missing-shard correction
    all_files, _ = bank_io.bank_files(index_dir, sources=sources)
    keys = pq.read_table(all_files, columns=["source", "shard_id"])
    src_filter = frozenset(sources) if sources else None
    source_shards: dict[str, set[int]] = {}
    for s, sid in zip(keys["source"].to_pylist(), keys["shard_id"].to_pylist()):
        if sid >= 0 and (src_filter is None or s in src_filter):
            source_shards.setdefault(s, set()).add(sid)
    source_shards_ref = ray.put(source_shards)

    import pyarrow.compute as pc

    allowed = (
        pa.array(sorted(src_filter), pa.string()) if src_filter else None
    )

    def keep_sources(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["source"], value_set=allowed))

    if not all_files:
        return rd.from_arrow(empty_hits())
    banks = rd.read_parquet(
        all_files, columns=["source", "shard_id", "bits"]
    )
    if allowed is not None:
        banks = banks.map_batches(
            keep_sources, batch_format="pyarrow", zero_copy_batch=True
        )
    # ONE prober pipeline over all shard buckets (tasks split batches by
    # sb themselves) — per-bucket sub-pipelines cost NSB reads +
    # repartitions + a union barrier tree, pure overhead for small query
    # sets.  Coalesce only when the file count is genuinely fragmented;
    # files are sorted by bucket dir so adjacent blocks share a bucket.
    n_files = len(all_files)
    target = max(2 * pool_max, n_files // 4)
    if n_files > max(32, target):
        banks = banks.repartition(target)
    from functools import partial

    masks = banks.map_batches(
        partial(probe_any_batch, probeset_dir=probeset_dir, nsb=nsb, cfg=cfg,
                plan_refs=plan_refs, lane_mode=lane_mode),
        batch_format="pyarrow",
        batch_size=None,
        num_cpus=1,
    )
    # lane mode packs each batch's meta into one row per kb (the meta-side
    # mirror of the lane masks) — per-query meta rows are otherwise the
    # shuffle's row-count dominator at large query counts.  The lane
    # reduce accepts both forms; METAPROFI_PACKED_META=0 forces the
    # per-query form (A/B escape hatch).
    packed = lane_mode and os.environ.get(
        "METAPROFI_PACKED_META", "1"
    ) != "0"
    meta_fn = meta_to_packed_rows if packed else meta_to_reduce_rows
    meta_rows = rd.read_parquet(
        meta_dir, columns=["kb", "qh", "qid", "nw", "c_shard", "c_win"]
    ).map_batches(meta_fn, batch_format="pyarrow")
    combined = masks.union(meta_rows)
    return combined.groupby("kb").map_groups(
        make_distributed_reduce(theta, source_shards_ref,
                                theta_compat=theta_compat,
                                lane_mode=lane_mode),
        batch_format="pyarrow",
    )


def query_table(
    index_dir: str, queries: pa.Table, theta: int = 100,
    theta_compat: str = "exact",
) -> pa.Table:
    """Single-shot driver-side query for small query sets — the analogue of
    the reference's inline single-sequence path (search_index.py:104-159)."""
    if not 1 <= theta <= 100:
        raise ValueError("theta must be in [1, 100]")
    index = BankIndex.load(index_dir)
    return probe_batch(queries, index, theta, theta_compat=theta_compat)


def format_report(hits: pa.Table, theta: int) -> str:
    """Text report mirroring the reference's layout
    (search_index.py:614-659): one block per query, exact lists sample ids,
    approximate lists ``sample_id: count (pct%)``."""
    lines = [
        f"# metaprofi_ray query results (theta={theta}) "
        f"generated {time.strftime('%d_%m_%Y-%H_%M_%S')}"
    ]
    by_query: dict[str, list[tuple[str, int, float]]] = {}
    for row in range(hits.num_rows):
        by_query.setdefault(hits["query_id"][row].as_py(), []).append(
            (
                hits["source"][row].as_py(),
                hits["wins_found"][row].as_py(),
                hits["fraction"][row].as_py(),
            )
        )
    for qid in sorted(by_query):
        lines.append(f"Query: {qid}")
        for src, cnt, pct in sorted(by_query[qid]):
            if theta == 100:
                lines.append(f"\t{src}")
            else:
                lines.append(f"\t{src}: {cnt} ({pct}%)")
    return "\n".join(lines) + "\n"


def parse_report(text: str) -> dict[str, dict[str, tuple[int, float] | None]]:
    """Parse a report back into ``{query_id: {source: (count, pct) | None}}``
    — the public-API parser the reference exposes (utilities.py:655-733)."""
    out: dict[str, dict] = {}
    cur: dict | None = None
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        if line.startswith("Query: "):
            cur = out.setdefault(line[len("Query: ") :], {})
        elif line.startswith("\t") and cur is not None:
            body = line.strip()
            if ": " in body:
                src, rest = body.split(": ", 1)
                cnt, pct = rest.split(" (")
                cur[src] = (int(cnt), float(pct.rstrip("%)")))
            else:
                cur[body] = None
    return out


def empty_hits() -> pa.Table:
    return HITS_SCHEMA.empty_table()
