"""Exact high-cardinality aggregation via hash repartition + per-block
Arrow ``group_by``.

Why this exists: Ray Data's built-in ``groupby(...).aggregate(...)`` (sort
shuffle + ``AggregateFn``) pays a per-GROUP Python accumulate/merge loop.
At low key cardinality (sources, shards, brands) that is invisible; at high
cardinality it dominates — profiling the BPE word-frequency table
(``ds.stats()``, 49k distinct words over 3.36M block-combined partial rows)
showed the Aggregate operator spending **347 s remote CPU / 24 s wall** on
a job whose map+combine stages take 2 s, ~100 µs per group.  Exact dedup
(``groupby(md5)``) and distinct-window counting (``groupby(source, h)``)
have keys proportional to the CORPUS, so at 100 TB this loop is the
difference between an aggregation that scales and one that melts.

The fix is the classic hash-aggregate plan: repartition rows so every key
lands in exactly ONE output block (``Dataset.repartition(n, keys=...)``,
which requires ``DataContext.shuffle_strategy = HASH_SHUFFLE``), then run
ONE C++ ``pyarrow.Table.group_by(...).aggregate(...)`` per block.  No
per-group Python anywhere; the shuffle moves each row once.

Mechanics / contracts:

- ``DataContext`` is read at EXECUTION time (verified: restoring the
  strategy before executing raises), so the pipeline is executed
  (materialized) inside the scoped strategy switch.  That is acceptable
  by construction: an aggregate's output is key-cardinality-bounded and
  is exactly what the caller consumes next.
- The hash shuffle emits ONE block per non-empty partition and does not
  split oversized partitions afterwards (verified empirically with
  partitions 8x over ``target_max_block_size``), so ``map_batches(...,
  batch_size=None)`` sees every key complete within one batch.  Callers
  size ``num_partitions`` so partitions stay comfortably under worker
  memory (rows_estimate x row_bytes / num_partitions ≲ 256 MB).
- Keys must be non-null (all call sites construct them).
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

import pyarrow as pa

import ray.data as rd

DEFAULT_PARTITIONS = 32

# The hash path pays ~2 s of fixed cost per call (aggregator actor pool
# spin-up + the materialize barrier); below this input size the native
# sort aggregate's per-group loop is cheaper than the spin-up.  Call
# sites gate on the RAW read_parquet dataset (metadata-only count).
HASH_PATH_MIN_ROWS = 200_000


def hash_path_pays(raw_ds: rd.Dataset, threshold: int = HASH_PATH_MIN_ROWS) -> bool:
    """Row-count gate — right when reduce-input rows ≈ raw rows (one hash
    row per doc: exact_dedup, dedup_stats)."""
    return raw_ds.count() >= threshold


HASH_PATH_MIN_BYTES = 32 << 20


def hash_path_pays_bytes(
    raw_ds: rd.Dataset, threshold: int = HASH_PATH_MIN_BYTES
) -> bool:
    """Byte-size gate — for reduces whose input cardinality scales with
    CONTENT volume, not row count (word/token counts: a 100k-doc corpus
    can feed millions of partial rows into the reduce).  ``size_bytes``
    comes from Parquet metadata (cheap)."""
    return (raw_ds.size_bytes() or 0) >= threshold


# Target partition size for the per-block Arrow group_by (each partition
# is ONE batch in one task's heap); Ray caps hash-shuffle aggregators at 64.
PARTITION_TARGET_BYTES = 128 << 20
_MAX_PARTITIONS = 64


def partitions_for(est_rows: int, row_bytes: int) -> int:
    """Minimum partition count that keeps ``est_rows × row_bytes`` under
    ``PARTITION_TARGET_BYTES`` per partition (callers pass this as
    ``min_partitions`` so data volume, not CPU count, bounds partition
    size — the hash shuffle never splits an oversized partition)."""
    import math

    return max(1, math.ceil(est_rows * row_bytes / PARTITION_TARGET_BYTES))


def _effective_partitions(requested: int, min_partitions: int | None) -> int:
    """Two forces, in priority order: (a) MEMORY — ``min_partitions``
    (from ``partitions_for``) is a floor, because each partition is
    processed as one Arrow batch and the shuffle never splits it; (b)
    POOL READINESS — absent a data-driven floor, cap at the session's
    CPU count: the shuffle spawns ``min(num_partitions, 64)`` aggregator
    actors and the executor waits (up to 300 s!) for the pool, which
    stalls a 4-CPU test session under a 32-actor default.  When the two
    conflict (big data, few CPUs), memory wins — slow beats OOM.  Ray
    hard-caps aggregators at 64; beyond that, size per-call via
    ``num_partitions``/``min_partitions`` and accept larger partitions
    or pre-reduce harder before the shuffle."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or requested
    except Exception:
        cpus = requested
    base = min(requested, cpus)
    if min_partitions:
        base = max(base, min_partitions)
    return max(2, min(base, _MAX_PARTITIONS))


@contextmanager
def _hash_shuffle_ctx(ds: rd.Dataset):
    """Scoped ``shuffle_strategy = HASH_SHUFFLE`` on the DATASET'S captured
    context.  ``DataContext`` is snapshot at ROOT dataset creation and
    inherited down the lineage (verified: toggling the global context
    around a dataset built earlier does not reach its plan), so the switch
    must go through ``ds.context``; it is restored on exit so sibling
    branches of the same root keep their original strategy."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev


def hash_partition_exec(
    ds: rd.Dataset,
    keys: list[str],
    block_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = DEFAULT_PARTITIONS,
    min_partitions: int | None = None,
) -> rd.Dataset:
    """Hash-partition ``ds`` by ``keys`` and apply ``block_fn`` once per
    partition (every row of a key in the same single batch).  Executes
    within the scoped HASH_SHUFFLE switch and returns the materialized
    result (bounded: ``block_fn`` is an aggregation/reduction).

    ``min_partitions`` (see ``partitions_for``) is the data-volume floor:
    pass it whenever the shuffled rows can outgrow
    ``PARTITION_TARGET_BYTES × session_cpus``."""
    num_partitions = _effective_partitions(num_partitions, min_partitions)
    with _hash_shuffle_ctx(ds):
        out = ds.repartition(num_partitions, keys=keys).map_batches(
            block_fn, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        mat = out.materialize()
    # The materialized result snapshots its OWN context while HASH was
    # active; without this reset every downstream groupby/sort on its
    # descendants silently runs under the hash aggregator (and on a small
    # session stalls ~10 s per call waiting for a 64-actor pool).
    mat.context.shuffle_strategy = ds.context.shuffle_strategy
    return mat


def hash_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    specs: list[tuple[str | None, str, str]],
    num_partitions: int = DEFAULT_PARTITIONS,
    min_partitions: int | None = None,
) -> rd.Dataset:
    """Exact ``groupby(keys)`` aggregate.  ``specs`` is a list of
    ``(column, fn, out_name)`` with ``fn`` an Arrow hash-aggregate kernel
    name (``"sum" | "min" | "max" | "mean" | "count"``); ``column=None``
    with ``fn="count_all"`` counts rows.  Output schema: keys + out_names
    (same rows as ``ds.groupby(keys).aggregate(...)``, computed without
    the per-group Python loop — see module docstring)."""
    arrow_aggs = [
        ((c if c is not None else []), fn) for c, fn, _ in specs
    ]
    renames = {
        (f"{c}_{fn}" if c is not None else f"{fn}"): out
        for c, fn, out in specs
    }
    if len(renames) != len(specs):
        # two specs sharing (column, fn) map to ONE pyarrow output column;
        # the rename would silently keep only the last out_name
        raise ValueError(f"duplicate (column, fn) pairs in specs: {specs}")

    def agg_block(t: pa.Table) -> pa.Table:
        out = t.group_by(keys).aggregate(arrow_aggs)
        cols = [renames.get(n, n) for n in out.column_names]
        out = out.rename_columns(cols)
        # stable column order: keys first, then spec order
        return out.select(keys + [o for _, _, o in specs])

    return hash_partition_exec(ds, keys, agg_block, num_partitions, min_partitions)
