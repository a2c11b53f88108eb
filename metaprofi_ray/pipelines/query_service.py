"""Warm interactive query service — the latency path for repeated queries.

``query_index`` spins up a fresh actor pool per call; fine for throughput
jobs, but an interactive caller (the reference's repeated ``search_index``
invocations against a hot index, search_index.py:32-113) pays ~1-2 s of
actor spawn + dataset dispatch per batch.  ``QueryService`` holds a pool of
plain Ray actors with the broadcast ``BankIndex`` loaded ONCE and answers
each query table by splitting it across the pool — request latency is pure
probe compute + one object-store round trip.

This is one of the few places raw ``@ray.remote`` actors are justified over
a Dataset: the state (loaded index) must outlive MANY small requests, and
per-request Dataset planning overhead would dominate the work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..sources.io import BankIndex
from ..stages.probe import HITS_SCHEMA, probe_batch


@ray.remote
class _ProbeActor:
    def __init__(self, index_ref):
        self.index: BankIndex = index_ref

    def probe(self, table: pa.Table, theta: int) -> pa.Table:
        return probe_batch(table, self.index, theta)


class QueryService:
    """Hold a warm probe pool for an index dir; ``query()`` as many times
    as needed; ``close()`` (or ``with``) tears the actors down.

    Repeated identical requests are served from a driver-side LRU keyed by
    (query-table content, theta) — the analogue of the reference's LMDB
    query-slice cache (lmdb_kv_store.py), valid because a service instance
    is bound to one immutable index."""

    def __init__(self, index_dir: str, n_actors: int = 4, cache_size: int = 64):
        index = BankIndex.load(index_dir)
        index_ref = ray.put(index)
        self.actors = [_ProbeActor.remote(index_ref) for _ in range(n_actors)]
        from collections import OrderedDict

        self._cache: "OrderedDict[tuple, pa.Table]" = OrderedDict()
        self._cache_size = cache_size
        self.cache_hits = 0
        self.cache_misses = 0
        # touch every actor once so construction cost is paid here, not on
        # the first query
        ray.get(
            [
                a.probe.remote(
                    pa.table(
                        {
                            "query_id": pa.array([], pa.string()),
                            "tokens": pa.array([], pa.list_(pa.int32())),
                        }
                    ),
                    100,
                )
                for a in self.actors
            ]
        )

    @staticmethod
    def _request_key(queries: pa.Table, theta: int) -> tuple:
        """Content hash over the IPC serialization of the request columns.
        (Hashing raw Arrow buffers would be wrong: a sliced table shares
        its parent's buffers, so different slices could collide.)"""
        import hashlib

        import pyarrow.ipc as ipc

        sink = pa.BufferOutputStream()
        sub = queries.select(["query_id", "tokens"])
        with ipc.new_stream(sink, sub.schema) as w:
            w.write_table(sub)
        h = hashlib.blake2b(sink.getvalue(), digest_size=16)
        return (theta, queries.num_rows, h.digest())

    def query(self, queries: pa.Table, theta: int = 100) -> pa.Table:
        """Probe one query table; returns the hits table (HITS_SCHEMA)."""
        if not 1 <= theta <= 100:
            raise ValueError("theta must be in [1, 100]")
        n = queries.num_rows
        if n == 0:
            return HITS_SCHEMA.empty_table()
        key = self._request_key(queries, theta)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            self.cache_hits += 1
            return hit
        self.cache_misses += 1
        k = len(self.actors)
        bounds = np.linspace(0, n, min(k, n) + 1).astype(int)
        futs = [
            a.probe.remote(queries.slice(int(lo), int(hi - lo)), theta)
            for a, lo, hi in zip(self.actors, bounds[:-1], bounds[1:])
            if hi > lo
        ]
        out = pa.concat_tables(ray.get(futs))
        self._cache[key] = out
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return out

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self) -> "QueryService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
