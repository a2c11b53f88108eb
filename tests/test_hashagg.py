"""hash_aggregate / hash_partition_exec: exactness vs the native groupby.

The helper replaces Ray's sort-based aggregate at HIGH key cardinality
(per-group Python accumulate — see functions/hashagg.py docstring); these
tests pin that it computes the identical result, that hash partitions
arrive complete (every key in exactly one batch), and that the call-site
schemas are preserved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from metaprofi_ray.functions.hashagg import hash_aggregate, hash_partition_exec


def _random_table(seed: int, n: int = 50_000, nkeys: int = 3_000) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": [f"key{int(i)}" for i in rng.integers(0, nkeys, size=n)],
            "g": rng.integers(0, 7, size=n).astype(np.int64),
            "v": rng.integers(-100, 100, size=n).astype(np.int64),
        }
    )


class TestHashAggregate:
    def test_sum_min_matches_native_groupby(self, ray_session):
        t = _random_table(1)
        ds = rd.from_arrow(t).repartition(16)
        got = (
            hash_aggregate(
                ds, ["k"],
                [("v", "sum", "sum_v"), ("v", "min", "min_v"),
                 (None, "count_all", "n")],
                num_partitions=8,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            t.to_pandas()
            .groupby("k", as_index=False)
            .agg(sum_v=("v", "sum"), min_v=("v", "min"), n=("v", "size"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_multi_key(self, ray_session):
        t = _random_table(2, n=20_000, nkeys=500)
        ds = rd.from_arrow(t).repartition(9)
        got = (
            hash_aggregate(ds, ["k", "g"], [("v", "sum", "s")], num_partitions=5)
            .to_pandas()
            .sort_values(["k", "g"])
            .reset_index(drop=True)
        )
        want = (
            t.to_pandas()
            .groupby(["k", "g"], as_index=False)
            .agg(s=("v", "sum"))
            .sort_values(["k", "g"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_partitions_hold_complete_keys(self, ray_session):
        """Every key must appear in exactly one block_fn batch — the
        invariant hash_partition_exec's exactness rests on (would break
        if the shuffle ever split a partition across blocks)."""
        t = _random_table(3, n=30_000, nkeys=200)
        ds = rd.from_arrow(t).repartition(12)

        def keys_per_batch(b: pa.Table) -> pa.Table:
            uniq = sorted(set(b["k"].to_pylist()))
            return pa.table({"k": pa.array(uniq, pa.string())})

        seen = hash_partition_exec(ds, ["k"], keys_per_batch, num_partitions=6)
        ks = seen.to_pandas()["k"]
        assert ks.is_unique  # each key surfaced by exactly one batch
        assert set(ks) == set(t["k"].to_pylist())

    def test_shuffle_strategy_restored(self, ray_session):
        """The helper flips the DATASET-captured context (the one the
        planner actually reads — the global one is snapshot at root
        creation and inherited), and must restore it so sibling branches
        of the same root keep their strategy."""
        ds = rd.from_arrow(_random_table(4, n=1_000, nkeys=50))
        before = ds.context.shuffle_strategy
        out = hash_aggregate(ds, ["k"], [("v", "sum", "s")], num_partitions=2)
        assert ds.context.shuffle_strategy == before
        # the MATERIALIZED result snapshots its own context while HASH is
        # active — it must be reset, or every downstream groupby on its
        # descendants silently runs under the hash aggregator (measured
        # ~10 s/call of 64-actor pool readiness stalls on a 4-CPU session)
        assert out.context.shuffle_strategy == before

    def test_exact_dedup_hash_path_matches_native(
        self, ray_session, monkeypatch
    ):
        """exact_dedup / dedup_stats gate on corpus size; forcing the hash
        path on the small table must give byte-identical answers to the
        native path (same rows, same values)."""
        import metaprofi_ray.functions.hashagg as hashagg
        from metaprofi_ray.pipelines import dedup

        sf = "/root/testdata/sf0.001"
        native_dedup = dedup.exact_dedup(sf).to_pandas()
        native_stats = dedup.dedup_stats(sf)
        monkeypatch.setattr(hashagg, "hash_path_pays", lambda *a, **k: True)
        hash_dedup = dedup.exact_dedup(sf).to_pandas()
        hash_stats = dedup.dedup_stats(sf)
        pd.testing.assert_frame_equal(
            native_dedup.sort_values("text_md5").reset_index(drop=True)[
                ["text_md5", "keep_doc_id"]
            ],
            hash_dedup.sort_values("text_md5").reset_index(drop=True)[
                ["text_md5", "keep_doc_id"]
            ],
            check_dtype=False,
        )
        pd.testing.assert_frame_equal(native_stats, hash_stats, check_dtype=False)

    def test_distinct_windows_and_topk_hash_paths_match_native(
        self, ray_session, monkeypatch
    ):
        import metaprofi_ray.functions.hashagg as hashagg
        from metaprofi_ray.pipelines import flagship, textstats

        sf = "/root/testdata/sf0.001"
        native_dw = flagship.exact_distinct_windows(sf)
        native_tk = textstats.token_topk(sf)
        monkeypatch.setattr(hashagg, "hash_path_pays", lambda *a, **k: True)
        monkeypatch.setattr(hashagg, "hash_path_pays_bytes", lambda *a, **k: True)
        hash_dw = flagship.exact_distinct_windows(sf)
        hash_tk = textstats.token_topk(sf)
        pd.testing.assert_frame_equal(native_dw, hash_dw, check_dtype=False)
        pd.testing.assert_frame_equal(
            native_tk.reset_index(drop=True),
            hash_tk.reset_index(drop=True),
            check_dtype=False,
        )

    def test_partitions_for_and_duplicate_specs(self, ray_session):
        from metaprofi_ray.functions.hashagg import (
            _effective_partitions,
            partitions_for,
        )

        # memory floor: data volume, not CPU count, bounds partition size
        assert partitions_for(1_000_000, 56) == 1  # 56 MB -> 1
        assert partitions_for(1_000_000_000, 56) == 418  # 56 GB / 128 MB
        # the data floor overrides the CPU cap (capped at Ray's 64)
        assert _effective_partitions(32, 50) == 50
        assert _effective_partitions(32, 500) == 64
        assert _effective_partitions(32, None) <= 32
        ds = rd.from_arrow(_random_table(6, n=100, nkeys=10))
        with pytest.raises(ValueError, match="duplicate"):
            hash_aggregate(ds, ["k"], [("v", "sum", "a"), ("v", "sum", "b")])

    def test_restored_on_failure(self, ray_session):
        ds = rd.from_arrow(_random_table(5, n=1_000, nkeys=50))
        before = ds.context.shuffle_strategy

        def boom(b: pa.Table) -> pa.Table:
            raise RuntimeError("kaboom")

        with pytest.raises(Exception):
            hash_partition_exec(ds, ["k"], boom, num_partitions=2)
        assert ds.context.shuffle_strategy == before
