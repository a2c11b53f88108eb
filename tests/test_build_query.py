"""End-to-end build → query oracle tests (FIXTURES.md §2, SURVEY.md §5c/d).

The oracle is a brute-force ``{source → set(window bytes)}`` dict computed
from the same Parquet — exact containment semantics with the reference's
threshold formula ``ceil(n_wins * theta / 100)`` counting every window
including duplicates (/root/reference/metaprofi/lib/search_index.py:414-431,532).
"""

import glob
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.pipelines import build as build_pipe
from metaprofi_ray.pipelines import query as query_pipe
from metaprofi_ray.sources.io import BankIndex
from metaprofi_ray.sources.synth import make_queries

CFG = SketchConfig(k=8, h=2, m=1 << 17, shards=4, hll_p=12)


def brute_force_sets(corpus_dir: str, k: int) -> dict[str, set[bytes]]:
    out: dict[str, set[bytes]] = {}
    t = pq.read_table(corpus_dir)
    for row in range(t.num_rows):
        toks = np.asarray(t["tokens"][row].as_py(), dtype=np.int32)
        src = t["source"][row].as_py()
        s = out.setdefault(src, set())
        for i in range(len(toks) - k + 1):
            s.add(toks[i : i + k].tobytes())
    return out


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("index") / "idx"
    build_pipe.build_from_parquet(
        sorted(glob.glob(corpus_dir + "/*.parquet")), CFG, str(d)
    )
    return str(d)


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    return brute_force_sets(corpus_dir, CFG.k)


def _windows_of(tokens: np.ndarray, k: int) -> list[bytes]:
    return [tokens[i : i + k].tobytes() for i in range(len(tokens) - k + 1)]


class TestBuild:
    def test_index_files_exist(self, index_dir):
        import os

        assert os.path.exists(index_dir + "/manifest.json")
        assert glob.glob(index_dir + "/banks/**/*.parquet", recursive=True)
        assert os.path.exists(index_dir + "/sources.parquet")

    def test_counts_match_oracle(self, index_dir, corpus_dir, oracle):
        """n_docs / n_wins per source vs brute force (short rows filtered)."""
        summary = pq.read_table(index_dir + "/sources.parquet")
        t = pq.read_table(corpus_dir)
        n_tok = np.array(t["n_tok"].to_pylist())
        srcs = np.array(t["source"].to_pylist())
        for row in range(summary.num_rows):
            s = summary["source"][row].as_py()
            keep = (srcs == s) & (n_tok >= CFG.k)
            assert summary["n_docs"][row].as_py() == int(keep.sum())
            true_wins = int((n_tok[keep] - CFG.k + 1).sum())
            assert summary["n_wins"][row].as_py() == true_wins

    def test_hll_estimates_within_error(self, index_dir, oracle):
        summary = pq.read_table(index_dir + "/sources.parquet")
        for row in range(summary.num_rows):
            s = summary["source"][row].as_py()
            est = summary["hll_distinct"][row].as_py()
            true = len(oracle[s])
            assert abs(est - true) / true < 3 * 1.04 / math.sqrt(2**CFG.hll_p)

    def test_tokens_pass_through_unchanged(self, ray_session, corpus_dir):
        """Per-row invariant (BASELINE.json input_hint): token arrays survive
        the engine's read + filter stage byte-identical."""
        import ray.data as rd
        from metaprofi_ray.stages.bloom_build import filter_min_len
        from functools import partial

        files = sorted(glob.glob(corpus_dir + "/*.parquet"))
        ds = build_pipe.read_tokens(files).map_batches(
            partial(filter_min_len, k=CFG.k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        ref = pq.read_table(files).to_pandas()
        ref = ref[ref.n_tok >= CFG.k].sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(ref)
        for a, b in zip(got["tokens"], ref["tokens"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestQuery:
    def test_exact_no_false_negatives(self, index_dir, corpus_dir, oracle):
        """Bloom property: every true containment must be reported."""
        queries = make_queries(corpus_dir, CFG.k)
        hits = query_pipe.query_table(index_dir, queries, theta=100)
        got = {
            (hits["query_id"][r].as_py(), hits["source"][r].as_py())
            for r in range(hits.num_rows)
        }
        for row in range(queries.num_rows):
            qid = queries["query_id"][row].as_py()
            toks = np.asarray(queries["tokens"][row].as_py(), dtype=np.int32)
            wins = _windows_of(toks, CFG.k)
            if not wins:
                continue
            for src, bag in oracle.items():
                if all(w in bag for w in wins):
                    assert (qid, src) in got, f"false negative {qid} vs {src}"

    def test_exact_fpr_within_bound(self, index_dir, corpus_dir, oracle):
        """Negative single-window probes: FPR <= 3x the analytic bound of the
        densest source (FIXTURES.md §2.3)."""
        rng = np.random.default_rng(99)
        n_probe = 4000
        toks = rng.integers(200_000, 400_000, size=(n_probe, CFG.k), dtype=np.int32)
        queries = pa.table(
            {
                "query_id": [f"fp-{i}" for i in range(n_probe)],
                "tokens": pa.array(list(toks), type=pa.list_(pa.int32())),
            }
        )
        hits = query_pipe.query_table(index_dir, queries, theta=100)
        # per-source false positive rate
        n_max = max(len(v) for v in oracle.values())
        bound = CFG.fpr_bound(n_max)
        per_source_fp = hits.num_rows / (n_probe * len(oracle))
        assert per_source_fp <= 3 * bound + 1e-3, (per_source_fp, bound)

    def test_theta_threshold_semantics(self, index_dir, corpus_dir, oracle):
        """theta-partial queries: hit iff planted fraction >= theta, using
        ceil(n_wins * theta / 100) over ALL windows incl. duplicates."""
        queries = make_queries(corpus_dir, CFG.k)
        qmask = [
            q.as_py().startswith("theta") for q in queries["query_id"]
        ]
        tq = queries.filter(pa.array(qmask))
        for theta in (30, 60, 90):
            hits = query_pipe.query_table(index_dir, tq, theta=theta)
            got = {
                (hits["query_id"][r].as_py(), hits["source"][r].as_py())
                for r in range(hits.num_rows)
            }
            for row in range(tq.num_rows):
                qid = tq["query_id"][row].as_py()
                toks = np.asarray(tq["tokens"][row].as_py(), dtype=np.int32)
                wins = _windows_of(toks, CFG.k)
                min_wins = math.ceil(len(wins) * theta / 100)
                for src, bag in oracle.items():
                    true_cnt = sum(w in bag for w in wins)
                    if true_cnt >= min_wins:
                        assert (qid, src) in got

    def test_distributed_query_matches_driver(self, ray_session, index_dir, corpus_dir):
        import ray.data as rd

        queries = make_queries(corpus_dir, CFG.k)
        local = query_pipe.query_table(index_dir, queries, theta=75)
        ds = rd.from_arrow(queries)
        dist = query_pipe.query_index(index_dir, ds, theta=75, concurrency=2)
        dpdf = (
            dist.to_pandas()
            .sort_values(["query_id", "source"])
            .reset_index(drop=True)
        )
        lpdf = (
            local.to_pandas()
            .sort_values(["query_id", "source"])
            .reset_index(drop=True)
        )
        assert dpdf.equals(lpdf)

    def test_report_roundtrip(self, index_dir, corpus_dir):
        queries = make_queries(corpus_dir, CFG.k)
        hits = query_pipe.query_table(index_dir, queries, theta=40)
        text = query_pipe.format_report(hits, theta=40)
        parsed = query_pipe.parse_report(text)
        assert len(parsed) == len(set(hits["query_id"].to_pylist()))
        text100 = query_pipe.format_report(
            query_pipe.query_table(index_dir, queries, theta=100), theta=100
        )
        parsed100 = query_pipe.parse_report(text100)
        for q, srcs in parsed100.items():
            assert all(v is None for v in srcs.values())

    def test_theta_validation(self, index_dir):
        with pytest.raises(ValueError):
            query_pipe.query_table(index_dir, pa.table({"query_id": [], "tokens": []}), theta=0)


class TestFprAccounting:
    def test_measured_fpr_within_hll_bound(self, ray_session):
        """North-star FPR accounting: measured FPR on provably-absent
        probes stays within the analytic bound computed from the HLL
        estimate (3x slack + probe granularity for Poisson noise)."""
        from metaprofi_ray.pipelines.flagship import bloom_fpr_report

        df = bloom_fpr_report("/root/testdata/sf0.001", n_probes=2000)
        assert len(df) > 0
        slack = 3 * df["fpr_bound"] + 2.5 / 2000
        assert (df["measured_fpr"] <= slack).all(), df[df.measured_fpr > slack]


class TestRealisticM:
    def test_big_m_sharded_build_and_query(self, ray_session, corpus_dir, tmp_path_factory):
        """Reference-scale m (2^28 bits = 32 MB/source) with 32 shards:
        sharding keeps every merge buffer at 1 MB, sparse encoding keeps
        partials tiny, and query semantics hold unchanged."""
        import glob as _glob

        big = SketchConfig(k=8, h=2, m=1 << 28, shards=32)
        root = tmp_path_factory.mktemp("bigm")
        idx = str(root / "idx")
        files = sorted(_glob.glob(corpus_dir + "/*.parquet"))
        build_pipe.build_from_parquet(files, big, str(idx))
        queries = make_queries(corpus_dir, big.k, n_exact=10, n_negative=10)
        hits = query_pipe.query_table(idx, queries, theta=100)
        got = {
            (hits["query_id"][r].as_py(), hits["source"][r].as_py())
            for r in range(hits.num_rows)
        }
        # all exact positives must self-hit; at this m false positives ~ 0
        for row in range(queries.num_rows):
            qid = queries["query_id"][row].as_py()
            if qid.startswith("exact-"):
                owner = qid.split("|")[1].split("-doc")[0]
                assert (qid, owner) in got
        import pyarrow.parquet as _pq

        banks = _pq.read_table(idx + "/banks", columns=["shard_id"])
        assert banks.num_rows <= 8 * 33  # 8 sources x (32 shards + stats)


class TestShortQueryRows:
    def test_zero_window_rows_do_not_truncate_neighbors(self, index_dir, corpus_dir, oracle):
        """Regression (review finding): a batch whose TRAILING rows have
        n_tok < k must not truncate the last windowed query's reduceat
        segment — previously a fully-matching query lost its final window
        and dropped below the theta=100 threshold."""
        t = pq.read_table(corpus_dir)
        row = next(
            r for r in range(t.num_rows) if t["n_tok"][r].as_py() >= CFG.k + 6
        )
        toks = np.asarray(t["tokens"][row].as_py(), dtype=np.int32)[: CFG.k + 6]
        src = t["source"][row].as_py()
        short = np.array([1, 2], dtype=np.int32)  # < k -> zero windows
        queries = pa.table(
            {
                "query_id": ["full", "short-a", "short-b"],
                "tokens": pa.array([toks, short, short], type=pa.list_(pa.int32())),
            }
        )
        hits = query_pipe.query_table(index_dir, queries, theta=100)
        got = {
            (hits["query_id"][r].as_py(), hits["source"][r].as_py(),
             hits["wins_found"][r].as_py())
            for r in range(hits.num_rows)
        }
        n_wins = len(toks) - CFG.k + 1
        assert ("full", src, n_wins) in got  # ALL windows counted
        assert not any(q.startswith("short") for q, _, _ in got)

    def test_interleaved_zero_window_rows(self, index_dir, corpus_dir):
        t = pq.read_table(corpus_dir)
        rows = [r for r in range(t.num_rows) if t["n_tok"][r].as_py() >= CFG.k + 4][:2]
        full = [np.asarray(t["tokens"][r].as_py(), dtype=np.int32)[: CFG.k + 4] for r in rows]
        short = np.array([9], dtype=np.int32)
        queries = pa.table(
            {
                "query_id": ["a", "gap", "b"],
                "tokens": pa.array([full[0], short, full[1]], type=pa.list_(pa.int32())),
            }
        )
        hits = query_pipe.query_table(index_dir, queries, theta=100)
        per_q = {}
        for r in range(hits.num_rows):
            per_q.setdefault(hits["query_id"][r].as_py(), set()).add(
                hits["wins_found"][r].as_py()
            )
        nw = CFG.k + 4 - CFG.k + 1
        assert nw in per_q.get("a", set()) and nw in per_q.get("b", set())


class TestThetaCompat:
    def test_reference_float_mode_differs_on_boundary(self):
        """ADVICE r2: the reference computes ceil((nw/100)*theta) whose float
        rounding shifts ~1.6% of (nw, theta) pairs; compat='reference'
        reproduces those boundaries for parity harnesses."""
        import numpy as np

        from metaprofi_ray.stages.probe import min_windows

        # documented boundary: 7 windows at theta=100 is unreachable in the
        # reference (demands 8), integer-exact demands 7
        assert int(min_windows(7, 100)) == 7
        assert int(min_windows(7, 100, compat="reference")) == 8
        # another boundary: nw=14, theta=50 -> (0.14*50)=7.000000000000001
        assert int(min_windows(14, 50)) == 7
        assert int(min_windows(14, 50, compat="reference")) == 8
        # vectorized form agrees with scalars
        nw = np.array([7, 110, 33, 1])
        np.testing.assert_array_equal(
            min_windows(nw, 100), np.array([7, 110, 33, 1])
        )
        # modes agree away from boundaries
        assert int(min_windows(33, 75)) == int(
            min_windows(33, 75, compat="reference")
        )
        import pytest

        with pytest.raises(ValueError):
            min_windows(5, 50, compat="bogus")
