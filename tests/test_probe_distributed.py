"""Distributed-probe streaming path: the probe set is a Dataset (built by
parallel map_batches, read by per-bucket actors from parquet) — results
must equal the broadcast prober exactly, with NO driver-side probe build
(VERDICT r3 #4)."""

import glob

import pandas as pd
import pytest

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.pipelines import build as build_pipe
from metaprofi_ray.pipelines import query as query_pipe
from metaprofi_ray.sources.synth import generate_corpus, make_queries

CFG = SketchConfig(k=8, h=2, m=1 << 16, shards=4)


@pytest.fixture(scope="module")
def dist_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("dpq")
    corpus = generate_corpus(
        str(root / "corpus"), n_sources=6, docs_total=500, k=8
    )
    idx = str(root / "idx")
    build_pipe.build_from_parquet(
        sorted(glob.glob(corpus + "/*.parquet")), CFG, idx
    )
    return corpus, idx


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["query_id", "source"]).reset_index(drop=True)
        [["query_id", "source", "wins_found", "n_wins", "fraction"]]
    )


@pytest.mark.parametrize("theta", [100, 60])
def test_distributed_equals_broadcast(dist_index, theta):
    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=20, n_negative=20)
    broadcast = query_pipe.query_table(idx, queries, theta=theta).to_pandas()
    dist = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=theta
    ).to_pandas()
    assert _norm(dist).equals(_norm(broadcast))


def test_distributed_no_driver_probe_build(dist_index, monkeypatch):
    """The monolithic QueryProbeSet must never be constructed on this
    path, and nothing may collect a Dataset to the driver mid-pipeline."""
    from metaprofi_ray.stages import probe_sharded

    def boom(*a, **k):
        raise AssertionError("driver-side QueryProbeSet build on the "
                             "distributed path")

    monkeypatch.setattr(probe_sharded, "QueryProbeSet", boom)
    import ray.data as rd

    calls: list[int] = []
    orig = rd.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        calls.append(len(out))
        return out

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy)
    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=8, n_negative=4)
    n = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100
    ).count()
    assert n > 0
    assert calls == [], f"driver-side collection: {calls}"


@pytest.mark.parametrize("theta", [100, 60])
def test_lane_mode_equals_pair_mode(dist_index, theta):
    """Lane rows (one per (source, reduce bucket), carrying every query's
    packed mask) must reduce to exactly the per-pair protocol's hits —
    including queries never constrained for a source, which the pair
    protocol drops and the lane protocol must clear via the missing-shard
    correction."""
    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=20, n_negative=20)
    pair = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=theta, lane_mode=False
    ).to_pandas()
    lane = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=theta, lane_mode=True
    ).to_pandas()
    assert _norm(lane).equals(_norm(pair))
    assert len(lane) > 0


def test_lane_mode_theta_compat_reference(dist_index):
    """The reference's float threshold form must flow through the lane
    reduce's vectorized min_windows call identically."""
    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=15, n_negative=10)
    ref = query_pipe.query_table(
        idx, queries, theta=57, theta_compat="reference"
    ).to_pandas()
    lane = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=57, theta_compat="reference", lane_mode=True
    ).to_pandas()
    assert _norm(lane).equals(_norm(ref))


def test_distributed_missing_shard_semantics(ray_session, tmp_path_factory):
    """A source whose bank lacks a probed shard must NOT vacuously match
    (one-doc sources make sparse shard coverage likely)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    root = tmp_path_factory.mktemp("dsparse")
    rng = np.random.default_rng(3)
    docs = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "tokens": pa.array(
                [rng.integers(0, 100, size=8, dtype=np.int32)
                 for _ in range(6)],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([8] * 6, pa.int32()),
            "source": [f"s{i}" for i in range(6)],
        }
    )
    idx = str(root / "idx")
    build_pipe.build_index(rd.from_arrow(docs), CFG, idx)
    queries = pa.table(
        {"query_id": ["q0"],
         "tokens": pa.array([docs["tokens"][0].as_py()], pa.list_(pa.int32()))}
    )
    broadcast = query_pipe.query_table(idx, queries, theta=100).to_pandas()
    dist = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100
    ).to_pandas()
    assert _norm(dist).equals(_norm(broadcast))
    assert "s0" in set(dist["source"])
    # the lane protocol relies on the correction to clear vacuous template
    # regions — this sparse-shard fixture is its adversarial case
    lane = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100, lane_mode=True
    ).to_pandas()
    assert _norm(lane).equals(_norm(broadcast))


def test_distributed_source_restricted_and_probeset_reuse(
    dist_index, tmp_path_factory
):
    """sources= prunes to the target source's hits; a prepared probeset dir
    is reused verbatim on a second call (no re-prep)."""
    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=10, n_negative=5)
    full = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100
    ).to_pandas()
    assert len(full) > 0
    target = sorted(full["source"])[0]
    pdir = str(tmp_path_factory.mktemp("pset") / "probeset")
    restricted = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100, sources=[target], probeset_dir=pdir
    ).to_pandas()
    assert _norm(restricted).equals(_norm(full[full["source"] == target]))
    # lane rows cover every query of a bucket but only the sources the
    # pruned read produced — restriction must hold in lane mode too
    lane_restricted = query_pipe.query_index_streaming_distributed(
        idx, queries, theta=100, sources=[target], lane_mode=True
    ).to_pandas()
    assert _norm(lane_restricted).equals(_norm(restricted))
    # second call with the same probeset_dir must not re-run prep
    import metaprofi_ray.stages.probe_distributed as pdist

    orig = pdist.prep_probe_batch
    try:
        def boom(*a, **k):
            raise AssertionError("probeset re-prepared despite reuse dir")

        pdist.prep_probe_batch = boom
        again = query_pipe.query_index_streaming_distributed(
            idx, queries, theta=100, sources=[target], probeset_dir=pdir
        ).to_pandas()
    finally:
        pdist.prep_probe_batch = orig
    assert _norm(again).equals(_norm(restricted))


def test_distributed_query_survives_worker_crash(dist_index, tmp_path):
    """A probe worker dying mid-run (os._exit, the real crash path — not
    a Python exception) must be retried by Ray with identical results:
    probe tasks are pure functions of (bank block, plasma-shared plan),
    so retries are safe by construction.  The build side has the same
    evidence via checkpoint kill+resume; this pins the query side."""
    import os

    import metaprofi_ray.stages.probe_distributed as pdist
    from metaprofi_ray.pipelines import query as query_pipe

    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=15, n_negative=10)
    baseline = query_pipe.query_table(idx, queries, theta=75).to_pandas()

    marker = str(tmp_path / "crashed_once")
    orig = pdist.probe_any_batch

    def crash_once_then_probe(batch, **kw):
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)  # simulate worker death, not a UDF exception
        return orig(batch, **kw)

    # query.py resolves probe_any_batch from the module at call time, and
    # the local wrapper is cloudpickled BY VALUE into the task, so the
    # patched driver-side attribute is what workers execute
    pdist.probe_any_batch = crash_once_then_probe
    try:
        hits = query_pipe.query_index_streaming_distributed(
            idx, queries, theta=75
        ).to_pandas()
    finally:
        pdist.probe_any_batch = orig
    assert os.path.exists(marker), "crash never fired; test is vacuous"
    assert _norm(hits).equals(_norm(baseline))


def test_probeset_sweep_age_policy(tmp_path):
    """Anonymous probeset dirs older than the TTL are swept; fresh and
    caller-named dirs survive (TODO r4: probeset lifecycle)."""
    import os
    import shutil
    import time as _time

    old = "/tmp/metaprofi_probeset_eeeeeeeeeeee"
    fresh = "/tmp/metaprofi_probeset_ffffffffffff"
    named = "/tmp/metaprofi_probeset_named_keep"
    for d in (old, fresh, named):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    try:
        past = _time.time() - 7200
        os.utime(old, (past, past))
        query_pipe._sweep_stale_probesets(ttl_sec=3600)
        assert not os.path.isdir(old)
        assert os.path.isdir(fresh)
        assert os.path.isdir(named)
    finally:
        for d in (old, fresh, named):
            shutil.rmtree(d, ignore_errors=True)


def test_probeset_rewritten_at_same_path_not_served_stale(
    dist_index, tmp_path_factory
):
    """A probeset REWRITTEN at the same caller-supplied path must not be
    served from a warm worker's plan/layout memo: panel B after panel A
    at the same dir must equal panel B at a fresh dir."""
    import os
    import shutil
    import time as _time

    corpus, idx = dist_index
    panel_a = make_queries(corpus, CFG.k, n_exact=6, n_negative=2)
    panel_b = make_queries(corpus, CFG.k, n_exact=14, n_negative=6)
    pdir = str(tmp_path_factory.mktemp("pstale") / "probeset")
    query_pipe.query_index_streaming_distributed(
        idx, panel_a, theta=100, probeset_dir=pdir
    ).to_pandas()  # warms worker memos with panel A's layout
    shutil.rmtree(pdir)
    _time.sleep(0.05)  # ensure a distinct dir mtime for the rewrite
    got = query_pipe.query_index_streaming_distributed(
        idx, panel_b, theta=100, probeset_dir=pdir
    ).to_pandas()
    want = query_pipe.query_index_streaming_distributed(
        idx, panel_b, theta=100
    ).to_pandas()
    assert _norm(got).equals(_norm(want))
    assert len(want) > 0


def test_plan_refs_memoized_per_probeset_version(
    dist_index, tmp_path_factory
):
    """build_plan_refs returns the SAME plasma refs for a reused probeset
    (same dir + content version) and FRESH refs after a rewrite — repeat
    queries against a reused panel must skip the plan-build wave without
    ever serving a stale layout."""
    import os
    import shutil
    import time as _time

    from metaprofi_ray.sources import io as bank_io
    from metaprofi_ray.stages import probe_distributed as pdmod

    corpus, idx = dist_index
    cfg, _ = bank_io.read_manifest(idx)
    nsb = bank_io.shard_bucket_count(idx) or 1
    panel = make_queries(corpus, CFG.k, n_exact=4, n_negative=2)
    pdir = str(tmp_path_factory.mktemp("pmemo") / "probeset")
    query_pipe.query_index_streaming_distributed(
        idx, panel, theta=100, probeset_dir=pdir
    ).to_pandas()
    first = pdmod.build_plan_refs(pdir, nsb, cfg)
    again = pdmod.build_plan_refs(pdir, nsb, cfg)
    assert {s: r.binary() for s, r in first.items()} == {
        s: r.binary() for s, r in again.items()
    }
    shutil.rmtree(pdir)
    _time.sleep(0.05)
    query_pipe.query_index_streaming_distributed(
        idx, panel, theta=100, probeset_dir=pdir
    ).to_pandas()  # rewrite at the same path -> new content version
    fresh = pdmod.build_plan_refs(pdir, nsb, cfg)
    assert {s: r.binary() for s, r in first.items()} != {
        s: r.binary() for s, r in fresh.items()
    }


def test_legacy_wide_probeset_still_decodes(
    dist_index, tmp_path_factory, monkeypatch
):
    """Probeset entry/constraint blobs are self-describing (itemsize is
    re-derived from the 4 B/entry win blob), so a probeset persisted by an
    older build with 8-byte shard/local payloads must decode and reduce
    identically to the current narrow format."""
    import ray.data as rd

    from metaprofi_ray.sources import io as bank_io
    from metaprofi_ray.stages import probe_distributed as pdmod

    corpus, idx = dist_index
    queries = make_queries(corpus, CFG.k, n_exact=15, n_negative=10)
    cfg, _ = bank_io.read_manifest(idx)
    nsb = bank_io.shard_bucket_count(idx) or 1

    # write the probeset the way a legacy (pre-narrow-width) build did:
    # every payload 8 bytes per entry
    monkeypatch.setattr(pdmod, "_entry_widths", lambda _cfg: ("<i8", "<i8"))
    legacy = pdmod.prep_probe_batch(queries, cfg, nsb)
    monkeypatch.undo()
    assert legacy.num_rows > 0
    pdir = str(tmp_path_factory.mktemp("plegacy") / "probeset")
    rd.from_arrow(legacy).write_parquet(pdir, partition_cols=["sb"])

    expect = query_pipe.query_table(idx, queries, theta=60).to_pandas()
    for lane in (False, True):
        got = query_pipe.query_index_streaming_distributed(
            idx, queries, theta=60, probeset_dir=pdir, lane_mode=lane
        ).to_pandas()
        assert _norm(got).equals(_norm(expect)), f"lane_mode={lane}"


def test_fresh_probeset_uses_narrow_widths():
    """A config whose shard count / shard bits fit in i32 must produce
    4 B/entry shard+local payloads (the e_win blob is 4 B/entry always,
    e_qh 8 B/entry)."""
    import numpy as np
    import pyarrow as pa

    from metaprofi_ray.stages import probe_distributed as pdmod

    rng = np.random.default_rng(3)
    qt = pa.table(
        {
            "query_id": [f"q{i}" for i in range(10)],
            "tokens": pa.array(
                list(rng.integers(0, 1000, size=(10, 12), dtype=np.int32)),
                type=pa.list_(pa.int32()),
            ),
        }
    )
    t = pdmod.prep_probe_batch(qt, CFG, nsb=2)
    ent = t.filter(pa.compute.field("sb") >= 0)
    e_shard = sum(len(v.as_py()) for v in ent["e_shard"])
    e_win = sum(len(v.as_py()) for v in ent["e_win"])
    assert e_win > 0 and e_shard * 4 == e_win * 4  # 4 B/entry each
    meta = t.filter(pa.compute.field("sb") == -1)
    c_shard = sum(len(v.as_py()) for v in meta["c_shard"])
    c_win = sum(len(v.as_py()) for v in meta["c_win"])
    assert c_win > 0 and c_shard == c_win  # both 4 B/entry
