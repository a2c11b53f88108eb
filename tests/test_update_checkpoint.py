"""Update/append, checkpoint/resume equivalence, summary, CLI smoke.

Mirrors SURVEY.md §5(d): resume-from-checkpoint must yield an index
equivalent to a direct build (byte-identical Bloom/HLL/CMS state)."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.pipelines import build as build_pipe
from metaprofi_ray.pipelines import query as query_pipe
from metaprofi_ray.pipelines.summary import format_summary, index_summary
from metaprofi_ray.pipelines.update import update_from_parquet
from metaprofi_ray.sources.io import BankIndex
from metaprofi_ray.sources.synth import generate_corpus
from metaprofi_ray.state.checkpoint import build_with_checkpoints

CFG = SketchConfig(k=8, h=2, m=1 << 16, shards=4)


def _bank_state(index_dir):
    """Comparable deterministic state: bloom matrices + per-source counters
    + hll/cms bytes (t-digest/KLL excluded — merge-order dependent)."""
    idx = BankIndex.load(index_dir)
    banks = pq.read_table(os.path.join(index_dir, "banks"))
    stats = banks.filter(pq.compute.equal(banks["shard_id"], -1)) if hasattr(pq, "compute") else None
    import pyarrow.compute as pc

    stats = banks.filter(pc.equal(banks["shard_id"], -1))
    order = pc.sort_indices(stats["source"])
    stats = stats.take(order)
    return (
        {sid: m.tobytes() for sid, m in sorted(idx.matrices.items())},
        stats["source"].to_pylist(),
        stats["n_docs"].to_pylist(),
        stats["n_wins"].to_pylist(),
        [b.as_py() for b in stats["hll"]],
        [b.as_py() for b in stats["cms"]],
    )


@pytest.fixture(scope="module")
def split_corpora(tmp_path_factory):
    """Two disjoint corpora: 'old' sources src0x, 'new' adds overlap + new."""
    root = tmp_path_factory.mktemp("upd")
    old = generate_corpus(str(root / "old"), n_sources=5, docs_total=400, k=8)
    new = generate_corpus(
        str(root / "new"), n_sources=3, docs_total=200, k=8, base_seed=777
    )
    return old, new


class TestUpdate:
    def test_update_equals_joint_build(self, ray_session, split_corpora, tmp_path_factory):
        old, new = split_corpora
        root = tmp_path_factory.mktemp("idx")
        a = str(root / "a")
        build_pipe.build_from_parquet(sorted(glob.glob(old + "/*.parquet")), CFG, a)
        b = str(root / "b")
        update_from_parquet(a, sorted(glob.glob(new + "/*.parquet")), b)
        joint = str(root / "joint")
        build_pipe.build_from_parquet(
            sorted(glob.glob(old + "/*.parquet")) + sorted(glob.glob(new + "/*.parquet")),
            CFG, joint,
        )
        assert _bank_state(b) == _bank_state(joint)
        assert index_summary(b)["updated_from"] == os.path.abspath(a)

    def test_update_refuses_in_place_and_config_change(self, ray_session, split_corpora, tmp_path_factory):
        old, new = split_corpora
        root = tmp_path_factory.mktemp("idx2")
        a = str(root / "a")
        build_pipe.build_from_parquet(sorted(glob.glob(old + "/*.parquet")), CFG, a)
        with pytest.raises(ValueError):
            update_from_parquet(a, new, a)
        from metaprofi_ray.pipelines.update import update_index

        with pytest.raises(ValueError):
            update_index(a, build_pipe.read_tokens(new), str(root / "c"),
                         cfg=SketchConfig(k=9))

    def test_update_idempotent_for_duplicate_data(self, ray_session, split_corpora, tmp_path_factory):
        """Re-adding the same rows must not change the Bloom banks (OR is
        idempotent); counters grow, bits do not."""
        old, _ = split_corpora
        root = tmp_path_factory.mktemp("idx3")
        a = str(root / "a")
        files = sorted(glob.glob(old + "/*.parquet"))
        build_pipe.build_from_parquet(files, CFG, a)
        b = str(root / "b")
        update_from_parquet(a, files, b)
        sa, sb = _bank_state(a), _bank_state(b)
        assert sa[0] == sb[0]  # identical bloom matrices
        assert sb[2] == [2 * x for x in sa[2]]  # n_docs doubled


class TestRemoveSources:
    def test_removal_equals_fresh_build(self, ray_session, split_corpora,
                                        tmp_path_factory):
        """remove_sources == a fresh build without those sources
        (byte-identical Bloom/HLL/CMS state), and untouched srcbucket dirs
        are HARDLINKED, not rewritten."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from metaprofi_ray.pipelines.update import remove_sources
        from metaprofi_ray.sources.io import src_bucket

        old, _ = split_corpora
        root = tmp_path_factory.mktemp("rm")
        full = str(root / "full")
        files = sorted(glob.glob(old + "/*.parquet"))
        build_pipe.build_from_parquet(files, CFG, full)
        removed = ["src01", "src03"]
        slim = remove_sources(full, removed, str(root / "slim"))

        drop = pa.array(removed, pa.string())
        fresh = build_pipe.build_index(
            build_pipe.read_tokens(files).map_batches(
                lambda t: t.filter(
                    pc.invert(pc.is_in(t["source"], value_set=drop))
                ),
                batch_format="pyarrow",
            ),
            CFG, str(root / "fresh"),
        )
        assert _bank_state(slim) == _bank_state(fresh)
        assert set(
            json.load(open(os.path.join(slim, "manifest.json")))
            ["removed_sources"]
        ) == set(removed)

        # untouched buckets share inodes with the original index
        _, doc = __import__(
            "metaprofi_ray.sources.io", fromlist=["read_manifest"]
        ).read_manifest(full)
        n = int(doc["src_buckets"])
        affected = {src_bucket(s, n) for s in removed}
        kept_srcs = [f"src{i:02d}" for i in range(5) if f"src{i:02d}" not in removed]
        untouched = [
            s for s in kept_srcs if src_bucket(s, n) not in affected
        ]
        assert untouched, "fixture must leave at least one untouched bucket"
        b = src_bucket(untouched[0], n)
        olds = sorted(glob.glob(
            os.path.join(full, "banks", f"srcbucket={b}", "**", "*.parquet"),
            recursive=True,
        ))
        news = sorted(glob.glob(
            os.path.join(slim, "banks", f"srcbucket={b}", "**", "*.parquet"),
            recursive=True,
        ))
        assert olds and [os.stat(f).st_ino for f in olds] == [
            os.stat(f).st_ino for f in news
        ]
        # removed sources answer no queries; kept sources still hit
        from metaprofi_ray.sources.synth import make_queries

        q = make_queries(old, CFG.k, n_exact=10, n_negative=0)
        hits = query_pipe.query_table(slim, q, theta=100).to_pandas()
        assert set(hits["source"]) <= set(kept_srcs)
        full_hits = query_pipe.query_table(full, q, theta=100).to_pandas()
        kept_full = full_hits[~full_hits["source"].isin(removed)]
        assert len(hits) == len(kept_full)

    def test_removal_refuses_bad_input(self, ray_session, split_corpora,
                                       tmp_path_factory):
        from metaprofi_ray.pipelines.update import remove_sources

        old, _ = split_corpora
        root = tmp_path_factory.mktemp("rm2")
        full = str(root / "full")
        build_pipe.build_from_parquet(
            sorted(glob.glob(old + "/*.parquet")), CFG, full
        )
        with pytest.raises(ValueError):
            remove_sources(full, ["nope"], str(root / "x"))
        with pytest.raises(ValueError):
            remove_sources(
                full, [f"src{i:02d}" for i in range(5)], str(root / "y")
            )
        with pytest.raises(ValueError):
            remove_sources(full, ["src01"], full)
        # CLI face
        from metaprofi_ray.cli import main as cli_main

        out = str(root / "cli_out")
        assert cli_main(["remove", full, "src01", out]) in (0, None)
        assert os.path.exists(os.path.join(out, "manifest.json"))


class TestCheckpoint:
    def test_checkpointed_equals_direct(self, ray_session, corpus_dir, tmp_path_factory):
        root = tmp_path_factory.mktemp("ck")
        files = sorted(glob.glob(corpus_dir + "/*.parquet"))
        direct = str(root / "direct")
        build_pipe.build_from_parquet(files, CFG, direct)
        ck = str(root / "ck")
        rep = build_with_checkpoints(files, CFG, ck, n_partitions=3)
        assert rep["built"] == 3 and rep["resumed"] == 0
        assert _bank_state(ck) == _bank_state(direct)

    def test_resume_skips_done_partitions(self, ray_session, corpus_dir, tmp_path_factory):
        root = tmp_path_factory.mktemp("ck2")
        files = sorted(glob.glob(corpus_dir + "/*.parquet"))
        ck = str(root / "ck")
        build_with_checkpoints(files, CFG, ck, n_partitions=4)
        before = _bank_state(ck)
        # simulate a crash: destroy one partition + the final banks
        shutil.rmtree(os.path.join(ck, "_ckpt", "partition=00002"))
        shutil.rmtree(os.path.join(ck, "banks"))
        rep = build_with_checkpoints(files, CFG, ck, n_partitions=4)
        assert rep["resumed"] == 3 and rep["built"] == 1
        assert _bank_state(ck) == before

    def test_config_change_invalidates_checkpoints(self, ray_session, corpus_dir, tmp_path_factory):
        root = tmp_path_factory.mktemp("ck3")
        files = sorted(glob.glob(corpus_dir + "/*.parquet"))
        ck = str(root / "ck")
        build_with_checkpoints(files, CFG, ck, n_partitions=2)
        rep = build_with_checkpoints(
            files, SketchConfig(k=8, h=3, m=1 << 16, shards=4), ck, n_partitions=2
        )
        assert rep["built"] == 2 and rep["resumed"] == 0

    def test_lineage_recorded(self, ray_session, corpus_dir, tmp_path_factory):
        root = tmp_path_factory.mktemp("ck4")
        files = sorted(glob.glob(corpus_dir + "/*.parquet"))
        ck = str(root / "ck")
        build_with_checkpoints(files, CFG, ck, n_partitions=2)
        with open(os.path.join(ck, "_ckpt", "partition=00000", "manifest.json")) as f:
            doc = json.load(f)
        assert set(doc["files"]).issubset(set(files))
        assert doc["n_docs"] > 0 and doc["wall_sec"] >= 0
        assert doc["config"] == json.loads(CFG.to_json())


class TestSummaryAndCli:
    def test_summary(self, ray_session, corpus_dir, tmp_path_factory):
        root = tmp_path_factory.mktemp("sm")
        idx = str(root / "idx")
        build_pipe.build_from_parquet(
            sorted(glob.glob(corpus_dir + "/*.parquet")), CFG, idx
        )
        s = index_summary(idx)
        assert s["n_sources"] == 8 and s["n_docs"] > 0
        assert "n_windows" in format_summary(idx)

    def test_cli_search_and_summary(self, ray_session, corpus_dir, tmp_path_factory, capsys):
        from metaprofi_ray.cli import main as cli_main
        from metaprofi_ray.sources.synth import make_queries

        root = tmp_path_factory.mktemp("cli")
        idx = str(root / "idx")
        build_pipe.build_from_parquet(
            sorted(glob.glob(corpus_dir + "/*.parquet")), CFG, idx
        )
        qpath = str(root / "q.parquet")
        pq.write_table(make_queries(corpus_dir, CFG.k, n_exact=5, n_negative=5), qpath)
        assert cli_main(["search", idx, qpath, "--theta", "75"]) == 0
        out = capsys.readouterr().out
        assert "Query:" in out
        assert cli_main(["summary", idx]) == 0
        assert "n_sources" in capsys.readouterr().out


class TestBuildSeq:
    def test_sequence_level_one_bank_per_doc(self, ray_session, corpus_dir, tmp_path_factory):
        """build-seq analogue (zarrstore_seq.py semantics): every doc is its
        own sample; querying a doc's own window hits exactly that doc-bank
        (plus Bloom false positives)."""
        import glob as _glob

        import numpy as np
        import pyarrow as pa

        from metaprofi_ray.pipelines.build import build_seq_from_parquet
        from metaprofi_ray.pipelines.query import query_table

        root = tmp_path_factory.mktemp("seq")
        idx = str(root / "idx")
        files = sorted(_glob.glob(corpus_dir + "/*.parquet"))
        build_seq_from_parquet(files, CFG, idx)
        summary = pq.read_table(idx + "/sources.parquet")
        t = pq.read_table(files, columns=["doc_id", "tokens", "n_tok"])
        n_long = sum(1 for n in t["n_tok"].to_pylist() if n >= CFG.k)
        assert summary.num_rows == n_long  # one bank per surviving doc
        # self-query: first long doc
        for row in range(t.num_rows):
            if t["n_tok"][row].as_py() >= CFG.k:
                doc = t["doc_id"][row].as_py()
                toks = np.asarray(t["tokens"][row].as_py(), dtype=np.int32)
                break
        q = pa.table({"query_id": ["self"],
                      "tokens": pa.array([toks[: CFG.k]], pa.list_(pa.int32()))})
        hits = query_table(idx, q, theta=100)
        assert doc in set(hits["source"].to_pylist())


class TestSaltedMerge:
    def test_two_level_merge_equals_single_level(self, ray_session, corpus_dir, tmp_path_factory):
        """Skew path: salted (source, shard, salt) pre-merge then final
        merge must be byte-identical to the direct merge (associativity)."""
        import glob as _glob

        root = tmp_path_factory.mktemp("salt")
        files = sorted(_glob.glob(corpus_dir + "/*.parquet"))
        a = str(root / "a")
        build_pipe.build_index(build_pipe.read_tokens(files), CFG, a)
        b = str(root / "b")
        build_pipe.build_index(build_pipe.read_tokens(files), CFG, b, salt_buckets=4)
        assert _bank_state(a) == _bank_state(b)


class TestAtomicPublish:
    """The manifest is the validity marker: at every instant of a re-build
    the index is either valid-and-complete or visibly absent — a crash
    window must never serve stale banks as current."""

    def test_load_refuses_unmarked_index(self, ray_session, tmp_path):
        import glob
        import os

        import pytest

        from metaprofi_ray import SketchConfig
        from metaprofi_ray.pipelines.build import build_from_parquet
        from metaprofi_ray.sources.io import BankIndex
        from metaprofi_ray.sources.synth import generate_corpus

        corpus = generate_corpus(
            str(tmp_path / "c"), n_sources=3, docs_total=200, k=8
        )
        idx = str(tmp_path / "idx")
        build_from_parquet(
            sorted(glob.glob(corpus + "/*.parquet")),
            SketchConfig(k=8, h=2, m=1 << 15, shards=2),
            idx,
        )
        assert BankIndex.load(idx)
        # simulate the crash window: marker removed, banks still on disk
        os.remove(os.path.join(idx, "manifest.json"))
        BankIndex._memo.clear()
        with pytest.raises(FileNotFoundError):
            BankIndex.load(idx)
