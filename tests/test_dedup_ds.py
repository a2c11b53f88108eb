"""The dedup ladder must be Dataset-native end-to-end (VERDICT r2 #1,
r3 #3): no stage of the pair pipelines may collect the pair list (or
anything bigger) to the driver.  We spy on ``Dataset.to_pandas`` and
assert ZERO driver-side collections — since round 4 even the n-gram
verifier's candidate ids move as a bucketed semi-join, not a collected
set."""

import ray.data as rd

from metaprofi_ray.pipelines import dedup

SF = "/root/testdata/sf0.001"


def _spy(monkeypatch):
    calls: list[tuple[int, list[str]]] = []
    orig = rd.Dataset.to_pandas

    def wrapper(self, *a, **k):
        out = orig(self, *a, **k)
        calls.append((len(out), list(out.columns)))
        return out

    monkeypatch.setattr(rd.Dataset, "to_pandas", wrapper)
    return calls


def test_pair_datasets_collect_nothing(ray_session, monkeypatch):
    calls = _spy(monkeypatch)
    n = dedup.minhash_lsh_pairs_ds(SF).count()
    assert n > 0
    m = dedup.simhash_pairs_ds(SF).count()
    assert m >= 0
    e = dedup.embedding_neardup_pairs_lsh_ds(SF).count()
    assert e >= 0
    assert calls == [], f"driver-side collection in pair pipelines: {calls}"


def test_ngram_verify_collects_nothing(ray_session, monkeypatch):
    calls = _spy(monkeypatch)
    n = dedup.ngram_jaccard_pairs_ds(SF, threshold=0.5).count()
    assert n > 0
    assert calls == [], f"driver-side collection during ngram verify: {calls}"


def test_pair_memo_returns_copies(ray_session):
    """The process-level pair memo must hand out COPIES — a caller mutating
    its result must not corrupt later calls (the check faces share these)."""
    a = dedup.minhash_lsh_pairs(SF)
    if len(a):
        a["est_jaccard"] = -1.0
    b = dedup.minhash_lsh_pairs(SF)
    assert len(b) == len(a)
    if len(b):
        assert (b["est_jaccard"] >= 0).all()


def test_exact_pair_artifact_cached_and_consistent(ray_session, monkeypatch):
    """The shared exact-pair artifact computes its LSH pass ONCE per corpus:
    after the first call the table is served from disk — a second call must
    not touch the Dataset pipeline at all — and the thresholded face equals
    the Dataset face's output."""
    import pandas as pd

    first = dedup.exact_pair_table(SF)
    assert {"doc_a", "doc_b", "jaccard", "jaccard_raw"} <= set(first.columns)

    def boom(*a, **k):
        raise AssertionError("artifact miss: recomputed the LSH pass")

    monkeypatch.setattr(dedup, "ngram_jaccard_pairs_ds", boom)
    second = dedup.exact_pair_table(SF)
    pd.testing.assert_frame_equal(first, second)
    monkeypatch.undo()

    face = dedup.ngram_jaccard_pairs(SF, threshold=0.8)
    ds_face = dedup._collect_pairs(
        dedup.ngram_jaccard_pairs_ds(SF, threshold=0.8),
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"},
    )
    pd.testing.assert_frame_equal(face, ds_face)


def test_dedupe_pairs_bucketed_matches_pandas(ray_session):
    """The coarse-bucket lexsort+reduceat pair dedupe equals a direct
    groupby-max/min on a duplicate-heavy random pair list (every pair
    surfaced by ~4 bands on average, values shuffled)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_pairs, n_rows = 500, 2000
    a = rng.integers(0, 100, n_pairs).astype(np.int64)
    b = a + 1 + rng.integers(0, 100, n_pairs).astype(np.int64)
    pick = rng.integers(0, n_pairs, n_rows)
    df = pd.DataFrame(
        {
            "doc_a": a[pick],
            "doc_b": b[pick],
            "est_jaccard": rng.random(n_rows).round(6),
        }
    )
    for how, agg in (("max", "max"), ("min", "min")):
        got = (
            dedup._dedupe_pairs(
                rd.from_pandas(df), ("doc_a", "doc_b"), "est_jaccard", how
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        want = (
            df.groupby(["doc_a", "doc_b"], as_index=False)["est_jaccard"]
            .agg(agg)
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_a", "doc_b", "est_jaccard"]], want, check_dtype=False
        )
