"""Bucketed-LSH embedding near-dup (the no-broadcast scale path) vs the
exact broadcast variant: precision must be 1.0 (pairs verify with exact
cosine in-bucket); recall follows the 1-(1-p^b)^T curve and is bounded
below here on the hardest case (random embeddings, loose threshold)."""

from metaprofi_ray.pipelines import dedup

SF = "/root/testdata/sf0.001"


def test_lsh_neardup_precision_and_recall(ray_session):
    exact = dedup.embedding_neardup_pairs(SF).to_pandas()
    lsh = dedup.embedding_neardup_pairs_lsh(SF)
    pe = set(zip(exact["vec_a"], exact["vec_b"]))
    pl = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert pl <= pe, "LSH returned a pair the exact scan rejects"
    recall = len(pe & pl) / max(len(pe), 1)
    assert recall >= 0.6, f"recall {recall}"
    # values must agree with the exact variant on the common pairs
    e = exact.set_index(["vec_a", "vec_b"])["cosine"]
    l = lsh.set_index(["vec_a", "vec_b"])["cosine"]
    common = l.index.intersection(e.index)
    assert (l.loc[common] == e.loc[common]).all()
