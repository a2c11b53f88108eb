"""Parity tests for the vectorized word interning (functions/wordids.py):
output must equal the naive ``str.split()`` + per-word hash loop it replaced
(the round-1 Tokenizer/MinHashSigner implementation)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from metaprofi_ray.functions import wordids
from metaprofi_ray.pipelines.dedup import MinHashSigner
from metaprofi_ray.pipelines.flagship import Tokenizer
from metaprofi_ray.sources.synth import VOCAB, stable_hash

ADVERSARIAL = [
    "hello world",
    "  leading",
    "trailing   ",
    "",
    "   ",
    "a  b\tc\nd",
    "one",
    "  both  sides  ",
    "repeat repeat repeat",
    "tab\t\ttab",
]


def naive_ids(text: str, vocab: int = VOCAB) -> list[int]:
    return [stable_hash(w) % vocab for w in text.split()]


def test_split_intern_matches_str_split():
    flat, row_of, n = wordids.split_words(pa.array(ADVERSARIAL))
    ids, rows, lens = wordids.intern_ids(
        flat, row_of, n, lambda w: stable_hash(w) % VOCAB, dtype=np.int32
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    for r, text in enumerate(ADVERSARIAL):
        got = ids[offsets[r] : offsets[r + 1]].tolist()
        assert got == naive_ids(text), text


def test_split_words_lower():
    texts = ["MiXeD Case WORDS", "  UPPER  "]
    flat, row_of, n = wordids.split_words(pa.array(texts), lower=True)
    ids, rows, lens = wordids.intern_ids(
        flat, row_of, n, lambda w: stable_hash(w), dtype=np.uint64
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    for r, text in enumerate(texts):
        expect = [stable_hash(w) for w in text.lower().split()]
        assert ids[offsets[r] : offsets[r + 1]].tolist() == expect


def test_tokenizer_batch_matches_naive():
    batch = pa.table(
        {
            "doc_id": pa.array([3, 41, 500], pa.int64()),
            "text": pa.array(["alpha beta alpha", "", "  gamma  delta "]),
            "source": pa.array(["s1", "s2", "s1"]),
        }
    )
    out = Tokenizer()(batch)
    assert out["doc_id"].to_pylist() == ["doc00000003", "doc00000041", "doc00000500"]
    assert out["tokens"].to_pylist() == [
        naive_ids("alpha beta alpha"),
        [],
        naive_ids("gamma delta"),
    ]
    assert out["n_tok"].to_pylist() == [3, 0, 2]
    assert out["source"].to_pylist() == ["s1", "s2", "s1"]


def _naive_signature(text: str, signer: MinHashSigner) -> np.ndarray:
    """Round-1 reference implementation: per-word loop + explicit padding."""
    words = text.lower().split()
    ids = np.array(
        [
            int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=4).digest(),
                "little",
                signed=True,
            )
            for w in words
        ],
        dtype=np.int32,
    )
    n = signer.shingle_n
    if ids.size < n:
        ids = np.pad(ids, (0, n - ids.size))
    from metaprofi_ray.sketches import hashing

    offsets = np.array([0, ids.size], dtype=np.int64)
    starts, _ = hashing.window_starts(offsets, n)
    h = hashing.hash_windows(ids, starts, n, hashing.SEED_H1)
    vals = signer.a[:, None] * h[None, :] + signer.b[:, None]
    return vals.min(axis=1)


def test_minhash_signer_matches_naive():
    signer = MinHashSigner(n_perm=16, shingle_n=3)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "",
        "one two",
        "the quick brown fox jumps over the lazy cat",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = MinHashSigner(n_perm=16, shingle_n=3)(df)
    for i, t in enumerate(texts):
        expect = _naive_signature(t, signer)
        got = np.asarray(out["sig"].iloc[i], dtype=np.uint64)
        np.testing.assert_array_equal(got, expect, err_msg=t)


# ---------------------------------------------------------------- property
from hypothesis import given, settings
from hypothesis import strategies as st

# whitespace-heavy alphabet to stress the empty-token masking
_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab \t\n\r\x0b\x0c")), max_size=30
    ),
    min_size=0,
    max_size=8,
)


@given(_texts)
@settings(max_examples=150, deadline=None)
def test_split_intern_property(texts):
    flat, row_of, n = wordids.split_words(pa.array(texts, type=pa.string()))
    ids, rows, lens = wordids.intern_ids(
        flat, row_of, n, lambda w: stable_hash(w) % VOCAB, dtype=np.int32
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    for r, text in enumerate(texts):
        got = ids[offsets[r] : offsets[r + 1]].tolist()
        assert got == naive_ids(text), repr(text)
