"""Text-analysis operators over the ``documents`` table — the training-data
pipeline staples: token counting, quality scoring, language ID, document
fingerprinting.  All run as vectorized ``map_batches`` stages; the stateful
ones (compiled regexes, stopword tables) are actor-pool callables with the
state built once in ``__init__``.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd

import ray.data as rd

U64 = np.uint64
_FP_BASE = U64(1099511628211)  # FNV prime as rolling-hash base


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per document (matches DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` on non-empty text)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tokens"] = df["text"].str.split().str.len().astype("int64")
        return df[["doc_id", "n_tokens"]]

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


class BpeTokenCounter:
    """BPE-style pre-tokenizer count per document: letter runs, digit runs,
    and punctuation runs each count as one token (the GPT-2-family
    pre-tokenization shape, restricted to a regex dialect Python ``re`` and
    DuckDB's RE2 interpret identically — no \\p classes, no lookarounds).
    Compiled once per actor."""

    def __init__(self):
        self.pat = re.compile(BPE_PRETOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "n_bpe_tokens": df["text"].str.count(self.pat).astype("int64").values,
            }
        )


def token_counts_bpe(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        BpeTokenCounter, batch_format="pandas", concurrency=(1, 4)
    )


class QualityScorer:
    """Per-doc quality heuristics: alpha ratio, digit ratio, mean word
    length, stopword ratio.  Fully vectorized (Arrow split + bincount; no
    per-row Python) and DuckDB-oracle-exact: every ratio is the identical
    IEEE division on both sides, rounded half-away-from-zero.

    ``mean_word_len`` uses the identity sum(len(w) for w in words) =
    count of non-whitespace chars, so no per-word pass is needed."""

    STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "for", "on")

    def __init__(self):
        self.alpha = re.compile(r"[A-Za-z]")
        self.digit = re.compile(r"[0-9]")
        self.nonws = re.compile(r"\S")
        import pyarrow as pa

        self.stop_arr = pa.array(self.STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.numeric import round_half_away
        from ..functions.wordids import split_words

        text = df["text"]
        n_chars = text.str.len().astype("int64").to_numpy()
        n_alpha = text.str.count(self.alpha).astype("int64").to_numpy()
        n_digit = text.str.count(self.digit).astype("int64").to_numpy()
        n_nonws = text.str.count(self.nonws).astype("int64").to_numpy()
        flat, row_of, n = split_words(pa.array(text, type=pa.string()), lower=True)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_words = np.bincount(row_of[nonempty], minlength=n).astype("int64")
        is_stop = pc.is_in(flat, value_set=self.stop_arr).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(row_of[is_stop & nonempty], minlength=n).astype(
            "int64"
        )
        nw = np.maximum(n_words, 1).astype("float64")
        nc = np.maximum(n_chars, 1).astype("float64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_words": n_words,
                "alpha_ratio": round_half_away(n_alpha / nc, 4),
                "digit_ratio": round_half_away(n_digit / nc, 4),
                "mean_word_len": round_half_away(n_nonws / nw, 4),
                "stopword_ratio": round_half_away(n_stop / nw, 4),
            }
        )


def quality_scores(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pandas", concurrency=(1, 4)
    )


class LangId:
    """Character-frequency language heuristic (n-gram-lite): scores each doc
    against per-language marker sets.  A deterministic, dependency-free
    classifier; accuracy vs the table's ``lang`` label is reported by
    tests, not assumed."""

    MARKERS = {
        "en": (" the ", " and ", " of ", " is ", " that "),
        "de": (" der ", " und ", " die ", " ist ", " das "),
        "fr": (" le ", " et ", " les ", " des ", " est "),
        "es": (" el ", " de la ", " los ", " que ", " es "),
    }

    def __init__(self):
        self.markers = {k: tuple(v) for k, v in self.MARKERS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        low = (" " + df["text"].str.lower() + " ").str.replace(
            r"\s+", " ", regex=True
        )
        scores = {
            lang: sum(low.str.count(re.escape(m)) for m in ms)
            for lang, ms in self.markers.items()
        }
        sdf = pd.DataFrame(scores)
        pred = sdf.idxmax(axis=1).where(sdf.max(axis=1) > 0, "unknown")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].values, "pred_lang": pred.values}
        )


def language_id(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=(1, 4)
    )


def _fp_batch(df: pd.DataFrame, window: int) -> np.ndarray:
    """Vectorized winnowing kernel for one batch: the Arrow string
    column's utf-8 data buffer is read zero-copy, all docs' gram hashes
    compute in one ``window``-step lane loop, and the strided minima /
    xor folds run as two ``reduceat`` passes — byte-identical to the
    per-doc formulation (short docs fall back to blake2b)."""
    import pyarrow as pa

    from ..sketches.hashing import window_starts

    n_docs = len(df)
    fps = np.empty(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return fps
    arr = pa.array(df["text"], type=pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n_docs + 1]
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    lens = np.diff(offs).astype(np.int64)
    starts, row_of = window_starts(offs, window)
    acc = np.zeros(starts.shape[0], dtype=np.uint64)
    for j in range(window):
        acc = acc * _FP_BASE + buf[starts + j].astype(np.uint64)
    long_docs = np.flatnonzero(lens >= window)
    if long_docs.size:
        seg = np.searchsorted(row_of, np.arange(n_docs + 1))
        n_wins = (seg[1:] - seg[:-1])[long_docs]
        n_groups = (n_wins + window - 1) // window
        cum = np.concatenate([[0], np.cumsum(n_groups)])
        intra = np.arange(int(cum[-1])) - np.repeat(cum[:-1], n_groups)
        grp_idx = np.repeat(seg[long_docs], n_groups) + intra * window
        mins = np.minimum.reduceat(acc, grp_idx)
        folds = np.bitwise_xor.reduceat(mins, cum[:-1])
        fps[long_docs] = folds
    for i in np.flatnonzero(lens < window):
        fps[i] = U64(int.from_bytes(
            hashlib.blake2b(
                df["text"].iloc[i].encode(), digest_size=8
            ).digest(), "little",
        ))
    return fps


def doc_fingerprints(sf_dir: str, window: int = 16) -> rd.Dataset:
    """Winnowing-style fingerprint: 64-bit rolling (polynomial) hash over
    bytes, minimum hash per ``window``-gram stride, xor-folded to one
    uint64 per document.  Deterministic; used for cheap near-identity
    bucketing upstream of heavier dedup.  Oracle face:
    ``fingerprint_check`` (the blake2b/rolling hashes themselves are not
    SQL-expressible, so the check pins the algebraic invariants instead)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].values,
                             "fingerprint": _fp_batch(df, window)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def _fp_naive(text: str, window: int) -> tuple[int, bool]:
    """Independent scalar formulation of the winnowing fingerprint,
    straight from the definition: per-gram polynomial hash, minimum per
    stride group, xor fold.  Returns (fingerprint, invariants_ok) where
    invariants_ok asserts the SUBSET property (every selected minimum is
    a member of the doc's gram-hash set) and full stride COVERAGE (every
    group of ``window`` consecutive gram positions contributes exactly
    one selection).  Used only by ``fingerprint_check`` — per-row Python
    is fine in a verification face; the production op is ``_fp_batch``."""
    b = text.encode("utf-8")
    if len(b) < window:
        return int.from_bytes(
            hashlib.blake2b(text.encode(), digest_size=8).digest(), "little"
        ), True
    mask = (1 << 64) - 1
    base = int(_FP_BASE)
    grams: list[int] = []
    for s in range(len(b) - window + 1):
        h = 0
        for j in range(window):
            h = (h * base + b[s + j]) & mask
        grams.append(h)
    gram_set = set(grams)
    mins = [min(grams[g : g + window]) for g in range(0, len(grams), window)]
    fp = 0
    for m in mins:
        fp ^= m
    n_groups_expected = (len(grams) + window - 1) // window
    ok = len(mins) == n_groups_expected and all(m in gram_set for m in mins)
    return fp, ok


def fingerprint_check(sf_dir: str, window: int = 16) -> pd.DataFrame:
    """Oracle face of ``doc_fingerprints`` (winnowing invariants, the
    ``*_check`` pattern of ``flagship.fpr_bound_check``): per doc,

    - ``n_grams``: the gram count ``max(utf8_bytes - window + 1, 0)`` —
      computed from the same byte buffers the fingerprint hashes and
      INDEPENDENTLY by the SQL oracle (``GREATEST(strlen(text)-15, 0)``),
      pinning the windowing arithmetic on real values, not just booleans;
    - ``fp_valid``: the distributed vectorized fingerprint equals an
      independent scalar recomputation AND the winnowing invariants hold
      (every selected minimum ∈ the doc's gram-hash set; every stride
      group of ``window`` gram positions contributes exactly one);
    - ``fp_consistent``: docs with byte-identical text have identical
      fingerprints (grouped on md5(text) — a key the oracle can also
      derive — and compared within each group).

    SQL asserts TRUE for the booleans; a FALSE here means the vectorized
    kernel and the definition diverged."""
    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        fps = _fp_batch(df, window)
        n_grams = np.empty(len(df), dtype=np.int64)
        valid = np.empty(len(df), dtype=bool)
        keys = []
        for i, t in enumerate(df["text"]):
            t = str(t)
            b = t.encode("utf-8")
            n_grams[i] = max(len(b) - window + 1, 0)
            naive, inv_ok = _fp_naive(t, window)
            valid[i] = inv_ok and naive == int(fps[i])
            keys.append(hashlib.md5(b).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "text_key": keys,
                "n_grams": n_grams,
                "fp_valid": valid,
                "fingerprint": fps,
            }
        )

    def per_text_group(g: pd.DataFrame) -> pd.DataFrame:
        consistent = g["fingerprint"].nunique() == 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_grams": g["n_grams"],
                "fp_valid": g["fp_valid"],
                "fp_consistent": consistent,
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(per_batch, batch_format="pandas")
        .groupby("text_key")
        .map_groups(per_text_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def documents_sample(sf_dir: str, pct: int = 10) -> rd.Dataset:
    """Deterministic content-keyed sampling: keep a doc iff
    ``int(md5(doc_id)[:4 hex], 16) % 100 < pct``.  Unlike seeded RNG
    sampling this is reproducible across any partitioning/parallelism AND
    expressible in SQL, so the driver can oracle-check it exactly."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.array(
            [
                int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 100 < pct
                for d in df["doc_id"]
            ],
            dtype=bool,
        )
        return df.loc[keep, ["doc_id", "source", "n_chars"]]

    return _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        f, batch_format="pandas"
    )


def token_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Exact corpus-wide token frequency top-k: per-batch token counting
    (the combiner) → groupby(token).sum → top-k with deterministic
    tie-break.  The exact counterpart of the CMS estimates (tests assert
    CMS >= exact on these heavy hitters)."""
    from ray.data.aggregate import Sum

    # NOTE on parity: texts in these corpora are ASCII-space separated; the
    # SQL oracle's regexp \s+ and Python str.split() agree on that domain
    # (they diverge on Unicode whitespace — documented convention).
    # Vectorized combiner: one Arrow split + dictionary-encode per batch,
    # counts via bincount over the dictionary indices — no Python Counter.
    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        from ..functions.wordids import word_counts

        tokens, counts = word_counts(pa.array(df["text"], type=pa.string()))
        return pd.DataFrame(
            {
                "token": pd.Series(
                    np.asarray(tokens.to_pandas(), dtype=object), dtype="str"
                ),
                "n": counts,
            }
        )

    from ..functions.hashagg import hash_aggregate, hash_path_pays_bytes

    raw = _docs(sf_dir, ["text"])
    partials = raw.map_batches(
        count_tokens, batch_format="pandas", batch_size=None
    )
    # byte gate, not row gate: reduce input is per-block vocab partials
    # (content-volume-bounded, like the BPE word table)
    if hash_path_pays_bytes(raw):
        # vocabulary-cardinality reduce: hash repartition + per-block
        # Arrow group_by (see functions/hashagg.py) — the native sort
        # aggregate pays ~100 µs of Python per distinct token
        from ..functions.hashagg import partitions_for

        agg = hash_aggregate(
            partials, ["token"], [("n", "sum", "n")],
            min_partitions=partitions_for(raw.size_bytes() // 24, 24),
        )
    else:
        agg = partials.groupby("token").aggregate(Sum("n", alias_name="n"))
    # distributed top-k: sort + limit keeps only k rows leaving the cluster
    top = (
        agg.sort(["n", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )
    top["n"] = top["n"].astype("int64")
    return top


def langid_accuracy(sf_dir: str) -> pd.DataFrame:
    """Predicted vs labeled language confusion summary (diagnostic)."""
    pred = language_id(sf_dir).to_pandas()
    truth = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    m = pred.merge(truth, on="doc_id")
    return (
        m.groupby(["lang", "pred_lang"]).size().reset_index(name="n")
        .sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    )


def contamination_check(
    sf_dir: str, n_probe_docs: int = 5, gram_n: int = 5,
    max_probes: int = 40,
) -> pd.DataFrame:
    """Test-set decontamination sweep: which corpus documents contain any
    of a probe set of benchmark n-grams?  The standard pre-training hygiene
    operator: probes broadcast (tiny side), the corpus streams, each batch
    runs vectorized whitespace-normalized substring matches.

    Probe set here is deterministic and SQL-reproducible — the first
    ``gram_n``-word-gram of each of the first ``n_probe_docs`` docs by
    doc_id (capped at ``max_probes``) — so the DuckDB oracle replays the
    exact same sweep.  Matching is on space-padded normalized text
    (``' ' + ' '.join(words) + ' '``), so grams only match at word
    boundaries.  Rows: ``(doc_id, n_probe_hits)`` for contaminated docs.
    At 100 TB the probe set would come from the eval suites; the corpus
    side is unchanged."""
    import ray

    # probe selection is a distributed sort+limit — only the chosen probe
    # docs (a handful of rows) ever reach the driver, never the table
    head = (
        _docs(sf_dir, ["doc_id", "text"])
        .sort("doc_id")
        .limit(n_probe_docs)
        .to_pandas()
    )
    probes: list[str] = []
    for t in head["text"]:
        words = str(t).lower().split()
        if len(words) >= gram_n:
            probes.append(" ".join(words[:gram_n]))
    probes = sorted(set(probes))[:max_probes]
    pref = ray.put([f" {g} " for g in probes])

    class Match:
        def __init__(self):
            self.pads = ray.get(pref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or not self.pads:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "n_probe_hits": pd.Series([], dtype="int64")}
                )
            norm = (
                " "
                + df["text"].str.lower().str.split().str.join(" ")
                + " "
            )
            hits = np.zeros(len(df), dtype=np.int64)
            for pad in self.pads:
                hits += norm.str.contains(pad, regex=False).to_numpy()
            sel = hits > 0
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64").to_numpy()[sel],
                    "n_probe_hits": hits[sel],
                }
            )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(Match, batch_format="pandas", concurrency=(1, 8))
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_probe_hits": pd.Series([], dtype="int64")}
        )
    return (
        out.astype({"doc_id": "int64", "n_probe_hits": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def quality_filter(
    sf_dir: str, min_words: int = 20, max_stopword_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
) -> rd.Dataset:
    """The FILTER face of the quality heuristics — the operator a training
    pipeline actually applies (``quality_scores`` reports, this one
    drops).  Predicates evaluate on the ROUNDED scores so the DuckDB
    oracle's ``ROUND(...)`` comparisons land on identical values; the
    result streams (pipe to ``write_parquet`` at scale)."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        sel = (
            (df["n_words"] >= min_words)
            & (df["stopword_ratio"] <= max_stopword_ratio)
            & (df["alpha_ratio"] >= min_alpha_ratio)
        )
        return df.loc[
            sel, ["doc_id", "n_words", "alpha_ratio", "stopword_ratio"]
        ]

    return quality_scores(sf_dir).map_batches(keep, batch_format="pandas")


def pack_sequences(
    sf_dir: str, budget: int = 2048, chunk: int = 4096
) -> rd.Dataset:
    """Sequence packing for training batches: assign each document (in
    doc_id order) to a token-budget bin — ``bin_id = floor(tokens_before /
    budget)`` — the deterministic packing a dataloader consumes.

    The global prefix sum is computed DISTRIBUTED with the two-level scan
    pattern: per-chunk token totals (one tiny groupby), driver cumsum over
    the chunk totals only (O(n_docs / chunk) rows), then per-chunk offsets
    broadcast back into a co-partitioned ``map_groups`` that finishes the
    within-chunk cumsum.  No stage ever holds more than a chunk; the SQL
    oracle replays the whole thing with one window function."""
    import ray
    from ray.data.aggregate import Sum

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = (
            df["text"].str.split().str.len().fillna(0).astype("int64")
        )
        did = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did.to_numpy(),
                "n_tok": n_tok.to_numpy(),
                "chunk": (did // chunk).to_numpy(),
            }
        )

    with_counts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pandas"
    )
    # level 1: tiny per-chunk totals -> driver cumsum -> broadcast offsets
    totals = (
        with_counts.groupby("chunk")
        .aggregate(Sum("n_tok", alias_name="total"))
        .to_pandas()
        .sort_values("chunk")
    )
    offs = dict(
        zip(
            totals["chunk"].astype(int),
            np.concatenate([[0], np.cumsum(totals["total"].to_numpy())[:-1]]),
        )
    )
    oref = ray.put(offs)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        base = int(ray.get(oref)[int(g["chunk"].iloc[0])])
        g = g.sort_values("doc_id")
        before = base + np.concatenate(
            [[0], np.cumsum(g["n_tok"].to_numpy())[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tok": g["n_tok"].to_numpy(),
                "bin_id": (before // budget).astype("int64"),
            }
        )

    # the assignment is O(corpus) rows — stays a Dataset (pipe it to
    # write_parquet at scale; the driver collects it only at oracle scale)
    return with_counts.groupby("chunk").map_groups(
        finish, batch_format="pandas"
    )
