"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — clearly marked below); everything Ray-side is real and tested:
the schema (``large_binary`` payload + kind/width/height/... metadata), the
actor-pool ``map_batches`` stages with small ``batch_size`` (large binary
rows must not be batched by row count alone), and the partitioned output
layout.

Stub discipline: ``DecodeStub`` produces a DETERMINISTIC fake decode (shape
and checksum derived from the payload bytes) so downstream stages (resize,
frame-sample, feature-extract) exercise real array plumbing; passing
``strict=True`` raises ``NotImplementedError`` exactly where a real codec
would be called.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),     # metadata as produced upstream; -1 unknown
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synthesize_media(documents_path: str, n: int = 200) -> pa.Table:
    """Deterministic fake media table derived from the documents table
    (payload = utf-8 bytes of the text; kind round-robins)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    # deterministic doc_id order (matches the SQL oracle's ORDER BY doc_id
    # regardless of physical file order)
    docs = docs.take(pa.compute.sort_indices(docs["doc_id"])).slice(0, n)
    kinds = ["image", "audio", "video"]
    payloads = [t.encode("utf-8") for t in docs["text"].to_pylist()]
    return pa.table(
        {
            "media_id": [f"m{int(d):08d}" for d in docs["doc_id"].to_pylist()],
            "kind": [kinds[i % 3] for i in range(len(payloads))],
            "payload": pa.array(payloads, pa.large_binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "width": pa.array([-1] * len(payloads), pa.int32()),
            "height": pa.array([-1] * len(payloads), pa.int32()),
            "n_frames": pa.array([-1] * len(payloads), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStub:
    """Actor-pool decode stage.

    STUB: a real deployment would call PIL / libav / soundfile here
    (``strict=True`` raises ``NotImplementedError`` at exactly that point).
    The fake decode derives (width, height, n_frames) and a pixel checksum
    deterministically from the payload so the pipeline shape — binary in,
    typed arrays + metadata out — is fully exercised.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _fake_decode(self, payload: bytes, kind: str) -> tuple[int, int, int, int]:
        d = hashlib.blake2b(payload, digest_size=8).digest()
        w = 16 + d[0] % 64
        h = 16 + d[1] % 64
        frames = 1 if kind == "image" else 1 + d[2] % 30
        checksum = int.from_bytes(d[4:8], "little")
        return w, h, frames, checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image/audio/video codecs are not available in this "
                "environment; DecodeStub(strict=False) provides the "
                "deterministic fake decode for pipeline testing"
            )
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        w, h, f, c = [], [], [], []
        for p, kd in zip(payloads, kinds):
            wi, hi, fi, ci = self._fake_decode(p, kd)
            w.append(wi)
            h.append(hi)
            f.append(fi)
            c.append(ci)
        out = batch.drop_columns(["width", "height", "n_frames"])
        out = out.append_column("width", pa.array(w, pa.int32()))
        out = out.append_column("height", pa.array(h, pa.int32()))
        out = out.append_column("n_frames", pa.array(f, pa.int32()))
        return out.append_column("checksum", pa.array(c, pa.int64()))


def resize_meta(batch: pa.Table, max_side: int = 32) -> pa.Table:
    """Resize planning (aspect-preserving clamp to max_side) — pure
    metadata arithmetic; a real kernel would transform pixel arrays with the
    same signature."""
    import pyarrow.compute as pc

    w = batch["width"].to_numpy().astype(np.float64)
    h = batch["height"].to_numpy().astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "out_width", pa.array((w * scale).astype(np.int32))
    ).append_column("out_height", pa.array((h * scale).astype(np.int32)))


def frame_sample_plan(batch: pa.Table, every: int = 5) -> pa.Table:
    """Per-video frame sampling plan: one output row per sampled frame
    (flat_map semantics expressed as an Arrow-native expansion)."""
    media = batch["media_id"].to_pylist()
    frames = batch["n_frames"].to_numpy()
    counts = np.maximum((frames + every - 1) // every, 1)
    rep_media = np.repeat(np.arange(len(media)), counts)
    frame_idx = np.concatenate(
        [np.arange(0, max(int(fr), 1), every) for fr in frames]
    )
    return pa.table(
        {
            "media_id": pa.array([media[i] for i in rep_media]),
            "frame": pa.array(frame_idx.astype(np.int32)),
        }
    )


class FeatureExtract:
    """Actor-pool feature extraction over decoded media: emits a fixed-dim
    embedding per item.

    STUB at the kernel level (a real deployment would run a vision/audio
    model here — batched inference, weights loaded once in ``__init__``);
    the fake features are a deterministic projection of payload bytes
    (byte histogram → seeded random projection), so downstream consumers
    (ANN over media, near-dup) exercise real ``list<float>`` plumbing with
    stable values.  ``strict=True`` raises where the model call would be.
    """

    def __init__(self, dim: int = 16, seed: int = 11, strict: bool = False):
        self.dim = dim
        self.strict = strict
        rng = np.random.default_rng(seed)
        # "model weights": loaded once per actor, reused across batches
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real feature models are not available in this environment; "
                "FeatureExtract(strict=False) provides the deterministic "
                "fake features for pipeline testing"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            hist = np.bincount(
                np.frombuffer(p or b"\0", dtype=np.uint8), minlength=256
            ).astype(np.float32)
            hist /= max(hist.sum(), 1.0)
            feats[i] = hist @ self.proj
        return batch.append_column(
            "features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )


def media_pipeline(documents_path: str, batch_size: int = 64) -> rd.Dataset:
    """decode(stub, actor pool) → resize plan → stats.  Small batch_size:
    binary payloads make rows wide, so batches are sized by payload, not
    row count so batch x concurrency stays inside worker heaps."""
    media = synthesize_media(documents_path)
    ds = rd.from_arrow(media)
    ds = ds.map_batches(
        DecodeStub, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )
    ds = ds.map_batches(
        FeatureExtract, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )
    return ds.map_batches(resize_meta, batch_format="pyarrow", batch_size=batch_size)


def media_bytes_per_kind(sf_dir: str) -> pd.DataFrame:
    """Per-kind media count + payload bytes (SQL-oracle-checkable face of
    the media pipeline: byte math only, no stub decode involved)."""
    import os

    from ray.data.aggregate import Count, Sum

    media = synthesize_media(os.path.join(sf_dir, "documents.parquet"))
    ds = rd.from_arrow(media.select(["kind", "n_bytes"]))
    agg = ds.groupby("kind").aggregate(
        Count(alias_name="n_media"), Sum("n_bytes", alias_name="total_bytes")
    )
    return agg.to_pandas().sort_values("kind").reset_index(drop=True)


def media_feature_norms(sf_dir: str) -> pd.DataFrame:
    """Per-kind mean L2 norm of the extracted (stub) features — exercises
    the decode → feature-extract chain end-to-end over ``list<float>``
    columns (deterministic; rows-only for the driver)."""
    import os

    ds = media_pipeline(os.path.join(sf_dir, "documents.parquet"))

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["features"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"kind": df["kind"], "norm": np.linalg.norm(mat, axis=1)}
        )

    out = (
        ds.map_batches(norms, batch_format="pandas")
        .to_pandas()
        .groupby("kind", as_index=False)["norm"]
        .mean()
        .rename(columns={"norm": "mean_feature_norm"})
    )
    out["mean_feature_norm"] = out["mean_feature_norm"].round(6)
    return out.sort_values("kind").reset_index(drop=True)


def media_stats(sf_dir: str) -> pd.DataFrame:
    """Per-kind stats over the decoded (stub) media — the queries() face."""
    import os

    from ray.data.aggregate import Count, Max, Mean, Sum

    ds = media_pipeline(os.path.join(sf_dir, "documents.parquet"))
    agg = ds.groupby("kind").aggregate(
        Count(alias_name="n_media"),
        Sum("n_bytes", alias_name="total_bytes"),
        Mean("out_width", alias_name="avg_out_width"),
        Max("n_frames", alias_name="max_frames"),
    )
    df = agg.to_pandas().sort_values("kind").reset_index(drop=True)
    df["avg_out_width"] = df["avg_out_width"].round(4)
    return df
