"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The corpus carries REAL format payloads — 24-bit BMP images, PCM16 mono WAV
audio, YUV4MPEG2/C420 video — synthesized deterministically from the
documents table (content rules shared with the SQL oracle, below), and the
decode stage genuinely parses them: headers, bottom-up BMP rows with
padding, RIFF chunk walks, Y4M frame markers (``functions.media_codecs``).
A decoder bug therefore shows up as an oracle mismatch, never as silent
agreement with the writer.  Compressed formats (JPEG/MP3/H.264) need codecs
this environment does not have and raise ``NotImplementedError`` at exactly
the point a real deployment would call one.

Ray-side discipline: actor-pool ``map_batches`` stages with small
``batch_size`` (binary payload rows are wide — batches must be sized by
payload bytes, not row count), stateful setup in ``__init__``, typed Arrow
columns throughout.

Deterministic content rules (d = doc_id, also derivable in SQL):
  image  w=16+d%48, h=16+(7d)%48, gray(x,y) = (3x+5y+d) % 256
  audio  n=256+d%512 samples @8 kHz, s(i) = ((31d+17i) % 4096) - 2048
  video  w=16+(d%24)*2, h=16+((7d)%24)*2, T=1+d%8,
         y(x,y,t) = (3x+5y+11t+d) % 256
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import media_codecs as codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),     # -1 until decoded
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def _synth_payload(d: int, kind: str) -> bytes:
    if kind == "image":
        w, h = 16 + d % 48, 16 + (7 * d) % 48
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        return codecs.encode_bmp(((3 * x + 5 * y + d) % 256).astype(np.uint8))
    if kind == "audio":
        n = 256 + d % 512
        i = np.arange(n, dtype=np.int64)
        return codecs.encode_wav(
            (((31 * d + 17 * i) % 4096) - 2048).astype(np.int16), rate=8000
        )
    w, h, t = 16 + (d % 24) * 2, 16 + ((7 * d) % 24) * 2, 1 + d % 8
    x = np.arange(w, dtype=np.int64)[None, None, :]
    y = np.arange(h, dtype=np.int64)[None, :, None]
    tt = np.arange(t, dtype=np.int64)[:, None, None]
    return codecs.encode_y4m(
        ((3 * x + 5 * y + 11 * tt + d) % 256).astype(np.uint8)
    )


def synthesize_media(documents_path: str, n: int = 200) -> pa.Table:
    """Deterministic media table over the first ``n`` docs by doc_id:
    kind round-robins (image/audio/video) and each payload is a REAL
    format container built by the content rules above."""
    import pyarrow.parquet as pq

    docs = pq.read_table(documents_path, columns=["doc_id"])
    docs = docs.take(pa.compute.sort_indices(docs["doc_id"])).slice(0, n)
    kinds = ["image", "audio", "video"]
    ids = [int(d) for d in docs["doc_id"].to_pylist()]
    payloads = [
        _synth_payload(d, kinds[i % 3]) for i, d in enumerate(ids)
    ]
    return pa.table(
        {
            "media_id": [f"m{d:08d}" for d in ids],
            "kind": [kinds[i % 3] for i in range(len(ids))],
            "payload": pa.array(payloads, pa.large_binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "width": pa.array([-1] * len(ids), pa.int32()),
            "height": pa.array([-1] * len(ids), pa.int32()),
            "n_frames": pa.array([-1] * len(ids), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class Decode:
    """Actor-pool decode stage: parses each payload's actual bytes into
    dimensions + content statistics.

      image → (w, h, 1),      values = all BGR bytes       (scale 255)
      audio → (n_samples, 1, 1), values = int16 samples     (scale 2048)
      video → (w, h, T),      values = Y-plane bytes        (scale 255)

    ``content_mean`` / ``content_ms`` (mean of squares) are exact-integer
    sums divided once in float64, so the SQL oracle reproduces them
    bit-for-bit from the generation rules.  Unsupported containers raise
    ``NotImplementedError`` — the honest boundary where a real deployment
    calls PIL / libav / soundfile."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        w = np.empty(n, dtype=np.int32)
        h = np.empty(n, dtype=np.int32)
        fr = np.empty(n, dtype=np.int32)
        mean = np.empty(n, dtype=np.float64)
        ms = np.empty(n, dtype=np.float64)
        scale = np.empty(n, dtype=np.float64)
        cks = np.empty(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            kind = codecs.sniff_kind(p)
            if kind is None:
                raise NotImplementedError(
                    "no codec for this container in this environment "
                    "(compressed formats need PIL/libav/soundfile)"
                )
            if kind == "image":
                px = codecs.decode_bmp(p)
                w[i], h[i], fr[i] = px.shape[1], px.shape[0], 1
                vals = px.reshape(-1).astype(np.int64)
                scale[i] = 255.0
            elif kind == "audio":
                _rate, s = codecs.decode_wav(p)
                w[i], h[i], fr[i] = len(s), 1, 1
                vals = s.astype(np.int64)
                scale[i] = 2048.0
            else:
                y = codecs.decode_y4m(p)
                w[i], h[i], fr[i] = y.shape[2], y.shape[1], y.shape[0]
                vals = y.reshape(-1).astype(np.int64)
                scale[i] = 255.0
            cnt = max(vals.size, 1)
            mean[i] = vals.sum() / cnt     # exact int sums: float64-exact
            ms[i] = (vals * vals).sum() / cnt
            d8 = hashlib.blake2b(p, digest_size=8).digest()
            cks[i] = int.from_bytes(d8[4:8], "little")
        # payload is consumed here; downstream stages work on decoded
        # stats, so the heavy binary column does not ride the pipeline
        out = batch.drop_columns(["payload", "width", "height", "n_frames"])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(h))
        out = out.append_column("n_frames", pa.array(fr))
        out = out.append_column("content_mean", pa.array(mean))
        out = out.append_column("content_ms", pa.array(ms))
        out = out.append_column("scale", pa.array(scale))
        return out.append_column("checksum", pa.array(cks))


# Backwards-compatible name from when the kernel was stubbed.
DecodeStub = Decode


def resize_meta(batch: pa.Table, max_side: int = 32) -> pa.Table:
    """Resize planning (aspect-preserving clamp to max_side) — pure
    metadata arithmetic; a real kernel would transform pixel arrays with the
    same signature.  Truncation (astype) matches the oracle's FLOOR; the
    division-then-multiply order is fixed so both sides run the same IEEE
    ops."""
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
    """Actor-pool feature extraction over DECODED media: a fixed-dim
    (4) float64 embedding per item —

        [log1p(n_bytes), content_mean/scale, rms/scale, n_frames]

    — real content statistics, each reproducible by the SQL oracle from
    the generation rules.  A learned vision/audio model slots here with
    the same signature (weights loaded once per actor in ``__init__``,
    batched inference in ``__call__``); ``model="learned"`` marks that
    honest boundary with ``NotImplementedError``."""

    def __init__(self, model: str = "stats"):
        if model != "stats":
            raise NotImplementedError(
                "learned feature models are not available in this "
                "environment; FeatureExtract(model='stats') computes real "
                "content-statistic features"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = batch["n_bytes"].to_numpy().astype(np.float64)
        mean = batch["content_mean"].to_numpy()
        ms = batch["content_ms"].to_numpy()
        sc = batch["scale"].to_numpy()
        fr = batch["n_frames"].to_numpy().astype(np.float64)
        feats = np.stack(
            [np.log1p(nb), mean / sc, np.sqrt(ms) / sc, fr], axis=1
        )
        return batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )


def media_pipeline(documents_path: str, batch_size: int = 64) -> rd.Dataset:
    """decode (actor pool) → feature extract → resize plan.  Small
    batch_size: binary payloads make rows wide, so batches are sized by
    payload, not row count, keeping batch × concurrency inside worker
    heaps."""
    media = synthesize_media(documents_path)
    ds = rd.from_arrow(media)
    ds = ds.map_batches(
        Decode, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )
    ds = ds.map_batches(
        FeatureExtract, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )
    return ds.map_batches(resize_meta, batch_format="pyarrow", batch_size=batch_size)


def media_bytes_per_kind(sf_dir: str) -> pd.DataFrame:
    """Per-kind media count + payload bytes (byte math only — oracle
    checks the container framing overhead formulas)."""
    import os

    from ray.data.aggregate import Count, Sum

    media = synthesize_media(os.path.join(sf_dir, "documents.parquet"))
    ds = rd.from_arrow(media.select(["kind", "n_bytes"]))
    agg = ds.groupby("kind").aggregate(
        Count(alias_name="n_media"), Sum("n_bytes", alias_name="total_bytes")
    )
    return agg.to_pandas().sort_values("kind").reset_index(drop=True)


def media_feature_norms(sf_dir: str) -> pd.DataFrame:
    """Per-kind mean L2 norm of the extracted features — exercises the
    decode → feature-extract chain end-to-end; oracle recomputes the same
    norms from the content rules via generate_series."""
    import os

    from ray.data.aggregate import Mean

    ds = media_pipeline(os.path.join(sf_dir, "documents.parquet"))

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["features"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"kind": df["kind"], "norm": np.linalg.norm(mat, axis=1)}
        )

    out = (
        ds.map_batches(norms, batch_format="pandas")
        .groupby("kind")
        .aggregate(Mean("norm", alias_name="mean_feature_norm"))
        .to_pandas()
    )
    out["mean_feature_norm"] = out["mean_feature_norm"].round(6)
    return out.sort_values("kind").reset_index(drop=True)


def media_stats(sf_dir: str) -> pd.DataFrame:
    """Per-kind stats over the DECODED media — dimensions come from
    parsing the payload bytes, so the oracle (which derives them from the
    generation rules) verifies the decoders."""
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
