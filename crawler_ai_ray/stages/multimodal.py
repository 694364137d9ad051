"""Multimodal (image / audio / video) column plumbing.

Media travel as opaque ``binary`` columns + typed metadata structs —
the same pattern the crawl engine uses for ``html:binary`` — and every
transform is an **actor-pool** ``map_batches`` stage (codec / model
setup happens once per actor in ``__init__``, work per batch in
``__call__``).

The sandbox image/audio libraries (PIL, ffmpeg, torchaudio…) are NOT
installed, so the *decode* step is stubbed: ``decoder="fake"`` is a
deterministic stand-in (bytes → seeded pixel/PCM arrays) and
``decoder="real"`` raises ``NotImplementedError`` at actor construction
with the library it would use.  Everything around the decode — schemas,
batch sizing, actor signature, zero-copy Arrow layout, output tables —
is real and tested.

Batch-size guidance (the part that matters at 100 TB): media rows are
orders of magnitude wider than text rows; batches must be sized by
BYTES not rows.  ``media_batch_size(avg_bytes)`` targets ~32 MB per
batch so batch × concurrency stays inside a worker heap, and the
object store (not Python lists) holds everything in flight.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "media_batch_size",
    "ImageDecodeResize",
    "AudioFeatures",
    "VideoFrameSample",
    "synth_media_table",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),       # opaque encoded bytes
        ("meta", pa.struct(
            [
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("sample_rate", pa.int32()),
                ("n_frames", pa.int32()),
                ("codec", pa.string()),
            ]
        )),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_luma", pa.float64()),
        ("embedding", pa.list_(pa.float32(), 16)),
    ]
)

TARGET_BATCH_BYTES = 32 << 20


def media_batch_size(avg_payload_bytes: int, floor: int = 4, cap: int = 1024) -> int:
    """Rows per batch so one batch ≈ 32 MB of payload."""
    return max(floor, min(cap, TARGET_BATCH_BYTES // max(1, avg_payload_bytes)))


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in decode: seeded by payload digest."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.RandomState(seed % (2**32))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecodeResize:
    """Actor-pool stage: payload → decoded pixels → resize → features.

    Use: ``ds.map_batches(ImageDecodeResize, fn_constructor_kwargs=...,
    concurrency=N, batch_size=media_batch_size(avg))``."""

    def __init__(self, out_w: int = 64, out_h: int = 64, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real image decode needs PIL/opencv (not in this container); "
                "plug in here: PIL.Image.open(io.BytesIO(payload))"
            )
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        # nearest-neighbor resample — pure numpy, deterministic
        h, w = px.shape[:2]
        yi = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
        xi = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
        return px[yi[:, None], xi[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        cols = {n: [] for n in IMAGE_FEATURES_SCHEMA.names}
        for mid, payload, meta in zip(ids, payloads, metas):
            w = meta["width"] or 32
            h = meta["height"] or 32
            px = self._resize(_fake_pixels(payload, w, h))
            luma = float(
                (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).mean()
            )
            # 16-bin grayscale histogram as the stand-in "embedding"
            hist, _ = np.histogram(px.mean(axis=2), bins=16, range=(0, 256))
            emb = (hist / max(1, hist.sum())).astype(np.float32)
            cols["media_id"].append(mid)
            cols["width"].append(self.out_w)
            cols["height"].append(self.out_h)
            cols["mean_luma"].append(luma)
            cols["embedding"].append(emb.tolist())
        return pa.Table.from_pydict(cols, schema=IMAGE_FEATURES_SCHEMA)


class AudioFeatures:
    """Actor-pool stage: audio payload → (duration, rms, zero-crossings)."""

    def __init__(self, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real audio decode needs soundfile/ffmpeg (not in container)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        out = {"media_id": [], "duration_s": [], "rms": [], "zero_crossings": []}
        for mid, payload, meta in zip(ids, payloads, metas):
            sr = meta["sample_rate"] or 16000
            seed = int.from_bytes(
                hashlib.blake2b(payload, digest_size=8).digest(), "little"
            )
            rng = np.random.RandomState(seed % (2**32))
            pcm = rng.randn(sr)  # 1 s of fake PCM
            out["media_id"].append(mid)
            out["duration_s"].append(len(pcm) / sr)
            out["rms"].append(float(np.sqrt((pcm**2).mean())))
            out["zero_crossings"].append(int((np.diff(np.sign(pcm)) != 0).sum()))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "duration_s": pa.array(out["duration_s"], type=pa.float64()),
                "rms": pa.array(out["rms"], type=pa.float64()),
                "zero_crossings": pa.array(out["zero_crossings"], type=pa.int64()),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: video payload → every-nth-frame feature rows
    (variable fan-out — flat_map shape expressed as map_batches)."""

    def __init__(self, every_n: int = 10, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real video decode needs ffmpeg/pyav (not in container)"
            )
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        out = {"media_id": [], "frame_idx": [], "mean_luma": []}
        for mid, payload, meta in zip(ids, payloads, metas):
            n = meta["n_frames"] or 30
            for f in range(0, n, self.every_n):
                px = _fake_pixels(payload + f.to_bytes(4, "little"), 16, 16)
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["mean_luma"].append(float(px.mean()))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "mean_luma": pa.array(out["mean_luma"], type=pa.float64()),
            }
        )


def synth_media_table(n: int, kind: str = "image", seed: int = 13) -> pa.Table:
    """Deterministic fake media corpus for tests/bench."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(256)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "meta": {
                    "width": int(rng.randint(16, 128)),
                    "height": int(rng.randint(16, 128)),
                    "sample_rate": 16000,
                    "n_frames": int(rng.randint(10, 60)),
                    "codec": "fake",
                },
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
