"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width/height`` or ``sample_rate`` etc.).  Decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages — the decoder library loads once per actor in ``__init__``.

The image/audio codecs are NOT installed in this environment, so the decode
kernels are STUBBED: ``backend="fake"`` produces a deterministic fake decode
(seeded by the payload bytes) so the Ray-side plumbing — schema, batch size,
actor signature, output layout — is real and tested; ``backend="real"``
raises ``NotImplementedError`` until a codec (e.g. Pillow / soundfile) is
available on the cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # "image/png", "audio/wav", "video/mp4"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def _payload_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")


def make_fake_media_table(n: int, media_type: str = "image/png") -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded pseudo-bytes)."""
    rng = np.random.RandomState(42)
    payloads = [rng.randint(0, 256, size=64 + (i % 128), dtype=np.uint8).tobytes() for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:08d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([media_type] * n),
            "width": pa.array([32 + (i % 8) * 16 for i in range(n)], pa.int32()),
            "height": pa.array([32 + (i % 4) * 16 for i in range(n)], pa.int32()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_frames": pa.array([1 + i % 30 for i in range(n)], pa.int32()),
        }
    )


class ImageDecoder:
    """Actor-pool stage: payload → decoded pixel tensor → cheap features.

    Real decoding needs an image codec which this container does not ship;
    the ``fake`` backend synthesizes a deterministic (h, w, 3) uint8 tensor
    from the payload hash so downstream feature stages are exercised end to
    end with the exact schema a real decoder would produce.
    """

    def __init__(self, backend: str = "fake", resize_to: tuple[int, int] | None = (16, 16)):
        if backend == "real":
            raise NotImplementedError(
                "no image codec in this environment; install Pillow on the "
                "cluster and implement decode here"
            )
        assert backend == "fake"
        self.resize_to = resize_to

    def _decode_one(self, payload: bytes, w: int, h: int) -> np.ndarray:
        rng = np.random.RandomState(_payload_seed(payload))
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        if self.resize_to:
            th, tw = self.resize_to
            ys = np.linspace(0, h - 1, th).astype(int)
            xs = np.linspace(0, w - 1, tw).astype(int)
            img = img[np.ix_(ys, xs)]  # nearest-neighbour resize, codec-free
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        means, stds, pixels = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            img = self._decode_one(p, w, h)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            pixels.append(img.reshape(-1).astype(np.uint8))
        th, tw = self.resize_to
        pix_flat = np.concatenate(pixels) if pixels else np.array([], np.uint8)
        pix_col = pa.FixedSizeListArray.from_arrays(pa.array(pix_flat, pa.uint8()), th * tw * 3)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixel_mean": pa.array(means, pa.float64()),
                "pixel_std": pa.array(stds, pa.float64()),
                "thumbnail": pix_col,
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: payload → decoded waveform → cheap features
    (duration, RMS energy, zero-crossing rate) + a fixed-size banded
    energy vector (the mel-filterbank stand-in).

    Same stub contract as ImageDecoder: ``fake`` synthesizes a
    deterministic waveform from the payload hash so schema/batching/actor
    plumbing is exercised; ``real`` raises until an audio codec ships.
    """

    N_BANDS = 8

    def __init__(self, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError(
                "no audio codec in this environment; install soundfile on "
                "the cluster and implement decode here"
            )
        assert backend == "fake"

    def _decode_one(self, payload: bytes, sr: int) -> np.ndarray:
        rng = np.random.RandomState(_payload_seed(payload))
        n = sr // 100 * (1 + len(payload) % 16)  # 10ms–160ms fake clips
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        srs = batch["sample_rate"].to_pylist()
        dur, rms, zcr, bands = [], [], [], []
        for p, sr in zip(payloads, srs):
            wav = self._decode_one(p, sr)
            dur.append(len(wav) / sr)
            rms.append(float(np.sqrt(np.mean(wav ** 2))))
            zcr.append(float(np.mean(np.signbit(wav[:-1]) != np.signbit(wav[1:]))))
            seg = np.array_split(wav ** 2, self.N_BANDS)
            bands.append(np.array([s.mean() for s in seg], np.float32))
        band_flat = np.concatenate(bands) if bands else np.array([], np.float32)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(band_flat, pa.float32()), self.N_BANDS)
        return pa.table({
            "media_id": batch["media_id"],
            "duration_s": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
            "band_energy": band_col,
        })


class FrameSampler:
    """Actor-pool stage: sample ≤ ``max_frames`` frame indices per video row
    (uniform, deterministic), emitting one row per sampled frame."""

    def __init__(self, max_frames: int = 4, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("no video codec in this environment")
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, n in zip(batch["media_id"].to_pylist(), batch["n_frames"].to_pylist()):
            take = np.linspace(0, max(n - 1, 0), min(self.max_frames, max(n, 1))).astype(int)
            for f in np.unique(take):
                ids.append(mid)
                frames.append(int(f))
        return pa.table({"media_id": pa.array(ids), "frame_idx": pa.array(frames, pa.int32())})


def decode_images(ds, concurrency=(1, 4), batch_size: int = 256, resize_to=(16, 16)):
    """Large binary payloads ⇒ small batches so batch × concurrency fits the
    worker heap (ray_guide: memory-aware batch sizing)."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"backend": "fake", "resize_to": resize_to},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_features(ds, concurrency=(1, 4), batch_size: int = 256):
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"backend": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds, max_frames: int = 4, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )
