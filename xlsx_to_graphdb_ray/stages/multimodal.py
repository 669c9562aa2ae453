"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Header-level parsing is REAL: ``parse_headers`` reads genuine PNG
(signature + IHDR, big-endian) and RIFF/WAVE (fmt chunk, little-endian)
byte layouts with pure numpy matrix arithmetic — no image/audio library
needed. Only pixel/sample DECODING is stubbed (no codec libraries in this
container): ``DecodeStub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake decode
(byte-derived pseudo-pixels) so downstream stages are exercisable
end-to-end and oracle-checkable (``mm_decoded_means``).

Scale notes baked into the design: binary rows are large → small
``batch_size`` and Arrow (zero-copy) batches; the decoder is an ACTOR pool
(codec init once per actor, ref T5 pattern); feature extraction is
vectorized numpy over the raw bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # image | audio
    ("format", pa.string()),      # png | wav ...
    ("width", pa.int32()),        # image metadata (0 for audio)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),  # audio metadata (0 for image)
    ("data", pa.binary()),
])

# Container magic / layout constants (PNG spec §5.2; RIFF/WAVE canonical
# 44-byte PCM header). HEAD_LEN covers both: PNG sig+IHDR = 33 bytes,
# WAV RIFF..data-size = 44 bytes.
_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)
_HEAD_LEN = 44
# PNG color type → channel count (0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA)
_PNG_CHANNELS = np.array([1, 0, 3, 1, 2, 0, 4], dtype=np.int64)


def _be32(m: np.ndarray, off: int) -> np.ndarray:
    return (m[:, off].astype(np.int64) << 24 | m[:, off + 1].astype(np.int64) << 16
            | m[:, off + 2].astype(np.int64) << 8 | m[:, off + 3].astype(np.int64))


def _le32(m: np.ndarray, off: int) -> np.ndarray:
    return (m[:, off + 3].astype(np.int64) << 24 | m[:, off + 2].astype(np.int64) << 16
            | m[:, off + 1].astype(np.int64) << 8 | m[:, off].astype(np.int64))


def _le16(m: np.ndarray, off: int) -> np.ndarray:
    return m[:, off + 1].astype(np.int64) << 8 | m[:, off].astype(np.int64)


def parse_headers(media_ds):
    """REAL container-header parser over the raw binary column.

    Returns (media_id, container, width, height, bit_depth, channels,
    sample_rate) decoded purely from bytes — metadata columns are never
    consulted, so a corrupted payload is detected (container='unknown',
    zeros), and a test cross-checks parsed values against the writer's
    metadata. Rebuilds the header-inspection step a real multimodal
    pipeline needs before routing to codecs; decode itself stays stubbed
    (no codec libs here).

    Vectorized: the first 44 bytes of every payload are packed into one
    (n, 44) uint8 matrix and all field extraction is numpy integer math —
    no per-row struct.unpack in the batch loop.
    """

    def parse(b: pa.Table) -> pa.Table:
        data = b["data"]
        lens = pc.binary_length(data).to_numpy(zero_copy_only=False)
        pad = b"\x00" * _HEAD_LEN
        buf = b"".join(
            (bytes(d[:_HEAD_LEN]) + pad)[:_HEAD_LEN] if d is not None else pad
            for d in data.to_pylist())
        m = np.frombuffer(buf, dtype=np.uint8).reshape(-1, _HEAD_LEN)

        is_png = (lens >= 33) & (m[:, :8] == _PNG_SIG).all(axis=1) \
            & (m[:, 12:16] == np.frombuffer(b"IHDR", np.uint8)).all(axis=1)
        is_wav = (lens >= _HEAD_LEN) \
            & (m[:, 0:4] == np.frombuffer(b"RIFF", np.uint8)).all(axis=1) \
            & (m[:, 8:12] == np.frombuffer(b"WAVE", np.uint8)).all(axis=1) \
            & (m[:, 12:16] == np.frombuffer(b"fmt ", np.uint8)).all(axis=1)

        ctype = np.clip(m[:, 25].astype(np.int64), 0, 6)
        width = np.where(is_png, _be32(m, 16), 0)
        height = np.where(is_png, _be32(m, 20), 0)
        bit_depth = np.where(is_png, m[:, 24].astype(np.int64),
                             np.where(is_wav, _le16(m, 34), 0))
        channels = np.where(is_png, _PNG_CHANNELS[ctype],
                            np.where(is_wav, _le16(m, 22), 0))
        sample_rate = np.where(is_wav, _le32(m, 24), 0)
        container = np.where(is_png, "png",
                             np.where(is_wav, "wav", "unknown"))
        return pa.table({
            "media_id": b["media_id"],
            "container": pa.array(container.tolist(), pa.string()),
            "width": pa.array(width),
            "height": pa.array(height),
            "bit_depth": pa.array(bit_depth),
            "channels": pa.array(channels),
            "sample_rate": pa.array(sample_rate),
        })

    return media_ds.map_batches(parse, batch_format="pyarrow",
                                batch_size=1024)


class DecodeStub:
    """Actor-pool decode stage: ``__init__`` = codec setup (once per actor),
    ``__call__`` = per-batch decode. Real decode is NotImplemented; the
    deterministic fake maps bytes → uint8 array of size width*height."""

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub")
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for data, w, h in zip(batch["data"].to_pylist(),
                              batch["width"].to_pylist(),
                              batch["height"].to_pylist()):
            n = max(1, int(w) * int(h))
            raw = np.frombuffer(data, dtype=np.uint8)
            reps = int(np.ceil(n / max(1, len(raw))))
            pixels.append(np.tile(raw, reps)[:n])
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.array([p.tolist() for p in pixels],
                               pa.list_(pa.uint8())),
        })


def byte_stats(media_ds):
    """(media_id, kind, n_bytes, checksum) — pure metadata pass, Arrow
    kernels + md5; oracle-checkable."""

    def stats(b: pa.Table) -> pa.Table:
        # checksum over the UPPERCASE HEX of the payload — DuckDB's md5 only
        # takes VARCHAR, so both sides hash hex(data) (DuckDB hex() is upper)
        sums = [hashlib.md5(d.hex().upper().encode()).hexdigest()
                for d in b["data"].to_pylist()]
        return pa.table({
            "media_id": b["media_id"],
            "kind": b["kind"],
            "n_bytes": pc.cast(pc.binary_length(b["data"]), pa.int64()),
            "checksum": pa.array(sums, pa.string()),
        })

    return media_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=1024)


def byte_entropy(media_ds):
    """(media_id, entropy) — Shannon entropy of the byte histogram, a real
    vectorized feature extractor over the binary column (oracle-checked:
    ``mm_entropy`` reproduces it in SQL via a per-byte unnest histogram)."""

    def ent(b: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(b), dtype=np.float64)
        for i, d in enumerate(b["data"]):
            raw = np.frombuffer(d, dtype=np.uint8)
            if len(raw) == 0:
                continue
            counts = np.bincount(raw, minlength=256)
            p = counts[counts > 0] / len(raw)
            out[i] = float(-(p * np.log2(p)).sum())
        return pd.DataFrame({"media_id": b["media_id"].values,
                             "entropy": np.round(out, 6)})

    return media_ds.map_batches(ent, batch_format="pandas", batch_size=1024)


def decode_and_reduce(media_ds, fake: bool = True):
    """Full plumbing demo: actor-pool decode (stub) → per-media pixel sum.

    Returns (media_id, pixel_sum, n_pixels) — exact integers, so the fake
    decode path is bit-checkable against a SQL oracle (``mm_decoded_means``
    reproduces the tile-truncate arithmetic per byte; the mean is
    pixel_sum / n_pixels). Exercises the actor signature, small batch
    sizing for fat rows, and list<uint8> schema round-trip.
    """
    decoded = media_ds.map_batches(
        DecodeStub, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

    def reduce_(b: pa.Table) -> pd.DataFrame:
        pix = b["pixels"].to_pylist()
        return pd.DataFrame({
            "media_id": b["media_id"].to_pylist(),
            "pixel_sum": [int(np.sum(p, dtype=np.int64)) for p in pix],
            "n_pixels": [len(p) for p in pix],
        })

    return decoded.map_batches(reduce_, batch_format="pyarrow")
