"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Ray-side plumbing — schema, actor-pool stage signature, batch sizing, output
layout — is real and tested. The actual codec work is STUBBED (no
image/audio libraries in this container): ``DecodeStub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake decode (byte-derived pseudo-pixels) so downstream stages
are exercisable end-to-end.

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
    ("format", pa.string()),      # fake-png | fake-wav ...
    ("width", pa.int32()),        # image metadata (0 for audio)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),  # audio metadata (0 for image)
    ("data", pa.binary()),
])


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
    """Full plumbing demo: actor-pool decode (stub) → per-media pixel mean.

    Returns (media_id, pixel_mean). Exercises the actor signature, small
    batch sizing for fat rows, and list<uint8> schema round-trip.
    """
    decoded = media_ds.map_batches(
        DecodeStub, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

    def reduce_(b: pa.Table) -> pd.DataFrame:
        means = [round(float(np.mean(p)), 6) if len(p) else 0.0
                 for p in b["pixels"].to_pylist()]
        return pd.DataFrame({"media_id": b["media_id"].to_pylist(),
                             "pixel_mean": means})

    return decoded.map_batches(reduce_, batch_format="pyarrow")
