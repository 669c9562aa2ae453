"""Deterministic synthetic transcript + entity-table generator.

Produces the rebuild's primary input per ``BASELINE.json`` ``input_hint``:

- ``turns.parquet``    — ``(conv_id:string, turn_idx:int32, role:string,
                          text:string, tool:string?, ts:timestamp[us])``
- ``entities.parquet`` — the entity dimension (the analogue of the
  reference's parts sheets, cf. ``spreadsheet_loader.py:54-111``):
  ``(entity_id, name, part_type, view, state, source, revision, container)``

Everything is a pure function of ``sf`` (no RNG object, no wall clock): each
turn's content derives from a splitmix64 mix of ``(conv, turn)``, so any
scale regenerates bit-identically, on any machine.

The synthetic text embeds a small, explicit grammar that the extraction stage
(and the DuckDB oracle) parse back out:

- entity mentions are delimited: ``[[<alias>]]``
- binary relations: ``[[a]] <relword> [[b]]`` with
  relword ∈ {includes, depends on, is replaced by, documents, aka}
  → predicates {hasComponent, dependsOn, hasAlternate, describes, sameAs}
- tool turns carry a ``tool`` column value (hot-key skewed: ~50% "search")

Alias variants exercise the reference's resolution outcomes
(``spreadsheet_loader.py:1055-1080``): canonical name, UPPERCASE, padded
whitespace, the canonical id itself (number-fallback path, ``:1063-1066``),
``"123.0"``-style float formatting (``normalize_part_number`` ``:35-42``),
unknown ghosts, and deliberately duplicated "twin" names (ambiguous,
cf. ``tests/unit/test_spreadsheet_loader.py:164-184``).

Structural guarantees relied on downstream:

- ``includes`` edges stay within a 40-entity "family" block and point from
  the lower to the higher id → the hasComponent graph is a sparse DAG whose
  transitive closure is bounded per family (scale-safe, mirrors the shallow
  BOM trees of the reference data, cf. docs/IMPLEMENTATION_SUMMARY.md:24-40).
- ``aka`` (sameAs) edges link consecutive ids inside disjoint 3-entity
  groups ``{3g, 3g+1, 3g+2}`` and always use id aliases → always resolvable;
  connected components are ≤3 entities.
- hot-key skew: ~20% of generic mention slots hit entities 0..9.
- anaphora (the order-sensitive rule, analogue of the reference's
  level-stack parse ``spreadsheet_loader.py:1160-1182``): some
  single-mention turns say ``[[that one]]``, which refers to the most
  recent non-anaphoric mention in *earlier turns of the same
  conversation* — resolvable only under stable (conv_id, turn_idx)
  ordering.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import mix2

ADJ = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
       "iota", "kappa", "lamda", "sigma", "omega", "crimson", "azure",
       "amber", "ivory", "jade", "onyx", "pearl"]
NOUN = ["rotor", "valve", "sensor", "bracket", "gasket", "manifold",
        "spindle", "bearing", "coupler", "housing", "piston", "flange",
        "damper", "gear", "shaft", "nozzle", "filter", "clamp", "pulley",
        "liner"]
TOOLS = ["search", "browse", "calc", "db_query", "code_run", "lookup"]
TOPICS = ["engine", "track", "brake", "chassis", "throttle", "exhaust",
          "coolant", "ignition"]
ROLES = ["user", "assistant", "tool"]
PREFIX = {"user": "please check", "assistant": "i reviewed", "tool": "result:"}
RELWORDS = ["includes", "depends on", "is replaced by", "documents", "aka"]
REL_PRED = ["hasComponent", "dependsOn", "hasAlternate", "describes", "sameAs"]

FAMILY = 40          # includes-edge blocking factor (bounds closure size)
PART_TYPES = ["MechanicalPart", "SoftwarePart", "Variant", "WTPart"]
VIEWS = ["Design", "Manufacturing", "Service"]
STATES = ["RELEASED", "DESIGN", "INPLANNING", "RELEASEDFORPRODUCTION",
          "PRODUCTIONCHANGE"]
REVISIONS = ["A", "B", "C", "D"]

TS_BASE_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

DATA_ROOT = "/tmp/graft_data"
SYNTH_VERSION = "9"  # bump on any generator change → new cache dir


def n_entities_for(sf: float) -> int:
    return max(60, int(round(200_000 * sf)))


def n_conv_for(sf: float) -> int:
    # ~6M*sf turns total at ~11 turns/conv (matches lineitem row scaling).
    return max(8, int(round(6_000_000 * sf / 11.0)))


def entity_name(k: int) -> str:
    if k % 50 in (48, 49):
        tw = k // 50
        return f"twin {ADJ[tw % 20]} {NOUN[(tw // 20) % 20]} {tw}"
    if k % 13 == 0:
        return str(100_000 + k)
    return f"{ADJ[k % 20]} {NOUN[(k // 20) % 20]} {k}"


def make_entities(sf: float) -> pa.Table:
    n = n_entities_for(sf)
    k = np.arange(n)
    names = [entity_name(int(i)) for i in k]
    twin_mask = (k % 50 == 48)  # name shared with k+1 → ambiguous
    return pa.table({
        "entity_id": pa.array([f"P{i:07d}" for i in k], pa.string()),
        "name": pa.array(names, pa.string()),
        "part_type": pa.array([PART_TYPES[i % 4] for i in k], pa.string()),
        "view": pa.array([VIEWS[i % 3] for i in k], pa.string()),
        "state": pa.array([STATES[i % 5] for i in k], pa.string()),
        "source": pa.array(["make" if i % 2 == 0 else "buy" for i in k], pa.string()),
        "revision": pa.array(
            [None if i % 5 == 4 else REVISIONS[i % 4] for i in k], pa.string()),
        "container": pa.array(
            [None if i % 7 == 6 else f"CONT{i % 7}" for i in k], pa.string()),
        "is_twin_lead": pa.array(twin_mask.tolist(), pa.bool_()),
    })


def typo_name(name: str) -> str:
    """Fuzzy-tier alias: damage the 2nd token ("alpha rotor 3" →
    "alpha rotorx 3"); 1-token (numeric) names are left exact."""
    toks = name.split(" ")
    if len(toks) < 3:
        return name
    toks[1] = toks[1] + "x"
    return " ".join(toks)


def _alias(k: int, variant: int, h: int) -> str:
    """Alias text for entity k under variant bucket ``variant`` ∈ [0,20)."""
    name = entity_name(k)
    if variant < 8:
        return name
    if variant < 11:
        return name.upper()
    if variant < 13:
        return f" {name} "
    if variant < 16:
        return f"P{k:07d}"
    if variant < 18:
        return name + ".0" if name.isdigit() else name
    if variant == 18:
        return f"ghost item {h % 997}"
    return typo_name(name)


def make_turns(sf: float) -> pa.Table:
    n_ent = n_entities_for(sf)
    n_conv = n_conv_for(sf)
    n_fam = max(1, n_ent // FAMILY)
    # sameAs groups {3g, 3g+1, 3g+2} cover only the first ~20% of ids, so
    # canonicalization merges a realistic minority of the vocabulary
    n_aka = max(1, n_ent // 15)

    tpc = 6 + (np.arange(n_conv) % 11)          # turns per conv ∈ [6,16]
    conv = np.repeat(np.arange(n_conv), tpc)
    first = np.zeros(len(conv), dtype=np.int64)
    first[np.cumsum(tpc)[:-1]] = np.cumsum(tpc)[:-1]
    np.maximum.accumulate(first, out=first)
    turn = np.arange(len(conv)) - first          # 0..tpc-1 within conv

    h = mix2(conv.astype(np.uint64), turn.astype(np.uint64))
    m = (h % np.uint64(4)).astype(np.int64)                     # mentions 0..3
    rel = ((h >> np.uint64(29)) % np.uint64(6)).astype(np.int64)
    rel[m < 2] = 5                                              # 5 = none

    # family-blocked includes edges (rel==0): low id -> high id, same family
    fam = ((h >> np.uint64(7)) % np.uint64(n_fam)).astype(np.int64)
    o1 = ((h >> np.uint64(13)) % np.uint64(FAMILY)).astype(np.int64)
    o2 = ((h >> np.uint64(19)) % np.uint64(FAMILY)).astype(np.int64)
    rel[(rel == 0) & (o1 == o2)] = 5
    inc_lo = fam * FAMILY + np.minimum(o1, o2)
    inc_hi = fam * FAMILY + np.maximum(o1, o2)

    # aka (sameAs) pairs inside disjoint 3-groups, id-alias operands
    g = ((h >> np.uint64(13)) % np.uint64(n_aka)).astype(np.int64)
    off = ((h >> np.uint64(19)) % np.uint64(2)).astype(np.int64)
    aka_a = 3 * g + off
    aka_b = aka_a + 1
    rel[(rel == 4) & (aka_b >= n_ent)] = 5

    # generic entity picks per slot (hot-key skew: 20% → entities 0..9)
    ent = np.empty((3, len(conv)), dtype=np.int64)
    var = np.empty((3, len(conv)), dtype=np.int64)
    for i in range(3):
        hot = ((h >> np.uint64(3 + 5 * i)) % np.uint64(5)) == 0
        e = ((h >> np.uint64(11 + 7 * i)) % np.uint64(n_ent)).astype(np.int64)
        e[hot] = (h[hot] % np.uint64(10)).astype(np.int64)
        ent[i] = e
        var[i] = ((h >> np.uint64(23 + 9 * i)) % np.uint64(20)).astype(np.int64)

    # relation operands override slots 0/1
    is_inc = rel == 0
    ent[0][is_inc] = inc_lo[is_inc]
    ent[1][is_inc] = inc_hi[is_inc]
    is_aka = rel == 4
    ent[0][is_aka] = aka_a[is_aka]
    ent[1][is_aka] = aka_b[is_aka]
    var[0][is_aka] = 14          # forced id alias → always resolvable
    var[1][is_aka] = 14

    role_idx = turn % 3
    tool_pick = np.where(h % np.uint64(2) == 0, 0,
                         1 + ((h >> np.uint64(8)) % np.uint64(5)).astype(np.int64))
    has_topic = ((h >> np.uint64(41)) % np.uint64(3)) == 0
    topic_idx = ((h >> np.uint64(37)) % np.uint64(8)).astype(np.int64)

    anaphor = (m == 1) & (((h >> np.uint64(45)) % np.uint64(6)) == 0)

    # --- fully vectorized text assembly (object-dtype numpy string algebra;
    # semantics identical to the per-row reference formulation in _alias) ---
    names = np.array([entity_name(i) for i in range(n_ent)], dtype=object)
    typos = np.array([typo_name(nm) for nm in names], dtype=object)
    is_digit = np.array([nm.isdigit() for nm in names])
    ghost = np.char.add("ghost item ",
                        (h % np.uint64(997)).astype(np.int64).astype(str)
                        ).astype(object)

    def alias_col(i: int) -> np.ndarray:
        e, v = ent[i], var[i]
        nm = names[e]
        out = nm.copy()
        up = (v >= 8) & (v < 11)
        out[up] = [s.upper() for s in nm[up]]
        pad = (v >= 11) & (v < 13)
        out[pad] = " " + nm[pad] + " "
        idv = (v >= 13) & (v < 16)
        out[idv] = np.char.add(
            "P", np.char.zfill(e[idv].astype(str), 7)).astype(object)
        flt = (v >= 16) & (v < 18) & is_digit[e]
        out[flt] = nm[flt] + ".0"
        gh = v == 18
        out[gh] = ghost[gh]
        ty = v == 19
        out[ty] = typos[e][ty]
        return out

    a0, a1, a2 = alias_col(0), alias_col(1), alias_col(2)
    a0[anaphor] = "that one"
    b0 = "[[" + a0 + "]]"
    b1 = "[[" + a1 + "]]"
    b2 = "[[" + a2 + "]]"

    relword = np.array(RELWORDS, dtype=object)[np.clip(rel, 0, 4)]
    core = np.full(len(conv), "status update", dtype=object)
    m1 = m == 1
    core[m1] = b0[m1]
    m2 = (m == 2) & (rel == 5)
    core[m2] = b0[m2] + " and " + b1[m2]
    m3 = (m == 3) & (rel == 5)
    core[m3] = b0[m3] + " and " + b1[m3] + " and " + b2[m3]
    r2 = (rel < 5) & (m == 2)
    core[r2] = b0[r2] + " " + relword[r2] + " " + b1[r2]
    r3 = (rel < 5) & (m == 3)
    core[r3] = b0[r3] + " " + relword[r3] + " " + b1[r3] + " with " + b2[r3]

    roles = np.array(ROLES, dtype=object)[role_idx]
    prefix = np.array([PREFIX[r] for r in ROLES], dtype=object)[role_idx]
    text = prefix + " " + core
    topic = np.array(TOPICS, dtype=object)[topic_idx]
    text[has_topic] = text[has_topic] + " " + topic[has_topic]

    tools = np.array(TOOLS, dtype=object)[tool_pick]
    tools = np.where(roles == "tool", tools, None)

    conv_ids = np.char.add("c", np.char.zfill(conv.astype(str), 8))

    ts = TS_BASE_US + conv * 600_000_000 + turn * 7_000_000
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn.astype(np.int32)),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tools.tolist(), pa.string()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })


VOCAB = [f"{a}{b}" for a in ("re", "un", "pre", "de", "over", "sub", "mis",
                             "out", "up", "in")
         for b in ("load", "build", "scale", "merge", "shard", "index",
                   "cache", "route", "batch", "spill", "fetch", "probe",
                   "split", "joins", "group", "quant", "tune", "drift",
                   "skews", "chunk")]  # 200 tokens


def make_docs(sf: float) -> pa.Table:
    """Deterministic document corpus WITH known duplicate structure, for the
    dedup-operator family (the shared testdata docs contain no near-dups):

    - k % 10 == 7 → exact duplicate of doc k-1
    - k % 10 == 8 → near duplicate of doc k-2 (every 15th token replaced →
      token-3-gram Jaccard ≈ 0.65-0.75, above the 0.35 verify threshold
      and far below exact equality)
    - everything else: an i.i.d.-looking bag over a 200-word vocabulary
      (cross-doc Jaccard ≪ 0.1).
    """
    n = max(60, int(round(50_000 * sf)))
    h = mix2(np.arange(n, dtype=np.uint64), np.full(n, 7, dtype=np.uint64))
    lens = (40 + (h % np.uint64(60))).astype(np.int64)
    texts: list[str] = []
    for k in range(n):
        kind = k % 10
        if kind == 7 and k >= 1:
            texts.append(texts[k - 1])
            continue
        if kind == 8 and k >= 2:
            toks = texts[k - 2].split(" ")
            repl = VOCAB[int(h[k] % np.uint64(200))]
            toks = [repl if i % 15 == 5 else t for i, t in enumerate(toks)]
            texts.append(" ".join(toks))
            continue
        hh = mix2(np.full(lens[k], k, dtype=np.uint64),
                  np.arange(lens[k], dtype=np.uint64))
        texts.append(" ".join(VOCAB[int(x % np.uint64(200))] for x in hh))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def make_vecs(sf: float, dim: int = 64, n_clusters: int = 16) -> pa.Table:
    """Deterministic embeddings WITH known near-duplicate structure:
    k % 10 == 9 → near copy of vector k-1 (cosine ≳ 0.999); other vectors
    are cluster centers + noise (cross cosine ≲ 0.9)."""
    n = max(60, int(round(50_000 * sf)))
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters
    noise = rng.normal(size=(n, dim)) * 0.35
    vecs = centers[labels] + noise
    near = (np.arange(n) % 10 == 9) & (np.arange(n) >= 1)
    idx = np.where(near)[0]
    vecs[idx] = vecs[idx - 1] + rng.normal(size=(len(idx), dim)) * 0.01
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels.astype(np.int32)),
    })


CHANGE_TYPES = ["ECO", "ECN", "DEV", "REV"]
CHANGE_STATES = ["OPEN", "IN_WORK", "REVIEW", "APPROVED", "IMPLEMENTED",
                 "CANCELLED"]


def make_changes(sf: float) -> pa.Table:
    """Deterministic change-record table (the reference's enhanced-data
    change path, ``analyze_snowmobile_data.py:193-233`` /
    ``scripts/mcp/ingest_changes.py``): each change's description embeds the
    canonical NAME of 1–3 entities (for J9 containment matching) and
    references an affected entity id; create_date is monotone per entity."""
    n = max(50, int(round(20_000 * sf)))
    n_ent = n_entities_for(sf)
    k = np.arange(n, dtype=np.uint64)
    h = mix2(k, np.full(n, 13, dtype=np.uint64))
    affected = (h % np.uint64(n_ent)).astype(np.int64)
    texts = []
    for i in range(n):
        hh = int(h[i])
        n_ment = 1 + hh % 3
        names = [entity_name(int((hh >> (7 * j + 5)) % n_ent))
                 for j in range(n_ment)]
        texts.append("change affecting " + " and ".join(names))
    create = TS_BASE_US + (h % np.uint64(10_000)).astype(np.int64) * 60_000_000
    return pa.table({
        "change_id": pa.array([f"C{i:07d}" for i in range(n)], pa.string()),
        "type": pa.array([CHANGE_TYPES[i % 4] for i in range(n)], pa.string()),
        "state": pa.array([CHANGE_STATES[i % 6] for i in range(n)],
                          pa.string()),
        "priority": pa.array([["low", "medium", "high"][i % 3]
                              for i in range(n)], pa.string()),
        "description": pa.array(texts, pa.string()),
        "affected_id": pa.array([f"P{a:07d}" for a in affected], pa.string()),
        "create_date": pa.array(create).cast(pa.timestamp("us")),
    })


VERSION_STATES = ["INWORK", "UNDERREVIEW", "RELEASED"]


def make_versions(sf: float) -> pa.Table:
    """Deterministic entity version/iteration history (the reference's
    temporal import path: ``scripts/import_temporal_history.py:92-129`` and
    ``scripts/windchill_odata_temporal_import.py:228-247`` — one row per
    (entity, version, iteration) with a ``full_id`` of
    ``{entity}.{version}.{iteration}``, a lifecycle state and a
    per-entity-monotone created date). 1–4 versions per entity, 1–3
    iterations per version."""
    n_ent = n_entities_for(sf)
    k = np.arange(n_ent, dtype=np.uint64)
    h = mix2(k, np.full(n_ent, 77, dtype=np.uint64))
    n_vers = (1 + h % np.uint64(4)).astype(np.int64)

    ent_of_ver = np.repeat(np.arange(n_ent, dtype=np.int64), n_vers)
    ver_starts = np.concatenate([[0], np.cumsum(n_vers)[:-1]])
    ver_idx = np.arange(len(ent_of_ver)) - np.repeat(ver_starts, n_vers)

    hv = mix2(ent_of_ver.astype(np.uint64),
              (ver_idx + 500).astype(np.uint64))
    n_iter = (1 + hv % np.uint64(3)).astype(np.int64)

    row_ent = np.repeat(ent_of_ver, n_iter)
    row_ver = np.repeat(ver_idx, n_iter)
    it_starts = np.concatenate([[0], np.cumsum(n_iter)[:-1]])
    row_it = np.arange(len(row_ent)) - np.repeat(it_starts, n_iter) + 1

    # per-entity row sequence → monotone created timestamps within an entity
    per_ent_rows = np.bincount(row_ent, minlength=n_ent)
    ent_row_starts = np.concatenate([[0], np.cumsum(per_ent_rows)[:-1]])
    seq = np.arange(len(row_ent)) - ent_row_starts[row_ent]
    created = TS_BASE_US + (row_ent * 31 + seq) * 3_600_000_000

    eids = [f"P{e:07d}" for e in row_ent]
    vers = [chr(65 + int(v)) for v in row_ver]
    full = [f"{e}.{v}.{i}" for e, v, i in zip(eids, vers, row_it)]
    hr = mix2(row_ent.astype(np.uint64),
              (row_ver * 7 + row_it).astype(np.uint64))
    return pa.table({
        "entity_id": pa.array(eids, pa.string()),
        "version": pa.array(vers, pa.string()),
        "iteration": pa.array(row_it.astype(np.int32)),
        "full_id": pa.array(full, pa.string()),
        "state": pa.array([VERSION_STATES[int(x) % 3] for x in hr],
                          pa.string()),
        "modifier": pa.array([f"user{int(x) % 20}" for x in hr >> np.uint64(8)],
                             pa.string()),
        "created_date": pa.array(created).cast(pa.timestamp("us")),
    })


def png_header(w: int, h: int, color_type: int = 2,
               bit_depth: int = 8) -> bytes:
    """A REAL PNG container prefix: 8-byte signature + IHDR chunk with a
    valid CRC32 (PNG spec §5.2/11.2.2). Pixel data is NOT encoded — the
    payload that follows is opaque bytes — but any header-level PNG parser
    (including ours, stages/multimodal.parse_headers) reads this."""
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF))


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Elementwise PNG Paeth predictor (spec §9.4) over int64 arrays."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                    np.where(pb_ <= pc_, b, c))


def png_encode(pixels: np.ndarray, color_type: int,
               filter_type: int = 0) -> bytes:
    """A COMPLETE, decodable 8-bit PNG: signature + IHDR + one IDAT
    (zlib-compressed scanlines, all rows filtered with ``filter_type``
    0-4) + IEND. ``pixels`` is (h, w, channels) uint8. Encoding predictors
    are fully vectorized (they only reference already-known recon bytes);
    the matching decoder lives in ``stages/multimodal.decode_png``."""
    hgt, wid, ch = pixels.shape
    bpp = ch
    lines = []
    prev = np.zeros(wid * ch, dtype=np.int64)
    for y in range(hgt):
        cur = pixels[y].reshape(-1).astype(np.int64)
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        if filter_type == 0:
            pred = 0
        elif filter_type == 1:
            pred = left
        elif filter_type == 2:
            pred = prev
        elif filter_type == 3:
            pred = (left + prev) >> 1
        elif filter_type == 4:
            pred = _paeth_predict(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter type {filter_type}")
        filt = (cur - pred) & 0xFF
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines), 6)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    return (png_header(wid, hgt, color_type=color_type)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def wav_header(sample_rate: int, channels: int, bits: int,
               n_data: int) -> bytes:
    """A REAL RIFF/WAVE header (44-byte canonical PCM layout): RIFF size,
    fmt chunk (PCM=1, channels, rate, byte-rate, block-align, bits), data
    chunk size. The sample payload that follows is opaque bytes."""
    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    return (b"RIFF" + struct.pack("<I", 36 + n_data) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate, block_align, bits)
            + b"data" + struct.pack("<I", n_data))


def make_media(sf: float) -> pa.Table:
    """Deterministic binary media table (images + audio) for the multimodal
    stages: every payload is a COMPLETE, decodable file — real PNG
    (IHDR + zlib IDAT + IEND, scanline filter 0-4 varied per image) or
    real RIFF/WAVE PCM (8/16-bit, 1-2 channels) — with splitmix64
    pseudo-content. Writer-truth columns ``pixel_sum`` / ``n_pixels``
    (sum/count of decoded channel values resp. PCM samples) let the
    ``mm_decoded_means`` oracle check the REAL decoder against what was
    encoded, the same golden pattern the xlsx writer uses for workbooks."""
    n = max(40, int(round(5_000 * sf)))
    k = np.arange(n, dtype=np.uint64)
    h = mix2(k, np.full(n, 99, dtype=np.uint64))
    is_img = (k % np.uint64(3)) != 0
    widths = np.where(is_img, 8 + (h % np.uint64(24)).astype(np.int64), 0)
    heights = np.where(is_img, 8 + ((h >> np.uint64(8)) % np.uint64(24))
                       .astype(np.int64), 0)
    rates = np.where(is_img, 0, 8000 + 100 * ((h >> np.uint64(16))
                                              % np.uint64(80)).astype(np.int64))
    # PNG color types 0/2/6 (gray/RGB/RGBA → 1/3/4 channels); WAV 1-2
    # channels, 8/16-bit samples — all deterministic from the row hash
    ctypes = np.array([0, 2, 6])[((h >> np.uint64(24))
                                  % np.uint64(3)).astype(np.int64)]
    wav_ch = 1 + ((h >> np.uint64(32)) % np.uint64(2)).astype(np.int64)
    wav_bits = 8 * (1 + ((h >> np.uint64(40))
                         % np.uint64(2)).astype(np.int64))
    png_channels = {0: 1, 2: 3, 6: 4}
    payloads, sums, counts = [], [], []
    for i in range(n):
        if is_img[i]:
            w_, h_ = int(widths[i]), int(heights[i])
            ch = png_channels[int(ctypes[i])]
            npx = w_ * h_ * ch
            words = mix2(np.full(npx // 8 + 1, i, dtype=np.uint64),
                         np.arange(npx // 8 + 1, dtype=np.uint64))
            pix = np.frombuffer(words.tobytes()[:npx], np.uint8) \
                .reshape(h_, w_, ch)
            ftype = int((h[i] >> np.uint64(48)) % np.uint64(5))
            payloads.append(png_encode(pix, int(ctypes[i]),
                                       filter_type=ftype))
            sums.append(int(pix.sum(dtype=np.int64)))
            counts.append(npx)
        else:
            bits, chn = int(wav_bits[i]), int(wav_ch[i])
            block = chn * (bits // 8)
            m = int(200 + (int(h[i]) % 800))
            m -= m % block            # whole PCM frames only (valid stream)
            words = mix2(np.full(m // 8 + 1, i, dtype=np.uint64),
                         np.arange(m // 8 + 1, dtype=np.uint64))
            body = words.tobytes()[:m]
            payloads.append(wav_header(int(rates[i]), chn, bits, m) + body)
            s = np.frombuffer(body, np.uint8).astype(np.int64) if bits == 8 \
                else np.frombuffer(body, "<i2").astype(np.int64)
            sums.append(int(s.sum()))
            counts.append(int(s.size))
    return pa.table({
        "media_id": pa.array(k.astype(np.int64)),
        "kind": pa.array(np.where(is_img, "image", "audio").tolist(),
                         pa.string()),
        "format": pa.array(np.where(is_img, "png", "wav").tolist(),
                           pa.string()),
        "width": pa.array(widths.astype(np.int32)),
        "height": pa.array(heights.astype(np.int32)),
        "sample_rate": pa.array(rates.astype(np.int32)),
        "data": pa.array(payloads, pa.binary()),
        "pixel_sum": pa.array(sums, pa.int64()),
        "n_pixels": pa.array(counts, pa.int64()),
    })


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def data_dir_for(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, "v" + SYNTH_VERSION,
                        os.path.basename(os.path.normpath(sf_dir)))


def ensure_synth(sf_dir: str) -> dict[str, str]:
    """Idempotently materialize turns/entities Parquet for this sf tier.

    Returns ``{"turns": path, "entities": path, "dir": dir}``. Written
    atomically (tmp + rename) so concurrent callers are safe.
    """
    out = data_dir_for(sf_dir)
    sf = sf_from_dir(sf_dir)
    paths = {"turns": os.path.join(out, "turns.parquet"),
             "entities": os.path.join(out, "entities.parquet"),
             "docs": os.path.join(out, "docs_dup.parquet"),
             "vecs": os.path.join(out, "vecs_dup.parquet"),
             "media": os.path.join(out, "media.parquet"),
             "changes": os.path.join(out, "changes.parquet"),
             "versions": os.path.join(out, "versions.parquet"),
             "dir": out}
    os.makedirs(out, exist_ok=True)
    makers = {"entities": lambda: make_entities(sf),
              "turns": lambda: make_turns(sf),
              "docs": lambda: make_docs(sf),
              "vecs": lambda: make_vecs(sf),
              "media": lambda: make_media(sf),
              "changes": lambda: make_changes(sf),
              "versions": lambda: make_versions(sf)}
    for key, maker in makers.items():
        if not os.path.exists(paths[key]):
            tmp = paths[key] + f".tmp.{os.getpid()}"
            tbl = maker()
            # ~64 row groups per table so read_parquet's override_num_blocks
            # can split even small side tables into parallel blocks (Ray
            # cannot split below row-group granularity — a 5k-row table in
            # one 64k row group reads as ONE block and serializes the
            # per-batch work downstream)
            rg = min(65536, max(256, tbl.num_rows // 64))
            pq.write_table(tbl, tmp, row_group_size=rg)
            os.replace(tmp, paths[key])
    return paths
