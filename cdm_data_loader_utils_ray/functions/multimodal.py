"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

WAV-PCM, PNG, baseline JPEG and PPM/PGM decode for REAL
(``functions/codecs`` + ``functions/jpeg`` — pure stdlib + numpy: PNG
inflate + all five scanline filters; JPEG Huffman entropy decode, exact
8x8 IDCT, 4:4:4/4:2:2/4:2:0 sampling, restart markers).  Formats needing
codec libraries absent from this container (mp4/mp3, progressive JPEG)
stay honestly stubbed — raising ``NotImplementedError`` (strict mode) or
producing a deterministic fake (test mode).  Everything Ray-side is real
and tested: schemas, actor-pool stages with per-actor "model" setup,
byte-budgeted small batches for large binary payloads, and the output
layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module level, NOT inside the actor __init__: a worker-executed lazy
# intra-package import breaks the by-value serialization drive contract
# (CLAUDE.md convention; __ray_entry__ ships the package via cloudpickle)
from cdm_data_loader_utils_ray.functions import codecs as _codecs

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string(), nullable=False),
        pa.field("kind", pa.string(), nullable=False),  # image | audio | video
        pa.field("mime", pa.string(), nullable=True),
        pa.field("payload", pa.large_binary(), nullable=False),
        pa.field("width", pa.int32(), nullable=True),
        pa.field("height", pa.int32(), nullable=True),
        pa.field("duration_ms", pa.int64(), nullable=True),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string(), nullable=False),
        pa.field("feature", pa.list_(pa.float32()), nullable=False),
        pa.field("feature_dim", pa.int32(), nullable=False),
    ]
)


def _fake_decode(payload: bytes, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature = seeded hash
    expansion of the payload bytes.  Lets the full Ray plumbing be tested
    without media libraries."""
    h = hashlib.blake2b(payload, digest_size=8, key=seed.to_bytes(8, "little")).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media.

    Real deployments load the model/codec ONCE here in ``__init__``; batches
    must be sized by BYTES (a handful of rows), not row count — pass e.g.
    ``batch_size=8`` and ``concurrency=N`` to ``map_batches``.

    Modes:
      ``'real'``   REAL decode for the self-describing uncompressed formats
                   (``functions/codecs.py``): WAV-PCM audio (stdlib wave +
                   numpy) and PPM/PGM images — real RMS/zero-crossing /
                   channel-stat/histogram features, padded or truncated to
                   ``dim``.  Compressed mimes (png/jpeg/mp4/...) still raise
                   ``NotImplementedError`` — that codec boundary genuinely
                   needs libraries this container lacks.
      ``'fake'``   deterministic hash-expansion features (plumbing tests).
      ``'strict'`` raises at every decode (the documented stub).
    """

    def __init__(self, dim: int = 64, mode: str = "fake", seed: int = 42):
        self.dim, self.mode, self.seed = dim, mode, seed
        # once-per-actor setup: bind the real kernels here, not per batch
        if mode == "real":
            self._codecs = _codecs

    def _real_decode(self, payload: bytes, mime: str) -> np.ndarray:
        c = self._codecs
        if mime == "audio/wav":
            f = c.wav_features(payload)
        elif mime in ("image/png", "image/jpeg", "image/gif", "image/bmp",
                      "image/x-portable-pixmap", "image/x-portable-graymap"):
            # PNG (stdlib zlib + scanline filters) and baseline JPEG
            # (functions/jpeg: Huffman + IDCT, pure numpy) are REAL —
            # only video/audio-compressed formats (mp4/mp3) stay stubbed
            f = c.image_features(payload)
        else:
            raise NotImplementedError(
                f"real decode of {mime!r} requires codec libraries not in "
                "this container (WAV-PCM, PNG, baseline JPEG and PPM/PGM "
                "are fully supported)"
            )
        out = np.zeros(self.dim, dtype=np.float32)
        out[: min(self.dim, len(f))] = f[: self.dim]
        return out

    def decode(self, payload: bytes, kind: str, mime: str | None = None) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                "media decode requires image/audio codecs not present in this "
                "container; use mode='fake' for plumbing tests"
            )
        if self.mode == "real":
            return self._real_decode(payload, mime or "")
        return _fake_decode(payload, self.dim, self.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        mimes = (
            batch["mime"].to_pylist()
            if "mime" in batch.schema.names
            else [None] * len(batch)
        )
        feats = [
            self.decode(p.as_py() if hasattr(p, "as_py") else p, k, m)
            for p, k, m in zip(batch["payload"], kinds, mimes)
        ]
        flat = np.concatenate(feats) if feats else np.empty(0, dtype=np.float32)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                pa.ListArray.from_arrays(
                    pa.array(np.arange(len(feats) + 1) * self.dim, type=pa.int32()),
                    pa.array(flat, type=pa.float32()),
                ),
                pa.array([self.dim] * len(feats), type=pa.int32()),
            ],
            schema=FEATURE_SCHEMA,
        )


class FrameSampler:
    """Video frame-sampling stage: emits one row per sampled frame offset
    (timing plumbing real, frame decode stubbed like above).  Vectorized:
    per-row frame counts -> one repeat + arange subtraction, no Python
    loop over frames."""

    def __init__(self, every_ms: int = 1000, mode: str = "fake"):
        self.every_ms, self.mode = every_ms, mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur = pc.fill_null(batch["duration_ms"], 0).to_numpy(zero_copy_only=False)
        counts = np.maximum(0, -(-dur // self.every_ms)).astype(np.int64)
        parent = np.repeat(np.arange(len(dur)), counts)
        # offset within each row's run: global arange minus run starts
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(counts.sum()) - starts[parent]
        return pa.table(
            {
                "media_id": batch["media_id"].take(pa.array(parent)),
                "frame_offset_ms": pa.array(local * self.every_ms, type=pa.int64()),
            }
        )


def extract_features(ds, dim: int = 64, concurrency: int = 2, batch_size: int = 8,
                     mode: str = "fake"):
    """Media feature extraction pipeline: small byte-budgeted batches into
    an actor pool (the canonical large-binary layout)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"dim": dim, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaMetadata:
    """Actor-pool stage: typed metadata over the opaque binary payload —
    byte size + md5-prefix checksum (the checksum-verify pattern of the
    reference's download path, ``utils/file_utils.py`` checksum gating).
    md5-prefix is chosen so a DuckDB oracle can recompute it
    (``substr(md5(payload),1,16)``)."""

    def __init__(self):
        pass  # real version: checksum config / codec probe once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        # sizes via the Arrow kernel (zero copies); payload bytes converted
        # out of Arrow exactly ONCE for the checksum
        n_bytes = pc.binary_length(payloads).cast(pa.int64())
        checksums = pa.array(
            [hashlib.md5(p).hexdigest()[:16] for p in payloads.to_pylist()],
            type=pa.string(),
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": n_bytes,
                "checksum": checksums,
            }
        )


def media_metadata(ds, concurrency: int = 2, batch_size: int = 64):
    """Metadata pass over a media table (byte-budgeted batches, actor pool)."""
    return ds.map_batches(
        MediaMetadata,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def documents_as_media(batch: pa.Table, id_column: str = "doc_id",
                       text_column: str = "text") -> pa.Table:
    """map_batches kernel: wrap a text table as an opaque-binary media table
    (UTF-8 payload; kind round-robins image/audio/video by id).  Used by
    tests and the catalog to exercise the binary plumbing on deterministic
    input without media files."""
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    kinds = np.array(["image", "audio", "video"])[ids % 3]
    mimes = np.array(["image/png", "audio/wav", "video/mp4"])[ids % 3]
    media_id = pc.binary_join_element_wise(
        pa.array(["m"] * len(batch)), pc.cast(batch[id_column], pa.string()), ""
    )
    payload = pc.cast(batch[text_column].cast(pa.string()), pa.binary()).cast(
        pa.large_binary()
    )
    duration = pa.array(
        (ids % 9000) + 1000, type=pa.int64(), mask=(ids % 3 == 0)
    )
    return pa.Table.from_arrays(
        [
            media_id,
            pa.array(kinds, type=pa.string()),
            pa.array(mimes, type=pa.string()),
            payload,
            pa.nulls(len(batch), pa.int32()),
            pa.nulls(len(batch), pa.int32()),
            duration,
        ],
        schema=MEDIA_SCHEMA,
    )


def synth_real_media(n: int = 12, seed: int = 7) -> pa.Table:
    """Deterministic REAL media payloads — decodable WAV sines plus PPM
    and PNG gradients (``functions/codecs``), no fixtures or media libs
    needed; image rows alternate PPM / PNG so both real image decoders
    are exercised."""
    from cdm_data_loader_utils_ray.functions import codecs

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            freq = 110.0 * (1 + i % 5)
            t = np.arange(int(16000 * 0.25)) / 16000.0
            payload = codecs.encode_wav(0.5 * np.sin(2 * np.pi * freq * t))
            rows.append(
                {
                    "media_id": f"r{i:04d}", "kind": "audio",
                    "mime": "audio/wav", "payload": payload,
                    "width": None, "height": None, "duration_ms": 250,
                }
            )
        else:
            h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            img = (
                np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
                * np.ones((h, 1, 3))
            ).astype(np.uint8)
            as_png = (i % 4) == 3
            rows.append(
                {
                    "media_id": f"r{i:04d}", "kind": "image",
                    "mime": "image/png" if as_png
                            else "image/x-portable-pixmap",
                    "payload": codecs.encode_png(img) if as_png
                               else codecs.encode_ppm(img),
                    "width": w, "height": h, "duration_ms": None,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synth_media(n: int = 32, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        rows.append(
            {
                "media_id": f"m{i:04d}",
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": rng.bytes(rng.integers(256, 4096)),
                "width": int(rng.integers(64, 1024)) if kind == "image" else None,
                "height": int(rng.integers(64, 1024)) if kind == "image" else None,
                "duration_ms": int(rng.integers(1000, 10000)) if kind != "image" else None,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
