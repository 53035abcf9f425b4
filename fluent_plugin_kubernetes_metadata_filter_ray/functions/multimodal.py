"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted by an actor-pool ``map_batches`` stage.

The container has no image/audio libraries, so the real decoders are STUBS
(clearly marked, gated behind import-try + ``NotImplementedError``); the
deterministic fake decoder stands in so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and oracle-tested:
every fake field is pure arithmetic over the payload bytes with an exact
DuckDB twin.

Derived media table (no external data): payload = utf8 bytes of the document
text, media_type cycles image/audio/video by doc_id % 3.

Scale notes: binary payloads dominate block size ⇒ media stages use a small
``batch_size`` so batch × concurrency fits the worker heap; decode is a
callable CLASS so a real model/codec loads once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import corpus as cp

MEDIA_TYPES = ("image", "audio", "video")
MEDIA_BATCH_SIZE = 1024  # small: payload-heavy rows


def media_from_documents(batch: pa.Table) -> pa.Table:
    """documents → media(doc_id, media_type, payload binary, n_bytes)."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = batch.column("text")
    payload = text.cast(pa.binary())
    mt = np.asarray(MEDIA_TYPES, dtype=object)[ids % 3]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "media_type": pa.array(mt, pa.string()),
            "payload": payload,
            "n_bytes": pc.binary_length(payload).cast(pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool decode / feature-extract stage.

    ``use_real_codecs=True`` attempts the real decode path (PIL / soundfile /
    av) — unavailable in this container, so it raises ``NotImplementedError``
    with a clear message.  The default deterministic fake derives typed
    metadata from the payload bytes only.
    """

    def __init__(self, use_real_codecs: bool = False):
        self.real = None
        if use_real_codecs:
            try:  # pragma: no cover - codec libs absent in this environment
                import PIL.Image  # noqa: F401

                self.real = "pil"
            except ImportError as e:
                raise NotImplementedError(
                    "real media decoding requires image/audio codec libraries "
                    "(PIL/soundfile/av) which are not installed; run with "
                    "use_real_codecs=False for the deterministic fake decoder"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mt = batch.column("media_type").to_pylist()
        payload = batch.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        # n_bytes is computed upstream by media_from_documents — reuse it
        # (vectorized kernel fallback if a caller feeds a payload-only table)
        if "n_bytes" in batch.column_names:
            n_bytes_col = batch.column("n_bytes")
        else:
            n_bytes_col = pc.binary_length(payload).cast(pa.int64())

        # deterministic fake decode: md5-derived feature + shape metadata
        # (one pass over the buffers; md5 itself is C-speed hashlib).
        # Null payloads (hostile rows) get null feature/metadata — no crash.
        pl = payload.to_pylist()
        valid = np.fromiter((v is not None for v in pl), dtype=bool, count=len(pl))
        fp32 = np.fromiter(
            (0 if v is None else int.from_bytes(hashlib.md5(v).digest()[:4], "big")
             for v in pl),
            dtype=np.int64, count=len(ids),
        )
        feat = fp32 / 2**32  # uint32 / 2^32 — exact in float64 on both sides

        nb = np.nan_to_num(
            n_bytes_col.to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        ).astype(np.int64)
        is_img = np.asarray([m == "image" for m in mt])
        is_aud = np.asarray([m == "audio" for m in mt])
        width = np.where(is_img, 64 + nb % 961, -1)
        height = np.where(is_img, 64 + (nb * 31) % 961, -1)
        duration_ms = np.where(is_aud, 1000 + (nb * 17) % 59000, -1)
        n_frames = np.where(~is_img & ~is_aud, 1 + nb % 240, -1)

        invalid = ~valid
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": n_bytes_col,
                "width": pa.array(width.astype(np.int64), mask=invalid),
                "height": pa.array(height.astype(np.int64), mask=invalid),
                "duration_ms": pa.array(duration_ms.astype(np.int64), mask=invalid),
                "n_frames": pa.array(n_frames.astype(np.int64), mask=invalid),
                "feat": pa.array(feat, pa.float64(), mask=invalid),
            }
        )


def q_media_decode(sf_dir: str):
    """documents → media table → actor-pool decode with typed output."""
    ds = cp.read_documents(sf_dir)
    media = ds.map_batches(
        media_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"use_real_codecs": False},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
        zero_copy_batch=True,
    )


def media_decode_oracle_sql() -> str:
    w32 = cp.SQL_W32.format(s="text")
    return f"""
WITH m AS (
  SELECT doc_id, text,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    octet_length(text::BLOB)::BIGINT AS n_bytes
  FROM documents
)
SELECT doc_id, media_type, n_bytes,
  CASE WHEN media_type = 'image' THEN 64 + n_bytes % 961 ELSE -1 END AS width,
  CASE WHEN media_type = 'image' THEN 64 + (n_bytes * 31) % 961 ELSE -1 END AS height,
  CASE WHEN media_type = 'audio' THEN 1000 + (n_bytes * 17) % 59000 ELSE -1 END AS duration_ms,
  CASE WHEN media_type NOT IN ('image', 'audio') THEN 1 + n_bytes % 240 ELSE -1 END AS n_frames,
  {w32}::DOUBLE / 4294967296 AS feat
FROM m
""".strip()
