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


# ---------------------------------------------------------------------------
# REAL decode path (VERDICT r2 task 5): PNG / JPEG header parsing is pure
# byte arithmetic — no codec library — so this decoder is NOT a fake: it
# reads actual container bytes (signature, IHDR chunk, SOF marker scan) and
# any malformed payload yields null dims instead of a crash.  The payloads
# are real minimal PNG/JPEG files generated deterministically from doc_id
# (struct + zlib CRC32/compress — stdlib only), so the DuckDB twin can
# compute the EXPECTED dims from the generation formula while the engine
# must genuinely parse the bytes to agree.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colour type → samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# SOF markers carrying frame dims: C0-CF except DHT(C4)/JPG(C8)/DAC(CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_png_header(b: bytes):
    """(width, height, channels) from a PNG's IHDR, or None if not PNG."""
    import struct

    if len(b) < 29 or b[:8] != _PNG_SIG or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    channels = _PNG_CHANNELS.get(b[25])
    if channels is None:
        return None
    return w, h, channels


def parse_jpeg_header(b: bytes):
    """(width, height, channels) from a JPEG's first SOF marker, or None."""
    import struct

    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 10 > len(b):  # need dims (i+5..i+9) AND ncomp (b[i+9])
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h, b[i + 9]
        i += 2 + seg_len
    return None


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_payload(width: int, height: int) -> bytes:
    """A real, spec-valid 8-bit RGB PNG of the given dims (zero pixels)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (3 * width)) * height  # filter byte + RGB row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 1))
        + _png_chunk(b"IEND", b"")
    )


def jpeg_payload(width: int, height: int) -> bytes:
    """A minimal JPEG container: SOI + APP0/JFIF + SOF0 (3 components) +
    EOI — a real marker stream whose header parse yields the dims."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof_data = b"\x08" + struct.pack(">HH", height, width) + b"\x03" \
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_data)) + sof_data
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


_GIF_SIGS = (b"GIF87a", b"GIF89a")


def parse_gif_header(b: bytes):
    """(width, height, channels) from a GIF's logical screen descriptor,
    or None if not GIF.  Dims are little-endian uint16 at offsets 6/8
    (GIF89a spec §18); pixels index an RGB palette → 3 channels."""
    if len(b) < 13 or b[:6] not in _GIF_SIGS:
        return None
    w = b[6] | (b[7] << 8)
    h = b[8] | (b[9] << 8)
    if w == 0 or h == 0:
        return None
    return w, h, 3


def gif_payload(width: int, height: int) -> bytes:
    """A real GIF89a container: signature + logical screen descriptor +
    2-entry global color table + image descriptor + minimal LZW stream
    (clear, end) + trailer.  Header-complete and marker-valid; the pixel
    stream is intentionally empty (the header parsers never decode
    pixels — same contract as jpeg_payload's missing scan data)."""
    import struct

    lsd = struct.pack("<HH", width, height) + b"\x80\x00\x00"  # GCT, 2 entries
    gct = b"\x00\x00\x00\xff\xff\xff"
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    # LZW min code size 2; one sub-block holding CLEAR(4) then END(5)
    lzw = b"\x02\x02\x44\x01\x00"
    return _GIF_SIGS[1] + lsd + gct + img + lzw + b"\x3b"


# dims derive from doc_id so the SQL twin can state the expectation
def _dims_for(doc_id: int) -> tuple[int, int]:
    return 1 + doc_id % 64, 1 + (doc_id * 7) % 64


CORRUPT_MOD = 13  # doc_id % 13 == 0 → garbage payload (parser failure path)


def media_bytes_from_documents(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, payload binary): REAL container bytes —
    doc_id % 3 picks PNG / JPEG / GIF; doc_id % CORRUPT_MOD == 0 garbage
    (the text's utf8 bytes, which parse as none of the three)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = batch.column("text").to_pylist()
    makers = (png_payload, jpeg_payload, gif_payload)
    payloads = []
    for i, d in enumerate(ids):
        d = int(d)
        if d % CORRUPT_MOD == 0:
            payloads.append((text[i] or "").encode())
        else:
            w, h = _dims_for(d)
            payloads.append(makers[d % 3](w, h))
    return pa.table(
        {"doc_id": batch.column("doc_id"), "payload": pa.array(payloads, pa.binary())}
    )


class HeaderDecoder:
    """Actor-pool stage: sniff + parse REAL image container bytes.  Output
    dims are null when neither parser accepts the payload — hostile bytes
    degrade, never crash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = batch.column("payload").to_pylist()
        n = len(pl)
        fmt = np.empty(n, dtype=object)
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        ch = np.zeros(n, dtype=np.int64)
        bad = np.zeros(n, dtype=bool)
        for i, b in enumerate(pl):
            parsed = None
            if b is not None:
                for name, parse in (
                    ("png", parse_png_header),
                    ("jpeg", parse_jpeg_header),
                    ("gif", parse_gif_header),
                ):
                    parsed = parse(b)
                    if parsed is not None:
                        fmt[i] = name
                        break
            if parsed is None:
                fmt[i] = "raw"
                bad[i] = True
            else:
                w[i], h[i], ch[i] = parsed
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fmt": pa.array(fmt, pa.string()),
                "width": pa.array(w, mask=bad),
                "height": pa.array(h, mask=bad),
                "channels": pa.array(ch, mask=bad),
            }
        )


def q_media_dims(sf_dir: str):
    """Real (non-fake) media decode: generate actual PNG/JPEG containers,
    then parse their headers in an actor-pool stage.  Same Ray shape as
    q_media_decode (binary payloads → small batches → callable class)."""
    media = cp.read_documents(sf_dir).map_batches(
        media_bytes_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        HeaderDecoder,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
        zero_copy_batch=True,
    )


def media_dims_oracle_sql() -> str:
    return f"""
SELECT doc_id,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN 'raw'
       WHEN doc_id % 3 = 0 THEN 'png'
       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE (1 + doc_id % 64) END::BIGINT AS width,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE (1 + (doc_id * 7) % 64) END::BIGINT AS height,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL ELSE 3 END::BIGINT AS channels
FROM documents
""".strip()


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


# ---------------------------------------------------------------------------
# REAL audio path: WAV/RIFF header parsing — byte arithmetic only (no codec
# library), same contract as the PNG/JPEG/GIF parsers above: payloads are
# real spec-valid RIFF containers generated from doc_id, the engine must
# genuinely walk the chunk list to agree with the SQL twin's generation
# formula, and malformed bytes degrade to nulls.
# ---------------------------------------------------------------------------

WAV_RATES = (8000, 16000, 22050, 44100)


def wav_payload(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """A real 16-bit PCM WAV container (RIFF + fmt + data, silence)."""
    import struct

    bits = 16
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(b: bytes):
    """(sample_rate, channels, bits, n_samples) from a RIFF/WAVE chunk walk,
    or None if the bytes are not a parseable PCM WAV."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    sr = ch = bits = block_align = None
    n_samples = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and clen >= 16 and i + 8 + 16 <= len(b):
            _fmt, ch, sr, _br, block_align, bits = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
        elif cid == b"data":
            if block_align in (None, 0):
                return None  # data before fmt, or degenerate fmt
            n_samples = clen // block_align
        i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if sr in (None, 0) or ch in (None, 0) or n_samples is None:
        return None
    return sr, ch, bits, n_samples


def audio_bytes_from_documents(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, payload): REAL WAV bytes with doc_id-derived
    params; doc_id % CORRUPT_MOD == 0 → garbage (the text's utf8 bytes)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = batch.column("text").to_pylist()
    payloads = []
    for i, d in enumerate(ids):
        d = int(d)
        if d % CORRUPT_MOD == 0:
            payloads.append((text[i] or "").encode())
        else:
            payloads.append(
                wav_payload(WAV_RATES[d % 4], 1 + d % 2, 1 + (d * 13) % 256)
            )
    return pa.table(
        {"doc_id": batch.column("doc_id"), "payload": pa.array(payloads, pa.binary())}
    )


class WavDecoder:
    """Actor-pool stage: parse REAL WAV containers; hostile bytes → nulls."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = batch.column("payload").to_pylist()
        n = len(pl)
        sr = np.zeros(n, dtype=np.int64)
        ch = np.zeros(n, dtype=np.int64)
        bits = np.zeros(n, dtype=np.int64)
        ns = np.zeros(n, dtype=np.int64)
        bad = np.zeros(n, dtype=bool)
        for i, b in enumerate(pl):
            parsed = parse_wav_header(b) if b is not None else None
            if parsed is None:
                bad[i] = True
            else:
                sr[i], ch[i], bits[i], ns[i] = parsed
        dur = np.where(sr > 0, ns * 1000 // np.where(sr > 0, sr, 1), 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sample_rate": pa.array(sr, mask=bad),
                "channels": pa.array(ch, mask=bad),
                "bits": pa.array(bits, mask=bad),
                "n_samples": pa.array(ns, mask=bad),
                "duration_ms": pa.array(dur.astype(np.int64), mask=bad),
            }
        )


def q_media_audio(sf_dir: str):
    """Real audio decode plumbing: generate actual WAV containers, parse
    their headers in an actor-pool stage (binary payloads → small batches
    → callable class — the q_media_dims shape for the audio modality)."""
    media = cp.read_documents(sf_dir).map_batches(
        audio_bytes_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        WavDecoder,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
        zero_copy_batch=True,
    )


def media_audio_oracle_sql() -> str:
    rates = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN {r}" for i, r in enumerate(WAV_RATES)
    ) + " END"
    return f"""
SELECT doc_id,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE ({rates}) END::BIGINT AS sample_rate,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE (1 + doc_id % 2) END::BIGINT AS channels,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL ELSE 16 END::BIGINT AS bits,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE (1 + (doc_id * 13) % 256) END::BIGINT AS n_samples,
  CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN NULL
       ELSE ((1 + (doc_id * 13) % 256) * 1000) // ({rates}) END::BIGINT
    AS duration_ms
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# Media corruption report: per-format decodable vs malformed counts over
# the real-container header decode — the ingest-health summary a
# multimodal pipeline publishes per crawl (a format whose malformed rate
# jumps means a broken exporter upstream).  Pure combiner over the
# q_media_dims output (≤ formats rows per batch).
# ---------------------------------------------------------------------------

_MCR_SENT = "\x00\x00mcr-sent"


def q_media_corrupt_report(sf_dir: str):
    """(fmt, n_media, n_decoded, n_malformed, malformed_frac) from the
    header-decode stage; malformed = headers that failed to parse."""
    import pandas as pd
    import pyarrow.compute as pc_
    import ray.data as rd
    from ray.data.aggregate import Sum

    dims = q_media_dims(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        fmt = pd.Series(t.column("fmt").to_pandas())
        ok = pc_.is_valid(t.column("width")).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"fmt": fmt, "ok": ok.astype("int64")})
            .groupby("fmt", sort=False)
            .agg(n_media=("ok", "size"), n_decoded=("ok", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "fmt": pa.array(g["fmt"].to_numpy(dtype=object), pa.string()),
                "n_media": pa.array(g["n_media"].to_numpy(dtype="int64")),
                "n_decoded": pa.array(g["n_decoded"].to_numpy(dtype="int64")),
            }
        )

    agg = (
        dims.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {
                "fmt": pa.array([_MCR_SENT], pa.string()),
                "n_media": pa.array([0], pa.int64()),
                "n_decoded": pa.array([0], pa.int64()),
            }
        )))
        .groupby("fmt")
        .aggregate(
            Sum("n_media", alias_name="n_media"),
            Sum("n_decoded", alias_name="n_decoded"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.not_equal(t.column("fmt"), _MCR_SENT))
        nm = t.column("n_media").to_numpy(zero_copy_only=False).astype("int64")
        nd = t.column("n_decoded").to_numpy(zero_copy_only=False).astype("int64")
        bad = nm - nd
        import numpy as np

        frac = np.where(nm > 0, bad.astype("float64") / np.where(nm > 0, nm, 1), 0.0)
        return pa.table(
            {
                "fmt": t.column("fmt"),
                "n_media": pa.array(nm),
                "n_decoded": pa.array(nd),
                "n_malformed": pa.array(bad),
                "malformed_frac": pa.array(frac),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def media_corrupt_report_oracle_sql() -> str:
    return f"""
WITH md AS ({media_dims_oracle_sql()})
SELECT fmt, count(*)::BIGINT AS n_media,
  sum(CASE WHEN width IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_decoded,
  sum(CASE WHEN width IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_malformed,
  CASE WHEN count(*) > 0
       THEN sum(CASE WHEN width IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)
       ELSE 0.0 END AS malformed_frac
FROM md GROUP BY fmt
""".strip()


# ---------------------------------------------------------------------------
# T88: exact media dedup — byte-level blob dedup over the multimodal column
# (the image/audio baseline every multimodal pipeline runs before any
# perceptual hashing): keep the smallest doc_id per distinct
# (media_type, payload bytes), report group sizes.  Hashes the PAYLOAD
# BYTES (the real operation on opaque blobs); the oracle computes
# md5(text), which is byte-identical because the derived media payload IS
# the utf8 text bytes (media_from_documents).
# ---------------------------------------------------------------------------

_MDD_SENT = "\x00\x00mdd-sent"


def _media_hash_batch(batch: pa.Table) -> pa.Table:
    import pandas as pd

    media = media_from_documents(batch)
    payload = media.column("payload").to_pylist()
    # md5 once per DISTINCT payload (factorize + gather, the rawlog-tag
    # pattern): duplicate blobs are the whole point of this op
    codes, uniq = pd.factorize(pd.Series(payload), use_na_sentinel=True)
    hu = [hashlib.md5(p).hexdigest() for p in uniq]
    h = pa.array(
        [None if c < 0 else hu[c] for c in codes],
        pa.string(),
    )
    t = pa.table(
        {
            "media_type": media.column("media_type"),
            "payload_hash": h,
            "doc_id": media.column("doc_id"),
        }
    )
    import pyarrow.compute as pc

    return t.filter(pc.is_valid(t.column("payload_hash")))


def q_media_dedup(sf_dir: str):
    """Exact duplicate media blobs: min doc_id + count per distinct
    (media_type, payload).  Null payloads excluded (nothing to dedup)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.aggregate import Count, Min

    agg = (
        cp.read_documents(sf_dir)
        .map_batches(_media_hash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(pa.table(
            {
                "media_type": pa.array([_MDD_SENT], pa.string()),
                "payload_hash": pa.array([_MDD_SENT], pa.string()),
                "doc_id": pa.array([-1], pa.int64()),
            }
        )))
        .groupby(["media_type", "payload_hash"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("media_type"), _MDD_SENT)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def media_dedup_oracle_sql() -> str:
    return f"""
SELECT
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
    AS media_type,
  md5(text) AS payload_hash,
  min(doc_id) AS doc_id,
  count(*)::BIGINT AS n_dups
FROM documents WHERE text IS NOT NULL
GROUP BY 1, 2
""".strip()
