"""Alternate transcript source #2: MessagePack event streams.

The reference's fluentd feed delivers events as MessagePackEventStream
batches through the same filter path
(test/plugin/test_filter_kubernetes_metadata.rb:727-777).  The engine
analog: a directory of binary files, each a concatenated stream of
msgpack-encoded turn maps, normalized to the canonical transcript Arrow
schema and flowing through the identical parse → enrich pipeline.

The codec below is a self-contained implementation of the public
MessagePack wire format (the subset these events need: maps, strings,
ints, nil, float64, and the ext -1 timestamp type) — the container has no
msgpack library and the format is simple enough that a dependency isn't
worth it.  Scale shape: ``read_binary_files`` keeps one file per block and
the decode is a stateless ``map_batches`` (CPU-bound, embarrassingly
parallel); Parquet remains the preferred scale format.
"""

from __future__ import annotations

import struct

import pyarrow as pa

# ---------------------------------------------------------------------------
# encoder (tests / fixtures)
# ---------------------------------------------------------------------------


def _pack_str(s: str, out: bytearray) -> None:
    b = s.encode("utf-8")
    n = len(b)
    if n < 32:
        out.append(0xA0 | n)
    elif n < 256:
        out += b"\xd9" + struct.pack(">B", n)
    else:
        out += b"\xda" + struct.pack(">H", n)
    out += b


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 128:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif -(2**31) <= v < 2**31:
        out += b"\xd2" + struct.pack(">i", v)
    else:
        out += b"\xd3" + struct.pack(">q", v)


def _pack_ts_us(us: int, out: bytearray) -> None:
    """msgpack timestamp ext (-1): 8-byte form (data64 = ns<<34 | seconds)
    while seconds fit 34 bits, else the spec's 12-byte timestamp96 form
    (uint32 nsec + int64 sec)."""
    s, rem_us = divmod(us, 1_000_000)
    if 0 <= s < (1 << 34):
        data64 = ((rem_us * 1000) << 34) | s
        out += b"\xd7\xff" + struct.pack(">Q", data64)
    else:
        out += b"\xc7\x0c\xff" + struct.pack(">Iq", rem_us * 1000, s)


def pack_event(d: dict, out: bytearray) -> None:
    assert len(d) < 16
    out.append(0x80 | len(d))
    for k, v in d.items():
        _pack_str(k, out)
        if v is None:
            out.append(0xC0)
        elif isinstance(v, bool):
            out.append(0xC3 if v else 0xC2)
        elif isinstance(v, int):
            _pack_int(v, out)
        elif isinstance(v, float):
            out += b"\xcb" + struct.pack(">d", v)
        elif isinstance(v, str):
            _pack_str(v, out)
        elif isinstance(v, tuple) and v[0] == "ts_us":
            _pack_ts_us(v[1], out)
        else:
            raise TypeError(f"unsupported msgpack value {type(v)}")


# ---------------------------------------------------------------------------
# streaming decoder
# ---------------------------------------------------------------------------


def _unpack(buf: bytes, pos: int):
    t = buf[pos]
    pos += 1
    if t < 0x80:  # positive fixint
        return t, pos
    if t >= 0xE0:  # negative fixint
        return t - 256, pos
    if 0xA0 <= t < 0xC0:  # fixstr
        n = t & 0x1F
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0x80 <= t < 0x90:  # fixmap
        d = {}
        for _ in range(t & 0x0F):
            k, pos = _unpack(buf, pos)
            v, pos = _unpack(buf, pos)
            d[k] = v
        return d, pos
    if t == 0xC0:
        return None, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if t == 0xD9:
        n = buf[pos]
        return buf[pos + 1 : pos + 1 + n].decode("utf-8"), pos + 1 + n
    if t == 0xDA:
        n = struct.unpack_from(">H", buf, pos)[0]
        return buf[pos + 2 : pos + 2 + n].decode("utf-8"), pos + 2 + n
    if t == 0xD2:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if t == 0xD3:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if t == 0xD7 and buf[pos] == 0xFF:  # fixext8 timestamp
        data64 = struct.unpack_from(">Q", buf, pos + 1)[0]
        ns = data64 >> 34
        s = data64 & 0x3_FFFF_FFFF
        return ("ts_us", s * 1_000_000 + ns // 1000), pos + 9
    if t == 0xC7 and buf[pos] == 0x0C and buf[pos + 1] == 0xFF:  # timestamp96
        ns, s = struct.unpack_from(">Iq", buf, pos + 2)
        return ("ts_us", s * 1_000_000 + ns // 1000), pos + 14
    raise ValueError(f"unsupported msgpack type byte 0x{t:02x} at {pos - 1}")


def unpack_stream(buf: bytes) -> list[dict]:
    """Decode a concatenated stream of msgpack maps (an event stream)."""
    out, pos = [], 0
    while pos < len(buf):
        obj, pos = _unpack(buf, pos)
        out.append(obj)
    return out


# ---------------------------------------------------------------------------
# Ray Data source / fixture writer
# ---------------------------------------------------------------------------


def write_transcripts_msgpack(table: pa.Table, out_dir: str,
                              rows_per_file: int = 8192) -> str:
    """Fixture writer: a transcript Arrow table → dir of .msgpack stream
    files (one concatenated map per turn)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    fidx = 0
    for start in range(0, n, rows_per_file):
        chunk = table.slice(start, rows_per_file)
        rows = chunk.to_pylist()
        out = bytearray()
        for r in rows:
            ts = r["ts"]
            r["ts"] = ("ts_us", int(ts.timestamp() * 1_000_000)
                       if hasattr(ts, "timestamp") else int(ts))
            pack_event(r, out)
        path = os.path.join(out_dir, f"events-{fidx:05d}.msgpack")
        with open(path + ".tmp", "wb") as f:
            f.write(bytes(out))
        os.replace(path + ".tmp", path)
        fidx += 1
    return out_dir


def _decode_batch(batch: pa.Table) -> pa.Table:
    """binary-file rows → canonical transcript rows."""
    from .. import datagen as dg

    convs, turns, roles, texts, tools, tss = [], [], [], [], [], []
    for buf in batch.column("bytes").to_pylist():
        for ev in unpack_stream(buf):
            convs.append(ev["conv_id"])
            turns.append(ev["turn_idx"])
            roles.append(ev["role"])
            texts.append(ev["text"])
            tools.append(ev["tool"])
            ts = ev["ts"]
            tss.append(ts[1] if isinstance(ts, tuple) else int(ts))
    return pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
        },
        schema=dg.TRANSCRIPT_SCHEMA,
    )


def read_transcripts_msgpack(path: str):
    """Dir of .msgpack event-stream files → Dataset with the canonical
    transcript schema, ready for the parse → enrich pipeline."""
    import ray.data

    ds = ray.data.read_binary_files(path, file_extensions=["msgpack"])
    return ds.map_batches(_decode_batch, batch_format="pyarrow")
