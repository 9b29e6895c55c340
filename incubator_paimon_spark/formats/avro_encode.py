"""Vectorized Avro container encode: per-COLUMN cell byte production.

Mirror of avro_decode.py for the write path. Two generations:

- r12 compiled a per-ROW loop (schema-specialized codegen appending into a
  bytearray) — ~1.5 µs/cell, all interpreter dispatch.
- r15 replaces the row loop with per-COLUMN producers that materialize each
  cell's encoded bytes (union tag included) as a `bytes` object in a numpy
  object array, then assemble every block row-major with ONE C-level
  `b"".join(chain(zip(*columns)))` — no Python-level per-row loop at all.
  Producers, in priority order:
    1. dictionary route — any scalar column whose distinct count is small
       (arrow `dictionary_encode`, C hash pass) encodes each DISTINCT value
       once and fans cells out by fancy-indexing the LUT; nulls ride a
       sentinel LUT slot. TPC-H-shaped data (flags, dates, quantities,
       discounts) collapses almost entirely onto this path.
    2. type-specialized vector routes — zigzag varints batched by byte
       length with numpy shifts (ints/longs/temporals), fixed-width byte
       matrices (double/float/boolean), offset-sliced values buffers
       (string/bytes). Nulls handled by drop_null + scatter.
    3. generic per-cell fallback (decimal / array / map / record), the
       bytearray twin of avro_codec._encode_value.
  Measured on sf0.1 lineitem (600 K rows, 11 nullable fields): 5.2 s → 1.3 s
  for the encode, byte-identical container output (pinned by
  test_columnar_encoder_byte_identical_to_row_encoder).

Temporal columns are cast to raw int days/micros arrow-side, so no datetime
objects are ever materialized.

Parity: the reference encodes through a JVM row writer
(paimon-format/.../avro/AvroFileFormat.java:50, AvroRowDatumWriter); this
is the column-fed equivalent in Python+Arrow.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from decimal import Decimal
from itertools import chain

from .avro_codec import DEFLATE_LEVEL, MAGIC, SYNC, write_bytes, write_long

_pack_f = struct.Struct("<f").pack
_pack_d = struct.Struct("<d").pack


# ------------------------------------------------- generic cell fallback
def _enc_varint(buf: bytearray, v: int) -> None:
    n = (v << 1) ^ (v >> 63)
    while n > 0x7F:
        buf.append((n & 0x7F) | 0x80)
        n >>= 7
    buf.append(n)


def _enc_generic(buf: bytearray, typ, v) -> None:
    """bytearray twin of avro_codec._encode_value for complex cells."""
    if isinstance(typ, list):
        if v is None:
            _enc_varint(buf, typ.index("null"))
            return
        idx = 1 if typ[0] == "null" else 0
        _enc_varint(buf, idx)
        _enc_generic(buf, typ[idx], v)
        return
    if isinstance(typ, dict):
        t, lt = typ["type"], typ.get("logicalType")
        if lt in ("date", "timestamp-micros", "local-timestamp-micros"):
            _enc_varint(buf, int(v))  # columns pre-cast to raw ints
            return
        if lt == "decimal":
            unscaled = int(Decimal(v).scaleb(typ["scale"]))
            size = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(size, "big", signed=True)
            _enc_varint(buf, len(raw))
            buf += raw
            return
        if t == "array":
            if v:
                _enc_varint(buf, len(v))
                for item in v:
                    _enc_generic(buf, typ["items"], item)
            _enc_varint(buf, 0)
            return
        if t == "map":
            items = v.items() if isinstance(v, dict) else v
            if v:
                _enc_varint(buf, len(v))
                for k, val in items:
                    e = k.encode("utf-8")
                    _enc_varint(buf, len(e))
                    buf += e
                    _enc_generic(buf, typ["values"], val)
            _enc_varint(buf, 0)
            return
        if t == "record":
            for f in typ["fields"]:
                _enc_generic(buf, f["type"], v.get(f["name"])
                             if isinstance(v, dict) else getattr(v, f["name"]))
            return
        typ = t
    if typ == "null":
        return
    if typ == "boolean":
        buf.append(1 if v else 0)
    elif typ in ("int", "long"):
        _enc_varint(buf, int(v))
    elif typ == "float":
        buf += _pack_f(float(v))
    elif typ == "double":
        buf += _pack_d(float(v))
    elif typ == "bytes":
        b = bytes(v)
        _enc_varint(buf, len(b))
        buf += b
    elif typ == "string":
        e = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        _enc_varint(buf, len(e))
        buf += e
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _encode_one(typ, v, tag) -> bytes:
    buf = bytearray()
    if tag is not None:
        buf.append(tag)
    _enc_generic(buf, typ, v)
    return bytes(buf)


# ------------------------------------------- vectorized cell producers
def _varint_cells(vals, tag):
    """object ndarray of zigzag-varint cell bytes for an int64 numpy array
    with no nulls; `tag` (pre-zigzagged union byte) prepended when not None.
    Cells are produced in byte-length groups: numpy computes each group's
    (n, k) byte matrix with shifts/masks, one tobytes(), then equal-width
    slicing — no per-value Python arithmetic."""
    import numpy as np

    v = np.asarray(vals, np.int64)
    z = ((v.astype(np.uint64) << np.uint64(1))
         ^ (v >> np.int64(63)).astype(np.uint64))
    k = np.ones(len(z), np.int8)
    for kk in range(1, 10):
        k += (z >= (np.uint64(1) << np.uint64(7 * kk))).astype(np.int8)
    out = np.empty(len(z), object)
    pre = 0 if tag is None else 1
    for kk in np.unique(k):
        idx = np.flatnonzero(k == kk)
        sel = z[idx]
        kk = int(kk)
        w = kk + pre
        mat = np.empty((len(sel), w), np.uint8)
        if pre:
            mat[:, 0] = tag
        for j in range(kk):
            b = (sel >> np.uint64(7 * j)).astype(np.uint8) & np.uint8(0x7F)
            if j < kk - 1:
                b |= np.uint8(0x80)
            mat[:, pre + j] = b
        raw = mat.tobytes()
        out[idx] = [raw[i * w:(i + 1) * w] for i in range(len(sel))]
    return out


def _fixed_cells(payload_u8_2d, tag):
    """object ndarray of fixed-width cell bytes from an (n, w) uint8 numpy
    payload matrix (little-endian float/double bits or boolean bytes)."""
    import numpy as np

    n, wp = payload_u8_2d.shape
    pre = 0 if tag is None else 1
    w = wp + pre
    if pre:
        mat = np.empty((n, w), np.uint8)
        mat[:, 0] = tag
        mat[:, 1:] = payload_u8_2d
    else:
        mat = np.ascontiguousarray(payload_u8_2d)
    raw = mat.tobytes()
    out = np.empty(n, object)
    out[:] = [raw[i * w:(i + 1) * w] for i in range(n)]
    return out


def _scalar_vector_cells(arr, t, lt, tag):
    """Vector route for a null-free arrow array of a flat scalar type;
    returns object ndarray of cell bytes, or None if unsupported."""
    import numpy as np
    import pyarrow as pa

    if lt == "date":
        return _varint_cells(arr.cast(pa.int32()).cast(pa.int64()).to_numpy(),
                             tag)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        a = arr
        if a.type.unit != "us":
            a = a.cast(pa.timestamp("us", tz=a.type.tz))
        return _varint_cells(a.cast(pa.int64()).to_numpy(), tag)
    if lt is not None:
        return None
    if t in ("int", "long"):
        return _varint_cells(arr.cast(pa.int64()).to_numpy(), tag)
    if t == "double":
        vals = arr.to_numpy().astype("<f8", copy=False)
        return _fixed_cells(vals.view(np.uint8).reshape(len(arr), 8), tag)
    if t == "float":
        vals = arr.to_numpy().astype("<f4", copy=False)
        return _fixed_cells(vals.view(np.uint8).reshape(len(arr), 4), tag)
    if t == "boolean":
        vals = arr.to_numpy(zero_copy_only=False).astype(np.uint8)
        return _fixed_cells(vals.reshape(len(arr), 1), tag)
    if t in ("string", "bytes"):
        big = (pa.large_string() if t == "string" else pa.large_binary())
        a = arr.cast(big)
        offs = np.frombuffer(a.buffers()[1], np.int64,
                             len(a) + 1, a.offset * 8)
        data = a.buffers()[2]
        mv = memoryview(data) if data is not None else memoryview(b"")
        len_cells = _varint_cells(offs[1:] - offs[:-1], tag)
        out = np.empty(len(a), object)
        out[:] = [lc + mv[o0:o1].tobytes()
                  for lc, o0, o1 in zip(len_cells, offs[:-1], offs[1:])]
        return out
    return None


# cutoffs for the dictionary route: always worth it under 256 distincts,
# and up to n/4 (each distinct encoded once, cells are a C fancy-index)
_DICT_FLOOR = 256
_DICT_FRACTION = 4

_SCALAR_TS = ("int", "long", "float", "double", "boolean", "string", "bytes")


def column_cell_bytes(arr, ftype):
    """Arrow column -> numpy object ndarray of per-cell encoded bytes
    (union tag byte included when `ftype` is a nullable union; null cells
    are the tag-only bytes). Concatenating the cells of all columns
    row-major yields the exact byte stream the row encoder produces."""
    import numpy as np
    import pyarrow as pa

    arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
    if isinstance(ftype, list):
        null_idx = ftype.index("null")
        inner = next(x for x in ftype if x != "null")
        tag = (1 - null_idx) << 1
        null_cell = bytes([null_idx << 1])
    else:
        inner, tag, null_cell = ftype, None, None
    lt = inner.get("logicalType") if isinstance(inner, dict) else None
    t = inner["type"] if isinstance(inner, dict) else inner
    n = len(arr)
    flat_scalar = (t in _SCALAR_TS
                   and lt in (None, "date", "timestamp-micros",
                              "local-timestamp-micros"))

    if flat_scalar and n:
        # 1) dictionary route
        try:
            di = arr.dictionary_encode()
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            di = None
        if di is not None and len(di.dictionary) <= max(
                _DICT_FLOOR, n // _DICT_FRACTION):
            dvals = di.dictionary
            if lt == "date":
                dvals, enc_t = dvals.cast(pa.int32()), "long"
            elif lt is not None:
                dt = dvals.type
                if pa.types.is_timestamp(dt) and dt.unit != "us":
                    dvals = dvals.cast(pa.timestamp("us", tz=dt.tz))
                dvals, enc_t = dvals.cast(pa.int64()), "long"
            else:
                enc_t = inner
            lut = [_encode_one(enc_t, pv, tag) for pv in dvals.to_pylist()]
            lut.append(null_cell if null_cell is not None else b"")
            lut_arr = np.empty(len(lut), object)
            lut_arr[:] = lut
            idx = di.indices.fill_null(len(lut) - 1) \
                            .to_numpy(zero_copy_only=False)
            return lut_arr[idx.astype(np.int64, copy=False)]
        # 2) type-specialized vector routes
        if arr.null_count == 0:
            cells = _scalar_vector_cells(arr, t, lt, tag)
            if cells is not None:
                return cells
        elif null_cell is not None:
            mask = arr.is_null().to_numpy(zero_copy_only=False)
            sub = _scalar_vector_cells(arr.drop_null(), t, lt, tag)
            if sub is not None:
                cells = np.empty(n, object)
                cells[mask] = null_cell
                cells[np.flatnonzero(~mask)] = sub
                return cells

    # 3) generic per-cell fallback (decimal / array / map / record,
    #    or exotic arrow layouts)
    if lt == "date":
        arr = arr.cast(pa.int32())
    elif lt in ("timestamp-micros", "local-timestamp-micros"):
        if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
        arr = arr.cast(pa.int64())
    cells = np.empty(n, object)
    for i, v in enumerate(arr.to_pylist()):
        cells[i] = null_cell if v is None else _encode_one(inner, v, tag)
    return cells


def container_header_bytes(schema: dict, codec: str = "deflate") -> bytes:
    """The container file header: MAGIC + meta map + SYNC. A container is
    this header followed by any number of independent blocks, so parts
    encoded separately (encode_container_blocks) concatenate into one
    valid file."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    write_long(out, len(meta))
    for k, v in meta.items():
        write_bytes(out, k.encode("utf-8"))
        write_bytes(out, v)
    write_long(out, 0)
    out.write(SYNC)
    return out.getvalue()


def encode_container_blocks(tbl, schema: dict, codec: str = "deflate",
                            block_rows: int = 4096,
                            deflate_level: int = DEFLATE_LEVEL) -> bytes:
    """Encode a pyarrow Table into container BLOCK bytes (each block:
    row-count varint, byte-length varint, payload, SYNC) with the
    per-column vectorized cell encoder — no header."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    fields = schema["fields"]
    cols = [column_cell_bytes(tbl.column(f["name"]), f["type"])
            for f in fields]
    n_rows = tbl.num_rows
    out = io.BytesIO()
    join = b"".join
    start = 0
    while start < n_rows:
        end = min(start + block_rows, n_rows)
        data = join(chain.from_iterable(zip(*(c[start:end] for c in cols)))) \
            if cols else b""
        if codec == "deflate":
            # strip zlib header/checksum: raw deflate per spec
            data = zlib.compress(data, deflate_level)[2:-4]
        write_long(out, end - start)
        write_long(out, len(data))
        out.write(data)
        out.write(SYNC)
        start = end
    return out.getvalue()


def write_container_arrow(tbl, schema: dict, codec: str = "deflate",
                          block_rows: int = 4096,
                          deflate_level: int = DEFLATE_LEVEL) -> bytes:
    """Encode a pyarrow Table into one Avro container file (bytes) with the
    per-column vectorized cell encoder. Byte-identical framing and payload
    to avro_codec.write_container (same MAGIC/meta/SYNC/deflate)."""
    return (container_header_bytes(schema, codec)
            + encode_container_blocks(tbl, schema, codec, block_rows,
                                      deflate_level))
