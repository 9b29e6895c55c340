"""Vectorized Avro container decode: schema-specialized codegen → arrow.

The generic row decoder in avro_codec.py (`_decode_value`) pays per-cell
prices that dominate the read path: a BytesIO ``read(1)`` per varint byte,
recursive isinstance dispatch per value, a dict per row, and a
``r.get(col)`` per cell to pivot rows into columns. This module removes
all four: for each distinct writer schema it COMPILES a block decoder —
a single Python function with the varint loop inlined over a plain
``bytes`` object and an integer offset — that appends straight into
per-column lists. Temporal/logical values stay as raw ints in the loop
and become arrow arrays via one vectorized cast at the end, so no
datetime objects are materialized per cell.

Complex fields (array/map/record/decimal) fall back to an offset-based
generic decoder per cell; flat primitive columns (the common shape for
data files) never leave the generated loop.

Parity: the reference decodes Avro with a JVM columnar row reader
(paimon-format/src/main/java/org/apache/paimon/format/avro/
AvroFileFormat.java:50, AvroBulkFormat.java); this is the equivalent
"decode a block into column vectors" design expressed in Python+Arrow.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

from .avro_codec import MAGIC, avro_type_to_arrow, read_bytes, read_long

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1)
_EPOCH_DT_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)

_unpack_f = struct.Struct("<f").unpack_from
_unpack_d = struct.Struct("<d").unpack_from


# ------------------------------------------------- generic offset decoder
def _read_varint(data: bytes, pos: int):
    b = data[pos]
    pos += 1
    if b < 0x80:
        acc = b
    else:
        acc = b & 0x7F
        sh = 7
        b = data[pos]
        pos += 1
        while b >= 0x80:
            acc |= (b & 0x7F) << sh
            sh += 7
            b = data[pos]
            pos += 1
        acc |= b << sh
    return (acc >> 1) ^ -(acc & 1), pos


def _dec_generic(data: bytes, pos: int, typ):
    """Offset-based equivalent of avro_codec._decode_value — the per-cell
    fallback for complex types inside a compiled block decoder."""
    if isinstance(typ, list):
        idx, pos = _read_varint(data, pos)
        return _dec_generic(data, pos, typ[idx])
    if isinstance(typ, dict):
        t, lt = typ["type"], typ.get("logicalType")
        if lt == "date":
            n, pos = _read_varint(data, pos)
            return _EPOCH_DATE + timedelta(days=n), pos
        if lt == "timestamp-micros":
            n, pos = _read_varint(data, pos)
            return _EPOCH_DT_UTC + timedelta(microseconds=n), pos
        if lt == "local-timestamp-micros":
            n, pos = _read_varint(data, pos)
            return _EPOCH_DT + timedelta(microseconds=n), pos
        if lt == "decimal":
            ln, pos = _read_varint(data, pos)
            raw = data[pos:pos + ln]
            pos += ln
            return (Decimal(int.from_bytes(raw, "big", signed=True))
                    .scaleb(-typ["scale"])), pos
        if t == "array":
            out = []
            while True:
                n, pos = _read_varint(data, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _sz, pos = _read_varint(data, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _dec_generic(data, pos, typ["items"])
                    out.append(v)
        if t == "map":
            out = {}
            while True:
                n, pos = _read_varint(data, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _sz, pos = _read_varint(data, pos)
                    n = -n
                for _ in range(n):
                    ln, pos = _read_varint(data, pos)
                    k = data[pos:pos + ln].decode("utf-8")
                    pos += ln
                    out[k], pos = _dec_generic(data, pos, typ["values"])
        if t == "record":
            out = {}
            for f in typ["fields"]:
                out[f["name"]], pos = _dec_generic(data, pos, f["type"])
            return out, pos
        typ = t
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return data[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _read_varint(data, pos)
    if typ == "float":
        return _unpack_f(data, pos)[0], pos + 4
    if typ == "double":
        return _unpack_d(data, pos)[0], pos + 8
    if typ == "bytes":
        ln, pos = _read_varint(data, pos)
        return data[pos:pos + ln], pos + ln
    if typ == "string":
        ln, pos = _read_varint(data, pos)
        return data[pos:pos + ln].decode("utf-8"), pos + ln
    raise ValueError(f"unsupported avro type {typ!r}")


# ----------------------------------------------------------- codegen
_VARINT_TMPL = """\
{ind}b = data[pos]; pos += 1
{ind}if b < 0x80:
{ind}    acc = b
{ind}else:
{ind}    acc = b & 0x7F; sh = 7
{ind}    b = data[pos]; pos += 1
{ind}    while b >= 0x80:
{ind}        acc |= (b & 0x7F) << sh; sh += 7
{ind}        b = data[pos]; pos += 1
{ind}    acc |= b << sh
{ind}{dst} = (acc >> 1) ^ -(acc & 1)
"""


def _varint(ind: str, dst: str) -> str:
    return _VARINT_TMPL.format(ind=ind, dst=dst)


def _prim_code(typ, ind: str, append: str):
    """Generated statements decoding one non-null cell of `typ` and
    appending it via `append`(value). Returns None when the type needs
    the generic fallback."""
    lt = typ.get("logicalType") if isinstance(typ, dict) else None
    t = typ["type"] if isinstance(typ, dict) else typ
    if lt is not None and lt not in ("date", "timestamp-micros",
                                     "local-timestamp-micros"):
        return None  # decimal etc. → generic fallback
    if lt in ("date", "timestamp-micros", "local-timestamp-micros") \
            or t in ("int", "long"):
        # temporal logicals stay as raw ints; arrow cast happens per block
        return _varint(ind, "v") + f"{ind}{append}(v)\n"
    if t == "boolean":
        return f"{ind}{append}(data[pos] == 1); pos += 1\n"
    if t == "float":
        return f"{ind}{append}(_unpack_f(data, pos)[0]); pos += 4\n"
    if t == "double":
        return f"{ind}{append}(_unpack_d(data, pos)[0]); pos += 8\n"
    if t == "string":
        return (_varint(ind, "ln")
                + f"{ind}{append}(data[pos:pos+ln].decode()); pos += ln\n")
    if t == "bytes":
        return (_varint(ind, "ln")
                + f"{ind}{append}(data[pos:pos+ln]); pos += ln\n")
    if t == "null":
        return f"{ind}{append}(None)\n"
    return None  # decimal / array / map / record → generic fallback


def _field_code(i: int, ftype) -> str:
    """Statements for one field of the row record."""
    append = f"a{i}"
    if isinstance(ftype, list):  # union — engine only writes ["null", X]
        null_idx = ftype.index("null")
        inner = next(t for t in ftype if t != "null")
        body = _prim_code(inner, "        ", append)
        if body is None:
            # tag already consumed above — decode the INNER type only
            body = (f"        v, pos = _dec_generic(data, pos, FTI{i})\n"
                    f"        {append}(v)\n")
        return (_varint("    ", "tag")
                + f"    if tag == {null_idx}:\n"
                + f"        {append}(None)\n"
                + "    else:\n"
                + body)
    body = _prim_code(ftype, "    ", append)
    if body is None:
        body = (f"    v, pos = _dec_generic(data, pos, FT{i})\n"
                f"    {append}(v)\n")
    return body


_DECODER_CACHE: dict[str, tuple] = {}


def _arrow_builder(ftype, pa):
    """-> (arrow_type, build(list)->array). Temporal ints are cast
    vectorized; everything else goes through pa.array with the exact
    type so no inference drift."""
    at, _n = avro_type_to_arrow(ftype)
    inner = ftype
    if isinstance(inner, list):
        inner = next(t for t in inner if t != "null")
    lt = inner.get("logicalType") if isinstance(inner, dict) else None
    if lt == "date":
        return at, lambda lst: pa.array(lst, pa.int32()).cast(at)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        return at, lambda lst: pa.array(lst, pa.int64()).cast(at)
    return at, lambda lst: pa.array(lst, at)


def compile_decoder(schema: dict):
    """Writer record schema -> (decode_block, fields, builders).

    decode_block(data, pos, n, cols) decodes n rows starting at pos,
    appending each field's cells to cols[i]; returns the end offset.
    """
    key = json.dumps(schema, sort_keys=True)
    hit = _DECODER_CACHE.get(key)
    if hit is not None:
        return hit
    fields = schema["fields"]
    src = io.StringIO()
    src.write("def decode_block(data, pos, n, cols):\n")
    for i in range(len(fields)):
        src.write(f"    a{i} = cols[{i}].append\n")
    src.write("    for _ in range(n):\n")
    for i, f in enumerate(fields):
        for line in _field_code(i, f["type"]).splitlines():
            src.write("    " + line + "\n")
    src.write("    return pos\n")
    env = {"_dec_generic": _dec_generic, "_unpack_f": _unpack_f,
           "_unpack_d": _unpack_d}
    for i, f in enumerate(fields):
        ft = f["type"]
        env[f"FT{i}"] = ft
        if isinstance(ft, list):
            env[f"FTI{i}"] = next(t for t in ft if t != "null")
    exec(compile(src.getvalue(), f"<avro-decoder>", "exec"), env)
    out = (env["decode_block"], fields)
    _DECODER_CACHE[key] = out
    return out


# ----------------------------------------------------------- container
def parse_header(buf: io.BytesIO):
    """-> (schema_dict, codec_str, sync_bytes); buf left at first block."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro container file")
    meta = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    return schema, codec, sync


def _project_table(tbl, target_arrow_schema):
    """Project a decoded table onto `target_arrow_schema` (missing
    fields → null columns), matching the old row-path semantics."""
    import pyarrow as pa

    if target_arrow_schema is None:
        return tbl
    have = set(tbl.column_names)
    n_rows = tbl.num_rows
    out = []
    for tf in target_arrow_schema:
        if tf.name in have:
            arr = tbl.column(tf.name)
            if arr.type != tf.type:
                arr = arr.cast(tf.type)
        else:
            arr = pa.nulls(n_rows, tf.type)
        out.append(arr)
    return pa.Table.from_arrays(out, schema=target_arrow_schema)


def _finish_native(fields, block_arrays, target_arrow_schema):
    """Per-block array lists (native decode) -> projected pyarrow Table."""
    import pyarrow as pa

    from .avro_codec import avro_type_to_arrow

    names = [f["name"] for f in fields]
    if block_arrays:
        cols = [pa.chunked_array([b[i] for b in block_arrays])
                for i in range(len(fields))]
    else:
        cols = [pa.chunked_array([], type=avro_type_to_arrow(f["type"])[0])
                for f in fields]
    return _project_table(pa.Table.from_arrays(cols, names=names),
                          target_arrow_schema)


def _finish_table(fields, cols, target_arrow_schema):
    """Decoded per-field cell lists -> pyarrow Table (projected onto
    `target_arrow_schema` when given: missing fields → null columns)."""
    import pyarrow as pa

    arrays, names = [], []
    for f, col in zip(fields, cols):
        at, build = _arrow_builder(f["type"], pa)
        names.append(f["name"])
        arrays.append(build(col))
    return _project_table(pa.Table.from_arrays(arrays, names=names),
                          target_arrow_schema)


def read_container_arrow(data: bytes, target_arrow_schema=None):
    """Decode a whole container file into one pyarrow Table using the
    schema-compiled block decoder. If `target_arrow_schema` is given the
    result carries exactly those columns/types (missing fields → null
    columns), matching the old row-path semantics."""
    from .avro_native import native_block_decoder

    buf = io.BytesIO(data)
    schema, codec, sync = parse_header(buf)
    nd = native_block_decoder(schema)
    if nd is None:
        decode_block, fields = compile_decoder(schema)
        cols = [[] for _ in fields]
    else:
        fields, blocks = schema["fields"], []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        if nd is not None:
            blocks.append(nd.decode_block(block, n))
        else:
            end = decode_block(block, 0, n, cols)
            if end != len(block):
                raise ValueError("avro block under/over-read "
                                 f"({end} of {len(block)} bytes)")
        if buf.read(16) != sync:
            raise ValueError("avro block sync mismatch")
    if nd is not None:
        return _finish_native(fields, blocks, target_arrow_schema)
    return _finish_table(fields, cols, target_arrow_schema)


def read_container_arrow_split(fh, start: int, end: int,
                               target_arrow_schema=None):
    """Decode the blocks of one container whose START offset lies in
    [start, end) — Hadoop-style sync-marker splitting, so one large
    container file scans with task parallelism. `fh` is a seekable binary
    file; only the header plus this split's byte range (and any block
    overrunning `end`) is read.

    Ownership rule: a block starts right after the header (offset
    `header_end`) or right after a 16-byte sync marker. A split owns the
    blocks starting at s with start <= s < end, so consecutive ranges
    [0,x),[x,N) partition the file's blocks exactly. A block that merely
    STRADDLES `end` belongs to the split holding its start and is read
    past `end`. Finding block starts from mid-file scans for the sync
    marker (the spec's own split design; a payload byte-collision with
    the 16-byte marker is ~2^-128 per position and surfaces as a loud
    sync/size mismatch, not silent corruption)."""
    # header: need schema/codec/sync whatever the range; headers are
    # usually < 1 KB — start with 64 KB and double on short reads
    fh.seek(0)
    prefix = fh.read(1 << 16)
    while True:
        try:
            buf = io.BytesIO(prefix)
            schema, codec, sync = parse_header(buf)
            header_end = buf.tell()
            if len(sync) == 16 and len(prefix) >= header_end:
                break
        except Exception:
            pass
        more = fh.read(max(len(prefix), 1 << 16))
        if not more:
            raise ValueError("avro container header truncated")
        prefix += more
    from .avro_native import native_block_decoder

    nd = native_block_decoder(schema)
    if nd is None:
        decode_block, fields = compile_decoder(schema)
        cols = [[] for _ in fields]
    else:
        fields, blocks = schema["fields"], []

    def _finish():
        if nd is not None:
            return _finish_native(fields, blocks, target_arrow_schema)
        return _finish_table(fields, cols, target_arrow_schema)

    if start <= header_end:
        pos = header_end
    else:
        # first owned block starts at q+16 for the first sync marker q
        # found at/after start-16; scanning past end-17 cannot yield an
        # owned start, so the scan window is bounded by the range
        pos = None
        blob = b""
        blob_abs = start - 16
        fh.seek(blob_abs)
        while blob_abs + len(blob) < end + 15:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            if len(blob) > 15:
                blob_abs += len(blob) - 15
                blob = blob[-15:]
            blob += chunk
            q = blob.find(sync)
            if q != -1:
                pos = blob_abs + q + 16
                break
        if pos is None or pos >= end:
            return _finish()

    fh.seek(pos)
    data = b""

    def ensure(n):
        nonlocal data
        while len(data) < n:
            chunk = fh.read(max(n - len(data), 1 << 20))
            if not chunk:
                break
            data += chunk

    rel = 0
    while pos + rel < end:
        ensure(rel + 20)  # two varint headers are at most 20 bytes
        if rel >= len(data):
            break  # clean EOF: split end coincides with file end
        n, p = _read_varint(data, rel)
        size, p = _read_varint(data, p)
        ensure(p + size + 16)
        block = data[p:p + size]
        if len(block) != size:
            raise ValueError("avro split block truncated")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        if nd is not None:
            blocks.append(nd.decode_block(block, n))
        else:
            endp = decode_block(block, 0, n, cols)
            if endp != len(block):
                raise ValueError("avro block under/over-read "
                                 f"({endp} of {len(block)} bytes)")
        if data[p + size:p + size + 16] != sync:
            raise ValueError("avro block sync mismatch")
        rel = p + size + 16
    return _finish()
