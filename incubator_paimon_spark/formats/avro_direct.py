"""Direct Arrow → Avro staging write: one materialization instead of two.

Before r16 every avro-table commit materialized the data TWICE: Spark wrote
the commit as parquet (staging layout + rolling + footer stats), then a
distributed pass re-read each staged file and re-encoded it as an avro
container (avro_spark.transcode_parquet_to_avro). Measured at bench scale the
staged parquet save was 1.6–1.9 s of a 2.6–3.0 s 600 K-row write — pure
double I/O that grows linearly with data volume (guide §1.2 step 1: fix the
algorithm's passes before per-task work).

This module is the single-pass replacement: a `mapInArrow` task walks its
partition's batches, groups rows by the layout columns (partition dirs +
bucket), encodes each group straight into avro container blocks with the
vectorized columnar encoder (avro_encode), rolls files at
`maxRecordsPerFile`, computes the per-file column stats FROM THE ARROW DATA
in the same pass, and ships back O(files) small result rows
(path, size, stats) — the driver never touches data, exactly like the
staged path's footer collection.

Stats parity is the correctness surface: the manifest min/max/null_count
feed file pruning, `_SEQUENCE_NUMBER` ordering and the `_VALUE_KIND`
delete-row proof, so the numbers here replicate what Spark-written parquet
footers produced for the SAME rows, verified empirically and pinned by
tests/test_avro_direct.py:

- nested columns (array/map/struct): parquet exposes only dotted leaf paths,
  which collect_file_stats skips → NO stats entry at all;
- TimestampType (tz-aware): Spark stages it as INT96, which carries no
  footer statistics → entry is exactly ``{"null_count": 0}`` (even when the
  column holds nulls); TimestampNTZType is INT64 and gets real stats;
- DecimalType: pyarrow cannot cast the footer's min/max → real null_count,
  no min/max;
- float/double: parquet-mr orders by Java Double.compare — NaN is the
  LARGEST value (all NaNs equal), -0.0 < 0.0 — so min/max use the IEEE
  total-order bit trick with NaNs canonicalized, not IEEE min/max;
- string/bytes: when encoded min+max total ≥ 4096 bytes parquet-mr drops the
  whole statistics object (ParquetMetadataConverter MAX_STATS_SIZE), and the
  footer reader then reports ``{"null_count": 0}`` — replicated verbatim;
- stats_mode none/counts/truncate(16)/full post-processing is shared with
  the footer path via metadata.stats._truncate/_jsonable.

Task-retry safety: file names are uuid-unique per attempt; the driver only
trusts the (path, size, stats) rows returned by SUCCESSFUL attempts, and
`_move_into_layout` moves exactly those files before deleting the staging
dir, so a failed attempt's orphans are swept with the staging skeleton.
"""

from __future__ import annotations

import struct

from ..metadata.stats import _jsonable, _truncate

# flush encoded blocks once this much raw arrow data is buffered, so a task
# never holds more than ~one flush of raw columns plus the (compressed)
# container bytes of the file it is building — bounded memory at any
# partition size, same order as the old per-file transcode held
FLUSH_BYTES = 32 << 20

_pack_d = struct.Struct("<d").pack


def _jkey(v: float) -> int:
    """Java Double.compare total-order key: sign-flipped IEEE bits.
    NaN (any payload) sorts above +inf; -0.0 below 0.0."""
    (b,) = struct.unpack("<q", _pack_d(v))
    return b if b >= 0 else b ^ 0x7FFFFFFFFFFFFFFF


def _stat_kind(dt) -> str:
    """Spark field type -> stats rule (see module docstring)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "skip"
    if isinstance(dt, T.TimestampType):
        return "int96"      # staged parquet wrote NO stats for INT96
    if isinstance(dt, T.DecimalType):
        return "counts"     # footer min/max uncastable by pyarrow
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.BooleanType, T.DateType, T.TimestampNTZType,
                       T.CharType, T.VarcharType)):
        return "str" if isinstance(dt, (T.CharType, T.VarcharType)) else "plain"
    return "counts"         # unknown/exotic: null counts only (conservative)


def _float_minmax(arr):
    """(min, max) of a no-null float64 numpy array under Java total order."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype="<f8")
    a = np.where(np.isnan(a), np.float64("nan"), a)  # canonicalize -NaN
    bits = a.view(np.int64)
    key = np.where(bits >= 0, bits, bits ^ np.int64(0x7FFFFFFFFFFFFFFF))
    return float(a[int(np.argmin(key))]), float(a[int(np.argmax(key))])


class _ColStats:
    """Incremental per-column stats accumulator mirroring parquet footers."""

    __slots__ = ("kind", "nulls", "mn", "mx", "have")

    def __init__(self, kind: str):
        self.kind = kind
        self.nulls = 0
        self.mn = self.mx = None
        self.have = False   # saw at least one non-null value

    def update(self, arr):
        """arr: pyarrow ChunkedArray/Array for one chunk of the file."""
        import pyarrow.compute as pc

        self.nulls += arr.null_count
        if self.kind in ("skip", "int96", "counts"):
            return
        if arr.null_count == len(arr):
            return
        if self.kind == "float":
            vals = arr.drop_null() if arr.null_count else arr
            import pyarrow as pa
            np_vals = vals.cast(pa.float64()).to_numpy()
            mn, mx = _float_minmax(np_vals)
            if not self.have:
                self.mn, self.mx, self.have = mn, mx, True
            else:
                if _jkey(mn) < _jkey(self.mn):
                    self.mn = mn
                if _jkey(mx) > _jkey(self.mx):
                    self.mx = mx
            return
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is None:
            return
        if not self.have:
            self.mn, self.mx, self.have = mn, mx, True
        else:
            if mn < self.mn:
                self.mn = mn
            if mx > self.mx:
                self.mx = mx

    def finish(self, stats_mode: str, float32: bool) -> dict:
        """Final {"null_count":…[,"min","max"]} entry, or None to omit the
        column entirely (nested types)."""
        if self.kind == "skip":
            return None
        if self.kind == "int96":
            return {"null_count": 0}
        entry = {"null_count": self.nulls}
        if (self.kind == "counts" or stats_mode == "counts"
                or not self.have):
            return entry
        mn, mx = self.mn, self.mx
        if self.kind in ("str", "bytes"):
            bn = mn.encode("utf-8") if isinstance(mn, str) else mn
            bx = mx.encode("utf-8") if isinstance(mx, str) else mx
            if len(bn) + len(bx) >= 4096:
                # parquet-mr drops the whole stats object (incl. null count)
                return {"null_count": 0}
        if self.kind == "float" and float32:
            # the footer reports the float32 value widened to double
            mn = struct.unpack("<f", struct.pack("<f", mn))[0]
            mx = struct.unpack("<f", struct.pack("<f", mx))[0]
        tmn = _truncate(mn, stats_mode, is_max=False)
        tmx = _truncate(mx, stats_mode, is_max=True)
        if tmn is not None:
            entry["min"] = _jsonable(tmn)
        if tmx is not None:
            entry["max"] = _jsonable(tmx)
        return entry


class _GroupWriter:
    """One open avro container per layout group; rolls at max_rec rows."""

    def __init__(self, dir_rel: str, header: bytes, avro_schema: dict,
                 stat_kinds, float32_flags, stats_mode: str, max_rec,
                 staging: str):
        self.dir_rel = dir_rel
        self.header = header
        self.avro_schema = avro_schema
        self.stat_kinds = stat_kinds
        self.float32 = float32_flags
        self.stats_mode = stats_mode
        self.max_rec = max_rec
        self.staging = staging
        self.results = []          # (path, size, stats_json)
        self._new_file()

    def _new_file(self):
        self.parts = [self.header]
        self.buf = []              # raw arrow tables awaiting encode
        self.buf_bytes = 0
        self.rows = 0
        self.stats = [_ColStats(k) for k in self.stat_kinds]

    def append(self, tbl):
        """tbl: pyarrow Table of data columns only (layout already stripped),
        rows in input order."""
        while tbl.num_rows:
            room = (self.max_rec - self.rows if self.max_rec else
                    tbl.num_rows)
            take = tbl.slice(0, room)
            tbl = tbl.slice(room)
            for i, name in enumerate(take.column_names):
                self.stats[i].update(take.column(i))
            self.buf.append(take)
            self.buf_bytes += take.nbytes
            self.rows += take.num_rows
            if self.buf_bytes >= FLUSH_BYTES:
                self._flush()
            if self.max_rec and self.rows >= self.max_rec and tbl.num_rows:
                self.close_file()
                self._new_file()

    def _flush(self):
        import pyarrow as pa

        from .avro_encode import encode_container_blocks
        if not self.buf:
            return
        chunk = (self.buf[0] if len(self.buf) == 1
                 else pa.concat_tables(self.buf))
        self.parts.append(encode_container_blocks(chunk, self.avro_schema))
        self.buf, self.buf_bytes = [], 0

    def close_file(self):
        from ..fileio import for_path
        from ..metadata.util import dumps, new_uuid
        if self.rows == 0:
            return
        self._flush()
        data = b"".join(self.parts)
        rel = (f"{self.dir_rel}/" if self.dir_rel else "") \
            + f"part-{new_uuid()}.avro"
        path = f"{self.staging}/{rel}"
        for_path(path).write_overwrite(path, data)
        cols = {}
        names = [f["name"] for f in self.avro_schema["fields"]]
        for i, (name, st) in enumerate(zip(names, self.stats)):
            entry = st.finish(self.stats_mode, self.float32[i])
            if entry is not None:
                cols[name] = entry
        self.results.append((path, len(data), dumps(
            {"_row_count": self.rows, "cols": cols})))


def write_avro_staging(spark, df, layout_cols: list[str], staging: str,
                       stats_mode: str, max_rec: int | None):
    """Run the single-pass distributed avro staging write; returns
    {staging_path: (file_size, stats_dict)} for _collect_entries.

    `df` must already carry the layout columns (``__pt_*`` + ``__bucket``)
    and have its final partitioning/sort applied — this replaces only the
    ``writer.format("parquet").save`` + footer-stats + transcode trio."""
    from .avro_codec import spark_schema_to_avro
    from .avro_encode import container_header_bytes
    from ..metadata.util import loads

    file_schema = df.drop(*layout_cols).schema
    data_cols = [f.name for f in file_schema.fields]
    avro_schema = spark_schema_to_avro(file_schema)
    header = container_header_bytes(avro_schema, "deflate")
    stat_kinds = [_stat_kind(f.dataType) for f in file_schema.fields]
    from pyspark.sql import types as T
    float32_flags = [isinstance(f.dataType, T.FloatType)
                     for f in file_schema.fields]
    layout = list(layout_cols)
    mode = stats_mode
    if mode == "none":
        stat_kinds = ["skip"] * len(stat_kinds)

    def task(batches):
        import pyarrow as pa

        writers: dict[tuple, _GroupWriter] = {}

        def writer_for(key_vals) -> _GroupWriter:
            key = tuple(key_vals)
            w = writers.get(key)
            if w is None:
                from ..write import _dir_value

                def dv(v):
                    # partition_value_from_dir decodes booleans from the
                    # Spark/Hive lowercase form; _dir_value would render
                    # Python's "True" and flip the value on parse
                    if isinstance(v, bool):
                        return "true" if v else "false"
                    return _dir_value(v)

                dir_rel = "/".join(f"{c}={dv(v)}"
                                   for c, v in zip(layout, key))
                w = writers[key] = _GroupWriter(
                    dir_rel, header, avro_schema, stat_kinds, float32_flags,
                    mode, max_rec, staging)
            return w

        for b in batches:
            tbl = pa.Table.from_batches([b])
            data = tbl.select(data_cols)
            lay = [tbl.column(c) for c in layout]
            # fast path: the whole batch belongs to one layout group
            uniques = [c.unique() for c in lay]
            if all(len(u) == 1 for u in uniques):
                writer_for([u[0].as_py() for u in uniques]).append(data)
                continue
            # general path: order-preserving split by layout tuple
            keys = list(zip(*[c.to_pylist() for c in lay]))
            order: list[tuple] = []
            groups: dict[tuple, list[int]] = {}
            for i, k in enumerate(keys):
                g = groups.get(k)
                if g is None:
                    groups[k] = [i]
                    order.append(k)
                else:
                    g.append(i)
            for k in order:
                writer_for(k).append(data.take(groups[k]))

        out = []
        for w in writers.values():
            w.close_file()
            out.extend(w.results)
        if out:
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in out], pa.string()),
                 pa.array([r[1] for r in out], pa.int64()),
                 pa.array([r[2] for r in out], pa.string())],
                names=["path", "size", "stats"])

    rows = (df.mapInArrow(task, schema="path string, size long, stats string")
              .collect())
    return {r["path"]: (r["size"], loads(r["stats"])) for r in rows}
