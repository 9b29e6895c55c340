"""Per-file column statistics from Parquet footers.

The reference collects stats in the writer (io/StatsCollectingSingleFileWriter,
SimpleColStatsCollector modes none/counts/truncate(16)/full —
paimon-common/.../statistics/*.java:25-32). We get the same numbers for free
from Parquet footers (min/max/null-count per row group), so stats collection
is a metadata-only read of each freshly written file — O(files), no data scan.

Scale note: this runs where the file was written. The batch writer extracts
footer stats inside the same Spark task that wrote the file (see
write.py) so the driver only ever sees DataFileMeta dicts — at 100 TB the
driver cost stays O(#files) JSON, identical to the reference's CommitMessage
flow.
"""

from __future__ import annotations

from datetime import date, datetime

import pyarrow.parquet as pq


def _jsonable(v):
    if isinstance(v, (datetime, date, bytes)):
        return v  # util._Enc handles these
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def _truncate(v, mode: str, is_max: bool):
    """truncate(N) mode: a string min can be prefix-truncated (still a valid
    lower bound); a truncated max is NOT a valid upper bound, so drop it —
    pruning stays conservative (the reference instead increments the last
    char, statistics/TruncateSimpleColStatsCollector)."""
    if isinstance(v, str) and mode.startswith("truncate("):
        n = int(mode[len("truncate("):-1])
        if len(v) > n:
            return None if is_max else v[:n]
    return v


def collect_file_stats(path: str, stats_mode: str = "truncate(16)") -> dict:
    """Returns {"_row_count": n, "cols": {col: {min,max,null_count}}}.
    Footer reads route through FileIO so staging on s3://hdfs:// works; a
    plain local path keeps the direct open (no behavior change). ORC
    files (migrate sources) compute stats from one read — pyarrow does
    not expose ORC column statistics, and migration is a one-time pass."""
    from ..fileio import for_path
    if path.endswith(".orc"):
        return _collect_orc_stats(path, stats_mode)
    with for_path(path).open_input(path) as f:
        md = pq.ParquetFile(f).metadata
    out: dict = {}
    row_count = md.num_rows
    if stats_mode == "none":
        return {"_row_count": row_count, "cols": {}}
    ncols = md.num_columns
    for ci in range(ncols):
        name = md.schema.column(ci).path  # dotted path for nested leaves
        if "." in name:  # nested columns: skip leaf stats (match reference's top-level stats)
            continue
        mn = mx = None
        nulls = 0
        have = True
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                have = False
                if st is not None and st.null_count is not None:
                    nulls += st.null_count
                continue
            nulls += st.null_count or 0
            try:
                smin, smax = st.min, st.max
            except Exception:  # pyarrow can't cast stats for this type
                have = False   # (e.g. some decimal/interval encodings):
                continue       # skip min/max, keep null counts — pruning
            if mn is None or smin < mn:  # stays conservative
                mn = smin
            if mx is None or smax > mx:
                mx = smax
        entry = {"null_count": nulls}
        if have and mn is not None and stats_mode != "counts":
            tmn = _truncate(mn, stats_mode, is_max=False)
            tmx = _truncate(mx, stats_mode, is_max=True)
            if tmn is not None:
                entry["min"] = _jsonable(tmn)
            if tmx is not None:
                entry["max"] = _jsonable(tmx)
        out[name] = entry
    return {"_row_count": row_count, "cols": out}


def _collect_orc_stats(path: str, stats_mode: str) -> dict:
    """ORC variant for migrate sources: one read, min/max/null per
    top-level orderable column (same output shape and truncate rules as
    the parquet footer path, so pruning code sees no difference)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.orc as orc

    from ..fileio import for_path
    with for_path(path).open_input(path) as f:
        tbl = orc.ORCFile(f).read()
    out: dict = {}
    if stats_mode == "none":
        return {"_row_count": tbl.num_rows, "cols": {}}
    for name in tbl.column_names:
        col = tbl[name]
        entry = {"null_count": col.null_count}
        t = col.type
        orderable = not (pa.types.is_nested(t) or pa.types.is_binary(t)
                         or pa.types.is_large_binary(t) or pa.types.is_null(t))
        if (orderable and stats_mode != "counts"
                and col.null_count < len(col)):
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            tmn = _truncate(mn, stats_mode, is_max=False)
            tmx = _truncate(mx, stats_mode, is_max=True)
            if tmn is not None:
                entry["min"] = _jsonable(tmn)
            if tmx is not None:
                entry["max"] = _jsonable(tmx)
        out[name] = entry
    return {"_row_count": tbl.num_rows, "cols": out}
