"""Table and data lineage, exposed as catalog system tables.

Mirrors the reference's lineage surface (paimon-core/.../table/system/
TableLineageTable.java:59, SourceTableLineageTable.java /
SinkTableLineageTable.java, DataLineageTable — populated through the
catalog's LineageMeta at commit time): which jobs read/wrote which tables,
and at which snapshots. Records live under `<warehouse>/_lineage/` as one
immutable JSON file per event (uuid-named, atomic create — the same
no-partial-visibility contract the metadata layer uses everywhere), so any
process writing through any catalog of the warehouse contributes and any
reader lists the directory; a JDBC LineageMeta would plug in at the same
two functions.

Producers wired in-engine: MERGE INTO (sink + the USING table when it is a
catalog table), materialized-view sync (source table + covered snapshot →
view), and clone (source → target). Plain writes carry no job identity in
a library API, so they are not auto-recorded; call `record` explicitly to
tag a pipeline's writes.
"""

from __future__ import annotations

import os
import time

from .metadata.util import atomic_write_json, new_uuid, read_json


def _warehouse_of(table_path: str) -> str:
    # <warehouse>/<db>/<table>
    return os.path.dirname(os.path.dirname(table_path))


def _ident_of(table_path: str) -> tuple[str, str]:
    db = os.path.basename(os.path.dirname(table_path))
    if db.endswith(".db"):  # filesystem-catalog layout <wh>/<db>.db/<t>
        db = db[:-3]
    return db, os.path.basename(table_path)


def _endpoint(table, snapshot_id=None) -> dict:
    db, name = _ident_of(table.root_path)
    return {"database": db, "table": name, "path": table.root_path,
            "snapshot_id": snapshot_id}


def record(job: str, sources=(), sinks=()) -> None:
    """One lineage event. `sources` / `sinks` are (table, snapshot_id)
    pairs (snapshot_id None when the event is not snapshot-specific).
    The event is written to every distinct warehouse involved so both
    sides' catalogs can serve it (clone across warehouses)."""
    ev = {
        "job": job,
        "created_at_ms": int(time.time() * 1000),
        "sources": [_endpoint(t, s) for t, s in sources],
        "sinks": [_endpoint(t, s) for t, s in sinks],
    }
    warehouses = {_warehouse_of(t.root_path) for t, _ in (*sources, *sinks)}
    for wh in warehouses:
        path = os.path.join(wh, "_lineage", f"ev-{new_uuid()}.json")
        atomic_write_json(path, ev)


def read_events(warehouse: str) -> list[dict]:
    from .fileio import for_path
    d = os.path.join(warehouse, "_lineage")
    io = for_path(warehouse)
    out = []
    for n in sorted(io.list_names(d)):
        if n.startswith("ev-") and n.endswith(".json"):
            try:
                out.append(read_json(os.path.join(d, n)))
            except Exception:  # noqa: BLE001 — half-written foreign file
                continue
    return out


def table_lineage_rows(warehouse: str) -> list[tuple]:
    """(direction, database_name, table_name, job_name, create_time_ms) —
    the Source/SinkTableLineageTable row shape with a direction column."""
    rows = []
    for ev in read_events(warehouse):
        for direction, key in (("source", "sources"), ("sink", "sinks")):
            for ep in ev[key]:
                rows.append((direction, ep["database"], ep["table"],
                             ev["job"], ev["created_at_ms"]))
    return rows


def data_lineage_rows(warehouse: str) -> list[tuple]:
    """(direction, database_name, table_name, snapshot_id, job_name,
    create_time_ms) — snapshot-level lineage (DataLineageTable's
    barrier-to-snapshot relation); endpoints without a snapshot id are
    table-level only and don't appear here."""
    rows = []
    for ev in read_events(warehouse):
        for direction, key in (("source", "sources"), ("sink", "sinks")):
            for ep in ev[key]:
                if ep["snapshot_id"] is not None:
                    rows.append((direction, ep["database"], ep["table"],
                                 ep["snapshot_id"], ev["job"],
                                 ev["created_at_ms"]))
    return rows
