"""Operation metrics registry — commit / scan / compaction counters.

The reference instruments its core operations through an in-memory
metric registry (`paimon-core/src/main/java/org/apache/paimon/metrics/
MetricRegistry.java`; `operation/metrics/ScanMetrics.java` — scanned
manifests, skipped-by-stats vs resulted data files, scan duration;
`operation/metrics/CommitMetrics.java` — commit duration, attempts,
table files added/deleted; `operation/metrics/CompactionMetrics.java`)
and exposes the gauges through reporters. This module is that registry
re-expressed for a driver-side Python planner: a process-local map of
``(table_path, group) → counters`` with the reference's last/total
convention (every recorded value keeps both its most recent reading
and a running total, plus an operation count), surfaced as the
``t$metrics`` per-table and ``sys.metrics`` catalog system tables.

Why it matters at cluster scale: file-skipping efficacy becomes an
OBSERVABLE (``scan.last_skipped_by_stats`` moving proves stats pruning
fired on the real workload) instead of something inferred from plan
shape, and commit/compaction durations and retry counts are the
first-line signals for manifest bloat and CAS contention. The registry
is intentionally in-process (the reference's gauges are too): it
reflects THIS driver's operations, not a cluster-wide store.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
# (table_path, group) -> {"ops": n, "last_<k>": v, "total_<k>": sum}
_REG: dict[tuple[str, str], dict[str, float]] = {}
# bound the registry: a long-lived driver touching ephemeral tables
# (test fixtures, per-crawl scratch sources) must not accumulate an
# entry per table forever — oldest-inserted table evicts first (the
# reference closes a table's metric group with the table; we
# approximate with insertion-order eviction)
_MAX_TABLES = 512


def record(table_path: str, group: str, **counters) -> None:
    """Record one operation's counters under (table_path, group).
    Each key k keeps ``last_k`` (most recent) and ``total_k`` (running
    sum); ``ops`` counts recorded operations. None values are skipped
    so call sites can pass optional readings unconditionally."""
    with _LOCK:
        g = _REG.setdefault((table_path, group), {"ops": 0})
        g["ops"] += 1
        for k, v in counters.items():
            if v is None:
                continue
            v = float(v)
            g[f"last_{k}"] = v
            g[f"total_{k}"] = g.get(f"total_{k}", 0.0) + v
        paths = list(dict.fromkeys(p for p, _ in _REG))
        if len(paths) > _MAX_TABLES:
            for stale in paths[:len(paths) - _MAX_TABLES]:
                for key in [k for k in _REG if k[0] == stale]:
                    _REG.pop(key, None)


def get(table_path: str, group: str, metric: str,
        default: float = 0.0) -> float:
    with _LOCK:
        return _REG.get((table_path, group), {}).get(metric, default)


def rows(table_path: str | None = None) -> list[tuple]:
    """(table_path, group, metric, value) rows for the system tables."""
    with _LOCK:
        out = []
        for (p, grp), g in sorted(_REG.items()):
            if table_path is not None and p != table_path:
                continue
            for k in sorted(g):
                out.append((p, grp, k, float(g[k])))
        return out


def reset(table_path: str | None = None) -> None:
    with _LOCK:
        if table_path is None:
            _REG.clear()
        else:
            for key in [k for k in _REG if k[0] == table_path]:
                _REG.pop(key, None)
