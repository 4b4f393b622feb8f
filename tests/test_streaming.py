"""Structured Streaming operators drain deterministically with
availableNow; value parity vs DuckDB is gated in test_oracle_parity
(q39/q49) — here we check streaming-specific invariants."""

from __future__ import annotations

from gfw_pixetl_spark.streaming.events import (
    run_hourly_rollup_once, run_sessionize_once,
)
from tests.conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"


def test_hourly_rollup_stream(spark):
    out = run_hourly_rollup_once(spark, EVENTS)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"bucket", "event_type", "n", "sum_value"}
    assert all(r.n > 0 for r in rows)


def test_sessionize_stream(spark):
    out = run_sessionize_once(spark, EVENTS)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.duration_sec >= 0 for r in rows)
    assert all(r.n_events >= 1 for r in rows)
    # single-event sessions have zero duration
    singles = [r for r in rows if r.n_events == 1]
    assert all(abs(r.duration_sec) < 1e-6 for r in singles)
