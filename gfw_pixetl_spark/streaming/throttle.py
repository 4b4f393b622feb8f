"""Per-user event-admission throttle — the ingestion rate limiter a
multi-tenant 100 TB feed needs so one hot producer cannot crowd out
the rest: admit at most ``limit`` events per user per event-time
hour, in (ts, event_id) order.

Two implementations of the same semantics, selected by availability:

* ``applyInPandasWithState`` (GroupState) — always available; per-user
  state is the dict {hour bucket -> admitted count}, so state size is
  O(active hours per user), not O(events).
* Spark 4's ``transformWithStateInPandas`` (StatefulProcessor with a
  typed MapState) — the API that supersedes the former. Its Python
  state-server protocol imports ``google.protobuf``, which this
  container does not ship, so the path is ENVIRONMENT-BLOCKED here:
  the processor below is exercised end-to-end only where protobuf
  exists (``tests/test_throttle.py`` gates on importability and the
  auto mode falls back cleanly). Same env-residual class as the S6
  JDBC jar before round 8 closed it.

Determinism contract (same as the sessionizer,
``events.py:176-181``): draining a static table with ``availableNow``
delivers each user's full history in one micro-batch, and the kernel
sorts each batch by (ts, event_id), so the admitted set is exactly
ROW_NUMBER() <= limit per (user, hour) — batch-SQL-checkable
(harness q453). On a live stream, admission follows arrival order
within the same state contract.
"""
from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OUT_SCHEMA = ("user_id long, event_id long, hour long, seq long, "
               "value double")
_STATE_SCHEMA = "hours array<long>, counts array<long>"


def _admit(pdf, user: int, counts: dict, limit: int) -> dict:
    """Shared admission kernel: sorted rows in, admitted rows out;
    mutates ``counts`` (hour -> already-admitted)."""
    out: dict = {k: [] for k in ("user_id", "event_id", "hour", "seq",
                                 "value")}
    for ev, ts, val in zip(pdf["event_id"], pdf["ts_sec"], pdf["value"]):
        hour = int(ts // 3600)
        n = counts.get(hour, 0)
        if n >= limit:
            continue
        counts[hour] = n + 1
        out["user_id"].append(user)
        out["event_id"].append(int(ev))
        out["hour"].append(hour)
        out["seq"].append(n + 1)
        out["value"].append(float(val))
    return out


def stream_rate_limit(spark: SparkSession, events_path: str,
                      limit: int = 3) -> DataFrame:
    """applyInPandasWithState formulation (the always-available path)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .events import _event_stream

    ev = _event_stream(spark, events_path).select(
        "user_id", "event_id",
        F.col("ts").cast("double").alias("ts_sec"), "value")

    def kernel(key, batches, state: GroupState):
        if state.exists:
            hours, ns = state.get
            counts = dict(zip(hours, ns))
        else:
            counts = {}
        user = int(key[0])
        parts = [p for p in batches if len(p)]
        if parts:
            pdf = (pd.concat(parts, ignore_index=True)
                   .sort_values(["ts_sec", "event_id"]))
            out = _admit(pdf, user, counts, limit)
            state.update((list(counts), list(counts.values())))
            if out["user_id"]:
                yield pd.DataFrame(out)

    return ev.groupBy("user_id").applyInPandasWithState(
        kernel, _OUT_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def tws_available() -> bool:
    """transformWithState's Python runner needs google.protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_rate_limit_tws(spark: SparkSession, events_path: str,
                          limit: int = 3) -> DataFrame:
    """transformWithStateInPandas formulation (typed MapState) — the
    Spark 4 API; see the module docstring for the environment gate."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    from .events import _event_stream

    class RateLimitProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            # per-user typed map: hour bucket -> admitted count
            self._admitted = handle.getMapState(
                "admitted", "hour long", "n long")

        def handleInputRows(self, key, rows, timer_values):
            parts = [p for p in rows if len(p)]
            if not parts:
                return
            pdf = (pd.concat(parts, ignore_index=True)
                   .sort_values(["ts_sec", "event_id"]))
            counts: dict[int, int] = {}
            for ts in pdf["ts_sec"]:
                hour = int(ts // 3600)
                if hour not in counts:
                    got = self._admitted.getValue((hour,))
                    counts[hour] = int(got[0]) if got is not None else 0
            out = _admit(pdf, int(key[0]), counts, limit)
            for hour, n in counts.items():
                self._admitted.updateValue((hour,), (n,))
            if out["user_id"]:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    ev = _event_stream(spark, events_path).select(
        "user_id", "event_id",
        F.col("ts").cast("double").alias("ts_sec"), "value")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RateLimitProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def run_rate_limit_once(spark: SparkSession, events_path: str,
                        limit: int = 3, api: str = "auto") -> DataFrame:
    """Drain the throttle with availableNow (deterministic admitted
    set per the module contract). ``api``: 'auto' prefers the
    transformWithState path when its runner can work here."""
    if api == "auto":
        api = "tws" if tws_available() else "legacy"
    builder = (stream_rate_limit_tws if api == "tws"
               else stream_rate_limit)
    name = f"rate_limit_{uuid.uuid4().hex[:8]}"
    q = (builder(spark, events_path, limit)
         .writeStream.format("memory")
         .queryName(name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
