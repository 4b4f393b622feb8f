"""Per-user rate-limiter (streaming/throttle.py): admitted set equals
ROW_NUMBER() <= limit per (user, event-time hour) under the
availableNow drain; the transformWithStateInPandas path is gated on
google.protobuf availability (see the module docstring)."""

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gfw_pixetl_spark.streaming.throttle import (
    run_rate_limit_once,
    tws_available,
)


def _expected(spark, path, limit):
    ev = spark.read.parquet(path).withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("double"))
    w = Window.partitionBy(
        "user_id", F.floor(F.col("ts_sec") / 3600)
    ).orderBy("ts_sec", "event_id")
    return (ev.withColumn("seq", F.row_number().over(w))
            .filter(F.col("seq") <= limit)
            .select("user_id", "event_id",
                    F.floor(F.col("ts_sec") / 3600).cast("long")
                    .alias("hour"),
                    F.col("seq").cast("long"), "value"))


@pytest.mark.parametrize("limit", [1, 3])
def test_rate_limit_matches_batch_ranking(spark, limit):
    path = "/root/testdata/sf0.001/events.parquet"
    got = run_rate_limit_once(spark, path, limit=limit).cache()
    exp = _expected(spark, path, limit).cache()
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # the admission ceiling holds per (user, hour)
    over = (got.groupBy("user_id", "hour").count()
            .filter(F.col("count") > limit).count())
    assert over == 0


def test_admit_kernel_resumes_from_state():
    from gfw_pixetl_spark.streaming.throttle import _admit

    pdf = pd.DataFrame({"event_id": [1, 2, 3, 4],
                        "ts_sec": [10.0, 20.0, 3700.0, 3800.0],
                        "value": [1.0, 2.0, 3.0, 4.0]})
    counts = {0: 2}  # two already admitted in hour 0 from prior batch
    out = _admit(pdf, 7, counts, limit=3)
    # hour 0: only one more slot; hour 1: fresh
    assert out["event_id"] == [1, 3, 4]
    assert out["seq"] == [3, 1, 2]
    assert counts == {0: 3, 1: 2}


def test_tws_path_env_gate(spark):
    if not tws_available():
        with pytest.raises(Exception):
            run_rate_limit_once(
                spark, "/root/testdata/sf0.001/events.parquet",
                limit=3, api="tws")
        pytest.skip("google.protobuf absent: transformWithState "
                    "runner cannot start in this container")
    got = run_rate_limit_once(
        spark, "/root/testdata/sf0.001/events.parquet", limit=3,
        api="tws").cache()
    exp = _expected(spark, "/root/testdata/sf0.001/events.parquet", 3)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
