"""PostGIS pushdown SQL generation (S6/F4) and status/exit policy (F10)."""

from __future__ import annotations

from gfw_pixetl_spark.grids import BoundingBox
from tests.conftest import SF_SMOKE
from gfw_pixetl_spark.plans.report import (
    KILLED_STATUS, exit_code, should_upload_manifest, status_tallies,
)
from gfw_pixetl_spark.sources.vector import (
    exists_probe_sql, fetch_tile_sql, intersect_filter_sql,
    intersection_geom_sql,
)

BB = BoundingBox(10.0, 0.0, 20.0, 10.0)


def test_intersect_filter_sql():
    sql = intersect_filter_sql(BB)
    assert sql == (
        "ST_Intersects(geom, ST_MakeEnvelope(10.0, 0.0, 20.0, 10.0, 4326))"
    )


def test_intersection_geom_extracts_polygons():
    sql = intersection_geom_sql(BB)
    assert "ST_CollectionExtract" in sql and ", 3)" in sql
    assert "ST_GeometryCollection" in sql


def test_exists_probe_sql():
    sql = exists_probe_sql("wdpa", "v2024", BB)
    assert sql.startswith("SELECT 1 FROM wdpa.v2024 WHERE ST_Intersects")
    assert sql.endswith("LIMIT 1")


def test_fetch_tile_sql_default_and_calc():
    plain = fetch_tile_sql("d", "v1", BB, field="threshold")
    assert plain.startswith("SELECT threshold AS threshold,")
    assert "ORDER BY" not in plain
    calc = fetch_tile_sql(
        "d", "v1", BB, field="cls",
        calc="CASE WHEN a > 1 THEN 2 ELSE 1 END", order="desc",
    )
    assert calc.startswith("SELECT CASE WHEN a > 1 THEN 2 ELSE 1 END AS cls,")
    assert calc.endswith("ORDER BY cls desc")
    assert "ST_Intersects" in calc  # predicate pushed into the subquery


def _status_df(spark, rows):
    return spark.createDataFrame(
        [(f"t{i}", s, 1, None) for i, s in enumerate(rows)],
        "tile_id string, status string, n_windows int, out_path string",
    )


def test_exit_code_policy(spark):
    ok = _status_df(spark, ["processed", "skipped (has no data)"])
    assert exit_code(ok) == 0
    assert should_upload_manifest(ok)

    failed = _status_df(spark, ["processed", "failed - boom"])
    assert exit_code(failed) == 1
    assert not should_upload_manifest(failed)

    oom = _status_df(spark, ["failed - boom", KILLED_STATUS])
    assert exit_code(oom) == 137


def test_status_tallies(spark):
    df = _status_df(spark, [
        "processed", "processed", "skipped (has no data)",
        "existing", "failed - x",
    ])
    assert status_tallies(df) == {
        "processed": 2, "skipped": 1, "failed": 1, "existing": 1,
    }


def test_bucketed_tile_store_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tile tables join with zero shuffle: the physical plan
    reads pre-hashed buckets on both sides (no Exchange, no Sort)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from gfw_pixetl_spark.sources.tile_store import TileStore

    store = TileStore(spark, database="tilestore_test", n_buckets=8)
    tiles = spark.range(200).select(
        F.concat(F.lit("T"), F.col("id")).alias("tile_id"),
        (F.col("id") * 2).alias("left"),
    )
    statuses = spark.range(0, 200, 2).select(
        F.concat(F.lit("T"), F.col("id")).alias("tile_id"),
        F.lit("processed").alias("status"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        store.write(tiles, "tiles")
        store.write(statuses, "statuses")
        # disable broadcast so a non-bucketed plan WOULD shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = store.join("tiles", "statuses")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
        # control: the same join over non-bucketed inputs shuffles
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            tiles.join(statuses, "tile_id").explain("formatted")
        assert "Exchange" in buf2.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        store.drop("tiles")
        store.drop("statuses")
        spark.sql("DROP DATABASE IF EXISTS tilestore_test")


def test_compact_to_files_targets_size_and_roundtrips(spark, tmp_path):
    """Compaction writes ~target-sized files (here: forced tiny target →
    multiple files; huge target → one file) and preserves the rows."""
    from gfw_pixetl_spark.sinks import compact_to_files

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n = docs.count()

    small = str(tmp_path / "small")
    n_files = compact_to_files(docs, small, target_mb=1, range_key="doc_id")
    assert n_files >= 1
    back = spark.read.parquet(small)
    assert back.count() == n

    one = str(tmp_path / "one")
    assert compact_to_files(docs, one, target_mb=4096) == 1
    import glob

    assert len(glob.glob(f"{one}/part-*.parquet")) == 1


def test_partitioned_write_prunes_at_planning_time(spark, tmp_path):
    """Partition-column filters must land in PartitionFilters (directory
    pruning at planning time), not just PushedFilters (row-group
    skipping at read time)."""
    import contextlib
    import io

    from gfw_pixetl_spark.sinks.compaction import write_partitioned
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ("lang",))

    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert len(langs) > 1
    one = sorted(langs)[0]
    # directory-per-partition layout on disk
    assert (tmp_path / "docs_by_lang" / f"lang={one}").exists()

    q = spark.read.parquet(path).filter(f"lang = '{one}'").select("doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "lang" in pf
    # and values round-trip
    got = q.count()
    want = docs.filter(f"lang = '{one}'").count()
    assert got == want > 0
