"""Schema-drift tests — the luigi 2009/2016 taxi-era case (§1.3) done
declaratively: era rename maps onto one canonical schema, union by name,
parquet mergeSchema."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from data_pipelines_course_spark.sources.evolution import (
    read_eras_csv,
    read_parquet_merged,
)

CANONICAL = T.StructType([
    T.StructField("pickup_ts", T.TimestampType()),
    T.StructField("pickup_lat", T.DoubleType()),
    T.StructField("pickup_lon", T.DoubleType()),
    T.StructField("fare", T.DoubleType()),
    T.StructField("vendor", T.StringType()),
])

ERA_2009 = (
    "Trip_Pickup_DateTime,Start_Lat,Start_Lon,Fare_Amt\n"
    "2009-03-01 08:00:00,40.7,-74.0,12.5\n"
    "2009-03-02 09:30:00,40.8,-73.9,8.0\n"
)
# 2016 era: renamed columns + a new vendor column the old era lacks.
ERA_2016 = (
    "tpep_pickup_datetime,pickup_latitude,pickup_longitude,fare_amount,VendorID\n"
    "2016-05-01 10:00:00,40.6,-73.8,22.0,CMT\n"
)

RENAMES_2009 = {"Trip_Pickup_DateTime": "pickup_ts", "Start_Lat": "pickup_lat",
                "Start_Lon": "pickup_lon", "Fare_Amt": "fare"}
RENAMES_2016 = {"tpep_pickup_datetime": "pickup_ts",
                "pickup_latitude": "pickup_lat",
                "pickup_longitude": "pickup_lon",
                "fare_amount": "fare", "VendorID": "vendor"}


def test_two_eras_one_frame(spark, tmp_path):
    (tmp_path / "era2009.csv").write_text(ERA_2009)
    (tmp_path / "era2016.csv").write_text(ERA_2016)
    df = read_eras_csv(spark, CANONICAL, [
        (str(tmp_path / "era2009.csv"), RENAMES_2009),
        (str(tmp_path / "era2016.csv"), RENAMES_2016),
    ])
    assert [f.name for f in df.schema.fields] == [
        "pickup_ts", "pickup_lat", "pickup_lon", "fare", "vendor"]
    rows = df.orderBy("pickup_ts").collect()
    assert len(rows) == 3
    assert rows[0].vendor is None          # 2009 era: typed null, no KeyError
    assert rows[2].vendor == "CMT"
    assert rows[0].fare == 12.5            # values cast to canonical doubles
    assert df.schema["pickup_ts"].dataType == T.TimestampType()


def test_filter_pushes_below_era_union(spark, tmp_path):
    """Catalyst must push a canonical-column filter into both era scans —
    drift handling cannot cost a post-union materialization."""
    (tmp_path / "a.csv").write_text(ERA_2009)
    (tmp_path / "b.csv").write_text(ERA_2016)
    df = read_eras_csv(spark, CANONICAL, [
        (str(tmp_path / "a.csv"), RENAMES_2009),
        (str(tmp_path / "b.csv"), RENAMES_2016),
    ]).filter(F.col("fare") > 10.0)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # The optimized plan unions two branches, each already filtered.
    assert plan.count("Filter") >= 2
    assert df.count() == 2


def test_parquet_merge_schema(spark, tmp_path):
    base = str(tmp_path / "pq")
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame([(2, "b", 9.5)],
                                "id long, name string, score double")
    old.write.parquet(base + "/batch=1")
    new.write.parquet(base + "/batch=2")
    merged = read_parquet_merged(spark, base)
    assert set(merged.columns) >= {"id", "name", "score"}
    by_id = {r.id: r for r in merged.collect()}
    assert by_id[1].score is None
    assert by_id[2].score == 9.5
