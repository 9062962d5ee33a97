"""GeoParquet sink round-trip (reference gtfs_rt_assets.py:122-141
writes real GeoParquet with CRS EPSG:4326 and per-file bbox): the
written files must carry the `geo` footer metadata a geopandas-style
reader keys on, and the WKB geometry must decode back to lon/lat."""

from __future__ import annotations

import glob
import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

from transit_feed_etl_spark.pipeline.geoparquet import (
    finalize_geo_metadata,
    read_wkb_points,
    write_geoparquet,
)


@pytest.fixture()
def positions(spark):
    rows = [
        ("v1", -74.0, 40.7),
        ("v2", -73.5, 41.0),
        ("v3", None, None),  # NULL-geometry row stays NULL
    ]
    return spark.createDataFrame(
        rows, "vehicle_id string, longitude double, latitude double"
    )


def test_geoparquet_roundtrip(positions, tmp_path):
    root = str(tmp_path / "geo")
    write_geoparquet(positions.coalesce(1), root, mode="overwrite")

    files = glob.glob(root + "/**/*.parquet", recursive=True)
    assert files
    tbl = pq.read_table(files[0])

    # geo footer: the exact keys the GeoParquet 1.0 spec requires
    meta = json.loads(tbl.schema.metadata[b"geo"])
    assert meta["version"] == "1.0.0"
    assert meta["primary_column"] == "geometry"
    col = meta["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["Point"]
    assert col["crs"]["id"] == {"authority": "EPSG", "code": 4326}
    # per-file bbox from the file's own coordinates (NULLs excluded)
    assert col["bbox"] == [-74.0, 40.7, -73.5, 41.0]

    # WKB round-trip: binary -> (lon, lat), NULL preserved
    pdf = tbl.to_pandas().sort_values("vehicle_id")
    pts = read_wkb_points(pdf["geometry"])
    assert pts["lon"].tolist()[:2] == [-74.0, -73.5]
    assert pts["lat"].tolist()[:2] == [40.7, 41.0]
    assert pd.isna(pts["lon"].tolist()[2])


def test_all_null_file_gets_bboxless_geo(spark, tmp_path):
    df = spark.createDataFrame(
        [("x", None, None)], "vehicle_id string, longitude double, latitude double"
    )
    root = str(tmp_path / "geo_null")
    write_geoparquet(df.coalesce(1), root, mode="overwrite")
    f = glob.glob(root + "/**/*.parquet", recursive=True)[0]
    col = json.loads(pq.read_table(f).schema.metadata[b"geo"])["columns"]["geometry"]
    assert "bbox" not in col  # reference's NULL-bbox fallback
    assert col["crs"]["id"]["code"] == 4326


def test_finalize_is_idempotent(positions, tmp_path):
    root = str(tmp_path / "geo2")
    write_geoparquet(positions.coalesce(1), root, mode="overwrite")
    assert finalize_geo_metadata(root) == 0  # already stamped -> no rewrite


def test_partitioned_geoparquet_each_file_stamped(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 10), ("b", 3.0, 4.0, 11)],
        "vehicle_id string, longitude double, latitude double, hour int",
    )
    root = str(tmp_path / "geo3")
    write_geoparquet(
        df.repartition(1), root, mode="overwrite", partition_by=("hour",)
    )
    files = glob.glob(root + "/**/*.parquet", recursive=True)
    assert len(files) == 2
    bboxes = {
        tuple(
            json.loads(pq.read_table(f).schema.metadata[b"geo"])["columns"][
                "geometry"
            ]["bbox"]
        )
        for f in files
    }
    # per-FILE bbox, not dataset bbox
    assert bboxes == {(1.0, 2.0, 1.0, 2.0), (3.0, 4.0, 3.0, 4.0)}
