"""GeoParquet sink (A12 parity, reference gtfs_rt_assets.py:122-141).

The reference writes real GeoParquet via geopandas: a WKB geometry
column plus a `geo` file-metadata key carrying encoding/bbox/CRS, so
spatial readers recognize the file. Spark's parquet writer cannot
attach custom key-value metadata, so the sink here is two-phase:

1. distributed write — `wkb_point` builds the 21-byte WKB point
   encoding (public OGC spec: byte-order 01, geom-type 1, x, y as
   little-endian doubles) in an Arrow-vectorized pandas UDF; the frame
   is written as ordinary partitioned parquet;
2. footer finalize — `finalize_geo_metadata` rewrites each file's
   footer with the GeoParquet 1.0.0 `geo` JSON (geoparquet.org spec):
   primary_column, WKB encoding, Point geometry type, per-file bbox
   computed from that file's own lon/lat stats, CRS PROJJSON for
   EPSG:4326 (constant per reference gtfs_rt_assets.py:128).

The finalize step is a driver-side loop over footer rewrites — the
same boundary as the reference's per-file catalog INSERT and our
catalog append: per-minute batches write ONE file (A12), so the loop
is O(1) per batch; the compaction job bounds total file count.
"""

from __future__ import annotations

import glob
import json
import os
import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

GEO_VERSION = "1.0.0"

# Minimal PROJJSON for EPSG:4326 (public EPSG registry definition).
CRS_PROJJSON = {
    "$schema": "https://proj.org/schemas/v0.5/projjson.schema.json",
    "type": "GeographicCRS",
    "name": "WGS 84",
    "datum": {
        "type": "GeodeticReferenceFrame",
        "name": "World Geodetic System 1984",
        "ellipsoid": {
            "name": "WGS 84",
            "semi_major_axis": 6378137,
            "inverse_flattening": 298.257223563,
        },
    },
    "coordinate_system": {
        "subtype": "ellipsoidal",
        "axis": [
            {"name": "Geodetic latitude", "abbreviation": "Lat",
             "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "abbreviation": "Lon",
             "direction": "east", "unit": "degree"},
        ],
    },
    "id": {"authority": "EPSG", "code": 4326},
}


# BinaryType instance (not a "binary" DDL string): string return types
# are parsed against the active session, which need not exist at import
@pandas_udf(T.BinaryType())
def _wkb_point_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    # WKB: 01 (little-endian) + 01000000 (Point) + x + y. NULL when
    # either coordinate is missing (reference's None-geometry rows,
    # gtfs_rt_assets.py:124-127).
    out = []
    for x, y in zip(lon, lat):
        if pd.isna(x) or pd.isna(y):
            out.append(None)
        else:
            out.append(b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y))
    return pd.Series(out)


def wkb_point(lon: Column | str, lat: Column | str) -> Column:
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    return _wkb_point_udf(lon, lat)


def geo_metadata(bbox: list[float] | None) -> dict:
    col: dict = {
        "encoding": "WKB",
        "geometry_types": ["Point"],
        "crs": CRS_PROJJSON,
    }
    if bbox is not None:
        col["bbox"] = bbox
    return {
        "version": GEO_VERSION,
        "primary_column": "geometry",
        "columns": {"geometry": col},
    }


def write_geoparquet(
    df: DataFrame,
    root: str,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Distributed write + footer finalize. Adds a WKB `geometry`
    column derived from lon/lat; NULL-coordinate rows keep NULL
    geometry (null-tolerant schema, SURVEY §1.1)."""
    out = df.withColumn("geometry", wkb_point(lon_col, lat_col))
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(root)
    finalize_geo_metadata(root, lon_col, lat_col)


def finalize_geo_metadata(
    root: str, lon_col: str = "longitude", lat_col: str = "latitude"
) -> int:
    """Stamp the GeoParquet `geo` metadata onto every parquet file under
    root that doesn't have it yet; returns the number stamped. Per-file
    bbox = min/max of that file's own coordinates (the reference's
    gdf.total_bounds per file, gtfs_rt_assets.py:161-168); all-null
    files get a bbox-less geo entry (reference's NULL-bbox fallback,
    gtfs_rt_assets.py:169-170)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n = 0
    for path in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        tbl = pq.read_table(path)
        meta = dict(tbl.schema.metadata or {})
        if b"geo" in meta:
            continue
        bbox = None
        if lon_col in tbl.column_names and lat_col in tbl.column_names:
            lo, la = tbl[lon_col], tbl[lat_col]
            if lo.null_count < len(lo):
                bbox = [
                    pc.min(lo).as_py(), pc.min(la).as_py(),
                    pc.max(lo).as_py(), pc.max(la).as_py(),
                ]
        meta[b"geo"] = json.dumps(geo_metadata(bbox)).encode()
        pq.write_table(tbl.replace_schema_metadata(meta), path)
        n += 1
    return n


def read_wkb_points(wkb: pd.Series) -> pd.DataFrame:
    """Test/reader helper: decode WKB points back to (lon, lat)."""
    lons, lats = [], []
    for b in wkb:
        if b is None:
            lons.append(None)
            lats.append(None)
        else:
            assert bytes(b[:5]) == b"\x01\x01\x00\x00\x00", "not a WKB point"
            x, y = struct.unpack("<dd", bytes(b[5:21]))
            lons.append(x)
            lats.append(y)
    return pd.DataFrame({"lon": lons, "lat": lats})
