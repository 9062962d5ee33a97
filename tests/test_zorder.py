"""Z-order layout contracts: Morton math, spatial compactness of the
written files, and the end effect — bbox file-pruning selectivity."""

from __future__ import annotations

import glob

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from transit_feed_etl_spark.pipeline.zorder import morton_code, write_zordered

N_FILES = 8


@pytest.fixture(scope="module")
def points(spark):
    # deterministic grid over a city-sized box, shuffled arrival order
    rows = []
    for i in range(40):
        for j in range(40):
            rows.append(
                (i * 40 + j, -74.3 + i * 0.01, 40.5 + j * 0.01)
            )
    import random

    random.Random(7).shuffle(rows)
    return spark.createDataFrame(rows, "pid long, longitude double, latitude double")


def test_morton_code_locality(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.01, 0.01), (120.0, 45.0)], "lon double, lat double"
    ).select(morton_code("lon", "lat").alias("z"))
    z = [r["z"] for r in df.collect()]
    # near points -> near codes; far point -> far code
    assert abs(z[0] - z[1]) < abs(z[0] - z[2])
    # order-preserving quantization bounds: codes fit in 2*bits bits
    assert all(0 <= v < (1 << 32) for v in z)


def _file_bboxes(root):
    boxes = []
    for path in sorted(glob.glob(root + "/*.parquet")):
        t = pq.read_table(path, columns=["longitude", "latitude"])
        if len(t) == 0:
            continue
        boxes.append(
            (
                pc.min(t["longitude"]).as_py(),
                pc.min(t["latitude"]).as_py(),
                pc.max(t["longitude"]).as_py(),
                pc.max(t["latitude"]).as_py(),
            )
        )
    return boxes


def test_zorder_files_are_spatially_compact(spark, points, tmp_path):
    plain_root = str(tmp_path / "plain")
    z_root = str(tmp_path / "zord")
    # plain: arrival-order round-robin — every file spans the whole area
    points.repartition(N_FILES).write.mode("overwrite").parquet(plain_root)
    write_zordered(points, z_root, N_FILES)

    def total_area(boxes):
        return sum((x2 - x1) * (y2 - y1) for x1, y1, x2, y2 in boxes)

    plain = _file_bboxes(plain_root)
    zord = _file_bboxes(z_root)
    assert len(zord) == N_FILES
    # same rows, same count
    assert spark.read.parquet(z_root).count() == 1600
    # z-ordered per-file bboxes must cover FAR less total area
    assert total_area(zord) < 0.5 * total_area(plain), (
        total_area(zord),
        total_area(plain),
    )


def test_zorder_improves_bbox_pruning(spark, points, tmp_path):
    """The end-to-end point: a small query bbox intersects almost every
    arrival-order file but only a couple of z-ordered files."""
    plain_root = str(tmp_path / "plain2")
    z_root = str(tmp_path / "zord2")
    points.repartition(N_FILES).write.mode("overwrite").parquet(plain_root)
    write_zordered(points, z_root, N_FILES)

    q = (-74.25, 40.55, -74.20, 40.60)  # ~2% of the area

    def hits(root):
        n = 0
        for x1, y1, x2, y2 in _file_bboxes(root):
            if not (x2 < q[0] or x1 > q[2] or y2 < q[1] or y1 > q[3]):
                n += 1
        return n

    assert hits(plain_root) == N_FILES          # zone map useless
    assert hits(z_root) <= N_FILES // 2          # zone map selective
    # correctness: the pruned scan still returns every matching row
    matching = (
        spark.read.parquet(z_root)
        .filter(
            (F.col("longitude") >= q[0]) & (F.col("longitude") <= q[2])
            & (F.col("latitude") >= q[1]) & (F.col("latitude") <= q[3])
        )
        .count()
    )
    assert matching == 36  # 6x6 grid cells inside the query box
