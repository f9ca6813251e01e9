"""Geometry projection — Spark re-expression of the reference's
PostGIS stage: add a point geometry from lon/lat and keep only rows
with valid coordinates (reference/extractor/extractor.py:168-180
``addgeometrycolumn``/``st_setsrid(st_point(...))`` and
reference/extractor/v2_table.py:68-84 typed casts +
``where lat != '' and long != ''``).

No geometry lib in this environment, so the point is carried as WKT
text + double lon/lat columns — which is also the right 100 TB
shape: the validity filter is a plain predicate that pushes into the
parquet scan, and WKT construction is codegen'd string concat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def valid_coords(lat: Column, lon: Column) -> Column:
    return (
        lat.isNotNull()
        & lon.isNotNull()
        & (lat >= -90)
        & (lat <= 90)
        & (lon >= -180)
        & (lon <= 180)
    )


def point_wkt(lat: Column, lon: Column, precision: int = 6) -> Column:
    """WKT POINT(lon lat) string (SRID 4326 implied, as reference)."""
    return F.concat(
        F.lit("POINT("),
        F.round(lon, precision).cast("decimal(10,6)").cast("string"),
        F.lit(" "),
        F.round(lat, precision).cast("decimal(10,6)").cast("string"),
        F.lit(")"),
    )


def geo_project(df: DataFrame, lat_col: str, lon_col: str, *keep: str) -> DataFrame:
    """Typed projection + coordinate-validity filter + WKT point.

    Mirrors v2_table.py's geom_base: select a typed subset, filter
    invalid coordinates, produce the geometry column.
    """
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    return (
        df.filter(valid_coords(lat, lon))
        .select(
            *keep,
            lat.alias("lat"),
            lon.alias("lon"),
            point_wkt(lat, lon).alias("geom_wkt"),
        )
    )


def _cell_key(iy: Column, ix: Column) -> Column:
    # iy/ix are non-negative after the +90/+180 offsets; 100000
    # leaves room for any cell_deg ≥ 0.01
    return (iy * 100000 + ix).cast("long")


def grid_join(
    points: DataFrame,
    boxes: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 15.0,
) -> DataFrame:
    """Spatial point-in-rectangle join via a GRID-CELL EQUI-JOIN —
    the 2-D analogue of the range join's bin trick.  Spark has no
    spatial join; the naive formulation (``lat BETWEEN … AND lon
    BETWEEN …``) has no equi-key and degrades to a broadcast
    nested-loop / cartesian.  Instead: every box explodes to the
    grid cells its rectangle covers, every point maps to its ONE
    cell, the join is a plain hash equi-join on the cell key, and
    exact containment evaluates as the post-join residual.

    Because a point belongs to exactly one cell, a (point, box)
    pair can only meet once — no distinct pass needed.  Containment
    is half-open ([min, max) on both axes) so abutting boxes never
    double-match a boundary point.

    ``boxes`` columns: (box_id, lat_min, lat_max, lon_min, lon_max).
    ``cell_deg`` trades fan-out for selectivity: boxes replicate
    ~(span/cell_deg)² times, points never replicate — so size cells
    near the typical box edge.  At 100 TB both sides shuffle once on
    the uniform cell key (or the points side pre-buckets on it);
    works unchanged when the box catalog is itself too big to
    broadcast — exactly where the BNLJ formulation dies.

    Output: the point rows + matched ``box_id`` (one row per
    containing box).
    """
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    iy = lambda c: F.floor((c + F.lit(90.0)) / cell_deg).cast("long")  # noqa: E731
    ix = lambda c: F.floor((c + F.lit(180.0)) / cell_deg).cast("long")  # noqa: E731
    cb = (
        boxes.withColumn(
            "_iy", F.explode(F.sequence(iy(F.col("lat_min")), iy(F.col("lat_max"))))
        )
        .withColumn(
            "_ix", F.explode(F.sequence(ix(F.col("lon_min")), ix(F.col("lon_max"))))
        )
        .withColumn("cell", _cell_key(F.col("_iy"), F.col("_ix")))
        .drop("_iy", "_ix")
    )
    pts = points.withColumn("cell", _cell_key(iy(lat), ix(lon)))
    return (
        pts.join(cb, "cell")
        .filter(
            (lat >= F.col("lat_min"))
            & (lat < F.col("lat_max"))
            & (lon >= F.col("lon_min"))
            & (lon < F.col("lon_max"))
        )
        .drop("cell", "lat_min", "lat_max", "lon_min", "lon_max")
    )
