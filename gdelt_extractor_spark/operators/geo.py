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
