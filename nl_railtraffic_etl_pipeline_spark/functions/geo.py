"""Planar spatial primitives: grid-bucketed neighbor search over integer
coordinates.

The reference has station coordinates (``stations.latitude/longitude``,
``src/storage/schema.sql:42-43``) but never queries them spatially; this
module adds the radius/nearest-neighbor capability a disruption-impact or
crawl-geo pipeline needs, engineered the way a 100 TB engine must do it:
the candidate generator is a CELL-KEYED EQUI-JOIN (each point joins only
the 3x3 block of grid cells around it), never a cross product, and the
distance verify is exact BIGINT arithmetic.

Exactness contract: coordinates are INTEGER-valued (fixed-point, e.g.
hundredths of a degree) so the squared euclidean distance
``(x1-x2)^2 + (y1-y2)^2`` is an exact BIGINT — no haversine sin/cos
(transcendentals diverge across engines in the last ulp; at city-scale
radii the planar approximation is the standard first filter anyway, and
an exact-spherical verify would bolt on the same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_nearest_neighbors(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-point neighbor stats within ``radius`` (integer fixed-point
    units): neighbor count, the nearest neighbor's id, and its squared
    distance.  Points with no neighbor in range are omitted.

    Plan: points map to cell ``(floor(x/r), floor(y/r))``; the left side
    explodes the 9 surrounding cell offsets (map-side, x9 rows) and
    equi-joins the right side on the cell key — every candidate pair is
    generated exactly once (the unique offset that maps p's cell onto
    q's), then verified with the exact integer distance.  Self-pairs are
    dropped by id inequality.  Nearest pick is a (dist2, neighbor id)
    MIN-struct — total-ordered, no window needed.

    Skew note: a uniform grid bounds candidates per point by the density
    of its 3x3 block; for heavily clustered data pick ``radius`` (the
    cell size) so hot cells stay executor-sized, or pre-split hot cells
    the same way the salted-skew join does.
    """
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    r = F.lit(radius)
    cx = F.floor(F.col(x_col) / r)
    cy = F.floor(F.col(y_col) / r)
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8), "
        "i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy)))"
    )
    left = base.select(
        F.col("_id").alias("_lid"),
        F.col("_x").alias("_lx"),
        F.col("_y").alias("_ly"),
        "_cx",
        "_cy",
        offsets.alias("_o"),
    ).select(
        "_lid",
        "_lx",
        "_ly",
        (F.col("_cx") + F.col("_o.dx")).alias("_jcx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_jcy"),
    )
    cand = left.join(
        base,
        (F.col("_jcx") == F.col("_cx")) & (F.col("_jcy") == F.col("_cy")),
    ).filter(F.col("_lid") != F.col("_id"))
    d2 = (F.col("_lx") - F.col("_x")) * (F.col("_lx") - F.col("_x")) + (
        F.col("_ly") - F.col("_y")
    ) * (F.col("_ly") - F.col("_y"))
    hits = cand.select(
        F.col("_lid").alias("id"),
        F.col("_id").alias("_nbr"),
        d2.alias("_d2"),
    ).filter(F.col("_d2") <= F.lit(radius) * F.lit(radius))
    return hits.groupBy("id").agg(
        F.count("*").alias("n_neighbors"),
        F.min(F.struct(F.col("_d2"), F.col("_nbr"))).alias("_best"),
    ).select(
        "id",
        "n_neighbors",
        F.col("_best._nbr").alias("nearest_id"),
        F.col("_best._d2").alias("nearest_dist2"),
    )
