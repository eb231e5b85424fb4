"""Grid-blocked spatial nearest-neighbor join (logistics: nearest depot
/ warehouse / courier for every delivery point).

The naive nearest-neighbor join is all-pairs distance -- O(n*m), dead at
scale.  The standard fix is spatial blocking: bucket sites into grid
cells sized to the search radius, explode each query point to its 3x3
cell neighborhood, join on cell, and verify with the exact distance.
Any site within Euclidean radius R of a point lies in the 3x3
neighborhood when the cell edge is >= R, so the candidate set is
COMPLETE -- the verify stage only discards, never misses (the same
candidates-then-verify motif as the LSH and SymSpell families).

Coordinates are INTEGER grid units (e.g. microdegrees): cell ids,
squared distances, and tie-breaks are all exact BIGINT arithmetic, so a
SQL oracle replays the join bit-for-bit -- no haversine/trig ulps, no
float knife-edges.  Real deployments project to an equal-area integer
grid the same way; curvature belongs in the projection, not the join.

Scale posture: one shuffle keyed on cell id (9 rows per point, 1 per
site); per-cell cost is bucket_points x bucket_sites -- hot cells are
the same Σ bucket² shape as LSH banding and amenable to the same guard;
the argmin is a per-point window over candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_base_hash


def hashed_coords(df: DataFrame, key_col: str, scale: int = 1_000_000) -> DataFrame:
    """Deterministic synthetic coordinates in ``[0, scale)^2`` derived
    from the portable hash of the key -- the fixture tables carry no
    geography, so demo queries manufacture it reproducibly (the SQL
    oracle derives the identical points)."""
    x = portable_base_hash(F.concat(F.lit("x:"), F.col(key_col).cast("string"))) % scale
    y = portable_base_hash(F.concat(F.lit("y:"), F.col(key_col).cast("string"))) % scale
    return df.withColumn("x", x).withColumn("y", y)


def grid_nn_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    radius: int,
) -> DataFrame:
    """Nearest site within ``radius`` for every point (points/sites carry
    integer ``x``/``y``).  Ties break on the smaller site id.  Points
    with no site in range are absent from the output (callers outer-join
    if they need the misses).

    Output: ``<point_id>, <site_id>, dist2`` (exact squared distance).
    """
    cell = lambda c: (F.col(c) / radius).cast("long")  # noqa: E731
    s = sites.select(
        F.col(site_id),
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        cell("x").alias("cx"),
        cell("y").alias("cy"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    p = (
        points.select(
            F.col(point_id),
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            cell("x").alias("pcx"),
            cell("y").alias("pcy"),
        )
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            point_id,
            "px",
            "py",
            (F.col("pcx") + F.col("dx")).alias("cx"),
            (F.col("pcy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    cands = (
        p.join(s, on=["cx", "cy"])
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= radius * radius)
    )
    w = Window.partitionBy(point_id).orderBy("dist2", site_id)
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(point_id, site_id, "dist2")
    )


def point_in_polygon_counts(
    points: DataFrame,
    fences: dict[str, list[tuple[int, int]]],
    point_id: str,
) -> DataFrame:
    """Geofence assignment by EXACT integer ray casting: for each named
    polygon, count the crossing parity of a horizontal ray from every
    point (integer ``x``/``y`` columns) -- the logistics question "which
    delivery zone is this point in" without any float geometry.

    Exactness: each directed edge contributes a crossing iff it spans
    the point's y and the 2x2 cross product ``(x2-x1)(py-y1) -
    (px-x1)(y2-y1)`` sits strictly on the edge's upward side -- all
    BIGINT products (exact while |coords| < 2^31); inside = odd crossing
    count.  Points exactly ON an edge follow the strict-inequality
    convention deterministically on every engine -- integer arithmetic
    has no knife edges.

    Scale shape: the edge table is a literal (fences x vertices rows)
    broadcast against the point stream; the parity aggregate is
    map-side combinable on (point, fence); the final per-fence rollup
    is |fences| rows.  Nothing shuffles at point scale except the tiny
    (point, fence) parity rows for points near fences.

    Output: ``fence_id, n_inside`` -- one row per fence (0-count fences
    included).
    """
    spark = points.sparkSession
    if not fences:
        raise ValueError("point_in_polygon_counts needs at least one fence")
    edges = []
    for fid, verts in fences.items():
        if len(verts) < 3:
            raise ValueError(f"fence {fid!r} needs >= 3 vertices")
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            edges.append((fid, int(x1), int(y1), int(x2), int(y2)))
    e = spark.createDataFrame(
        edges, "fence_id string, x1 long, y1 long, x2 long, y2 long"
    )
    # Filter to ACTUAL crossings before anything shuffles: a point far
    # from every fence contributes zero rows (parity 0 == outside), so
    # the aggregate sees only edge-spanning rows, not |points|x|fences|.
    crossings = (
        points.select(point_id, "x", "y")
        .crossJoin(F.broadcast(e))
        .filter(
            F.expr(
                "(y1 > y) <> (y2 > y) AND ("
                " (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)"
                ") * (CASE WHEN y2 > y1 THEN 1 ELSE -1 END) > 0"
            )
        )
        .groupBy(point_id, "fence_id")
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    counted = (
        crossings.filter(F.col("__k") % 2 == 1)
        .groupBy("fence_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inside"))
    )
    all_fences = spark.createDataFrame(
        [(fid,) for fid in sorted(fences)], "fence_id string"
    )
    return all_fences.join(counted, "fence_id", "left").select(
        "fence_id",
        F.coalesce("n_inside", F.lit(0)).cast("long").alias("n_inside"),
    )
