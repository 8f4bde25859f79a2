"""Round-6 additions, batch 9 — SURVEY §2.W: geospatial grid primitives.

The testdata has no native coordinates, so each user gets a
DETERMINISTIC synthetic location — a pure md5 function of user_id,
identical in both engines (the `sample_fraction` hash basis) — which
makes the whole spatial family exactly certifiable: positions are
integer millidegrees, distances are integer squared-millidegrees, and
the neighbor join blocks on grid cells.  No transcendental (haversine)
ever reaches a certified value: sin/cos are not correctly rounded IEEE
ops and differ across libm implementations in the last ulp, which the
value-hash gate would catch — the degree-space metric is exact, and the
haversine refinement is a documented post-filter for production use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from .pipeline_extras import _hash_bucket, _sql_hash_bucket

# A metro-region synthetic extent: lat in [-2000, 2000) millidegrees,
# lon in [-6000, 6000); grid cells are 1000 md (1 degree) squares.  The
# extent is sized so the radius join has matches at every test scale
# (the user population is sparse: 15 users at sf0.001) — the BLOCKING
# geometry, which is what the op certifies, is extent-independent.
LAT_RANGE = 4_000
LON_RANGE = 12_000
CELL_MD = 1000


def _lat_md(uid: Column) -> Column:
    return (
        _hash_bucket(F.concat(F.lit("lat:"), uid.cast("string")), LAT_RANGE)
        - LAT_RANGE // 2
    )


def _lon_md(uid: Column) -> Column:
    return (
        _hash_bucket(F.concat(F.lit("lon:"), uid.cast("string")), LON_RANGE)
        - LON_RANGE // 2
    )


def _sql_lat(uid_sql: str) -> str:
    return (
        f"({_sql_hash_bucket(f''''lat:' || CAST({uid_sql} AS VARCHAR)''', LAT_RANGE)}"
        f" - {LAT_RANGE // 2})"
    )


def _sql_lon(uid_sql: str) -> str:
    return (
        f"({_sql_hash_bucket(f''''lon:' || CAST({uid_sql} AS VARCHAR)''', LON_RANGE)}"
        f" - {LON_RANGE // 2})"
    )


GEO_RADIUS_MD = 900  # neighbor radius in millidegrees
GEO_RADIUS_MD2 = GEO_RADIUS_MD * GEO_RADIUS_MD


# ---------------------------------------------------------------------------
# geo_neighbor_join — grid-blocked radius self-join, fully integer
# ---------------------------------------------------------------------------

@register(
    "geo_neighbor_join",
    oracle=f"""
    WITH users AS (
      SELECT DISTINCT user_id FROM events
    ), pts AS (
      SELECT user_id,
             {_sql_lat("user_id")} AS lat_md,
             {_sql_lon("user_id")} AS lon_md
      FROM users
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST((a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
                + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md)
                AS BIGINT) AS dist2_md
    FROM pts a JOIN pts b
      ON a.user_id < b.user_id
     AND abs(a.lat_md - b.lat_md) <= {GEO_RADIUS_MD}
     AND abs(a.lon_md - b.lon_md) <= {GEO_RADIUS_MD}
     AND (a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
         + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md)
         <= {GEO_RADIUS_MD2}
    """,
)
def geo_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor search over user locations, blocked on a degree
    grid: candidate pairs form ONLY between a cell and its 8 neighbors
    (the classic spatial blocking that makes radius joins linear in
    matches instead of quadratic in points), then the exact integer
    squared-distance predicate keeps pairs within {GEO_RADIUS_MD}
    millidegrees.  Everything is integer arithmetic on md5-derived
    millidegree coordinates — certifiable bit for bit; a production
    deployment swaps the synthetic points for real ones and appends the
    haversine refinement AFTER this exact prefilter (the transcendental
    then only ranks survivors, never decides blocking).

    Scale: each point lands in one cell and probes 9 — the join is an
    equi-join on cell id after a small explode of the 3×3 neighborhood
    on ONE side (output-bounded, grid-bounded); never an all-pairs
    theta join.  Cell width (1000 md) >= radius (900 md) guarantees no missed
    neighbors.  Same economics as join_range_binned's 1-D binning,
    lifted to 2-D."""
    users = table(spark, sf_dir, "events").select("user_id").distinct()
    uid = F.col("user_id")
    pts = users.select(
        "user_id",
        _lat_md(uid).alias("lat_md"),
        _lon_md(uid).alias("lon_md"),
    )
    cell = lambda lat, lon: (  # noqa: E731
        F.floor(lat / CELL_MD) * 1_000_000 + F.floor(lon / CELL_MD)
    )
    # side A explodes into its 3x3 neighborhood of cells; side B maps to
    # its own cell -> candidate pairs only within adjacent cells
    offsets = F.array(
        *[F.lit(dy * 1_000_000 + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    )
    own_cell = cell(F.col("lat_md"), F.col("lon_md"))
    a = pts.select(
        F.col("user_id").alias("user_a"),
        F.col("lat_md").alias("lat_a"),
        F.col("lon_md").alias("lon_a"),
        F.explode(
            F.transform(offsets, lambda o: o.cast("long") + own_cell)
        ).alias("cell"),
    )
    b = pts.select(
        F.col("user_id").alias("user_b"),
        F.col("lat_md").alias("lat_b"),
        F.col("lon_md").alias("lon_b"),
        cell(F.col("lat_md"), F.col("lon_md")).alias("cell"),
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    return (
        a.join(b, "cell")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.abs(dlat) <= GEO_RADIUS_MD)
            & (F.abs(dlon) <= GEO_RADIUS_MD)
            & (dist2 <= GEO_RADIUS_MD2)
        )
        .select(
            "user_a",
            "user_b",
            dist2.cast("long").alias("dist2_md"),
        )
    )


# ---------------------------------------------------------------------------
# geo_grid_density — activity density per grid cell
# ---------------------------------------------------------------------------

GEO_TOPK = 25


@register(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
      SELECT e.user_id, count(*) AS n_events,
             {_sql_lat("e.user_id")} AS lat_md,
             {_sql_lon("e.user_id")} AS lon_md
      FROM events e GROUP BY e.user_id
    )
    SELECT CAST(floor(CAST(lat_md AS DOUBLE) / {CELL_MD}) AS BIGINT)
             AS cell_lat,
           CAST(floor(CAST(lon_md AS DOUBLE) / {CELL_MD}) AS BIGINT)
             AS cell_lon,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM pts GROUP BY 1, 2
    ORDER BY n_events DESC, cell_lat, cell_lon LIMIT {GEO_TOPK}
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity density heatmap: user and event counts per 1° grid
    cell, top-{GEO_TOPK} hottest cells — the tile-aggregation shape
    behind every map heatmap layer.  Events first collapse to per-user
    counts (map-side combinable), locations derive from the same md5
    basis as the neighbor join, and the cell rollup + bounded top-k are
    exact integers end to end.

    Scale: two cascaded aggregations (user, then cell) with a
    TakeOrderedAndProject top-k — no joins, no windows; at planet scale
    the cell key space is bounded (64.8k cells at 1°) so the second
    aggregate is model-sized regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    uid = F.col("user_id")
    pts = per_user.select(
        "user_id",
        "n_events",
        _lat_md(uid).alias("lat_md"),
        _lon_md(uid).alias("lon_md"),
    )
    return (
        pts.groupBy(
            F.floor(F.col("lat_md").cast("double") / CELL_MD)
            .cast("long")
            .alias("cell_lat"),
            F.floor(F.col("lon_md").cast("double") / CELL_MD)
            .cast("long")
            .alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), "cell_lat", "cell_lon")
        .limit(GEO_TOPK)
    )
