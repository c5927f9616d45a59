"""Spatial-predicate operators: point-in-polygon geofencing.

The heatmap family quantizes points to tile grids; geofencing is the
complementary spatial primitive — classify each point against a set of
NAMED polygons (delivery zones, country outlines, restricted areas)
and aggregate per fence.

Design for 100 TB: the polygons are plan literals, so the ray-casting
test compiles to an UNROLLED sum of per-edge CASE expressions — pure
Column arithmetic fused into the scan (map-only, zero joins, one
aggregation exchange on the 3-row fence key; pinned in test_plans.py).
A polygon table would instead broadcast-join (small side = fences) and
evaluate the same arithmetic via higher-order functions over the
vertex arrays; the literal form is the right call while the fence set
fits in a plan (thousands of vertices), exactly like the IVF codebook
trade-off in similarity.py.  For serving-style reads, combine with the
tile-store bbox pushdown (PLANS.md §8): a fence's bounding box becomes
a tile-range predicate that prunes row groups BEFORE the exact
point-in-polygon test runs.

Cross-engine exactness: the even-odd rule needs only comparisons and
one guarded division per edge; every constant is emitted into BOTH the
Column tree and the DuckDB oracle via ``repr(float)`` (round-trip
exact), and the operand order is identical, so inside/outside
decisions are bit-identical and the per-fence counts value-hash.

Reference: none — SURVEY.md §2.8 geo family extension (the reference
engine has no polygon surface; its spatial ops are tile quantization
only, tile.py:24-47).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.sources.locations import load_locations

# (name, [(lon, lat), ...]) — simple (non-self-intersecting) polygons,
# vertices chosen OFF the fixture's 3-decimal lat/lon lattice so no
# generated point ever lies exactly on an edge (ties would still be
# cross-engine consistent, but keeping them impossible makes the
# even-odd rule unambiguous).
GEOFENCES: list[tuple[str, list[tuple[float, float]]]] = [
    (
        "atlantic_pentagon",
        [
            (-60.12345, -20.56785),
            (-10.43215, -35.87655),
            (15.24685, 10.13575),
            (-25.97535, 40.86425),
            (-55.11115, 25.33335),
        ],
    ),
    (
        "pacific_triangle",
        [(120.50015, -30.20025), (170.70035, 5.40045), (135.90055, 45.60065)],
    ),
    (
        "polar_quad",
        [
            (-150.30075, 60.70085),
            (150.10095, 55.90105),
            (140.20115, 80.30125),
            (-140.40135, 78.50145),
        ],
    ),
]


def _edges(poly: list[tuple[float, float]]):
    return list(zip(poly, poly[1:] + poly[:1]))


def point_in_polygon(
    lon: Column, lat: Column, poly: list[tuple[float, float]]
) -> Column:
    """Even-odd ray casting as an unrolled Column expression: a ray due
    east of (lon, lat) crosses edge ((x1,y1),(x2,y2)) iff the edge
    spans the point's latitude strictly ((y1 > lat) != (y2 > lat)) and
    the crossing abscissa dx·(lat−y1)/dy + x1 lies east of the point.
    The strict-span guard makes dy nonzero wherever the division is
    used, and shared vertices count once (one incident edge spans any
    non-vertex latitude)."""
    crossings: Column = F.lit(0)
    for (x1, y1), (x2, y2) in _edges(poly):
        dx, dy = x2 - x1, y2 - y1
        spans = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        xcross = F.lit(dx) * (lat - F.lit(y1)) / F.lit(dy) + F.lit(x1)
        crossings = crossings + F.when(
            spans, F.when(lon < xcross, F.lit(1)).otherwise(F.lit(0))
        ).otherwise(F.lit(0))
    return crossings % 2 == 1


def geofence_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (q_geofence): per-fence visit counts and distinct
    visitors over the locations stream (background rows excluded, like
    every heatmap ingest).  Always emits one row per declared fence —
    zero-hit fences report 0, not an absent row."""
    loc = load_locations(spark, sf_dir).where(F.col("source") != "background")
    lon, lat = F.col("longitude"), F.col("latitude")
    flags = F.array(
        *[
            F.struct(
                F.lit(name).alias("fence"),
                point_in_polygon(lon, lat, poly).alias("inside"),
            )
            for name, poly in GEOFENCES
        ]
    )
    per_point = loc.select("user_id", F.explode(flags).alias("f"))
    return (
        per_point.groupBy(F.col("f.fence").alias("fence"))
        .agg(
            F.sum(F.when(F.col("f.inside"), F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_points"),
            F.count_distinct(
                F.when(F.col("f.inside"), F.col("user_id"))
            ).alias("n_users"),
        )
        .select("fence", "n_points", F.col("n_users").cast("bigint").alias("n_users"))
    )


def _crossing_sql(poly: list[tuple[float, float]]) -> str:
    terms = []
    for (x1, y1), (x2, y2) in _edges(poly):
        dx, dy = x2 - x1, y2 - y1
        terms.append(
            f"CASE WHEN ({y1!r} > latitude) <> ({y2!r} > latitude) THEN "
            f"(CASE WHEN longitude < {dx!r} * (latitude - {y1!r}) / {dy!r} "
            f"+ {x1!r} THEN 1 ELSE 0 END) ELSE 0 END"
        )
    return " + ".join(terms)


def geofence_oracle_sql(locations_cte: str) -> str:
    """DuckDB oracle built from the SAME polygon constants (repr
    round-trips doubles exactly, so both engines test identical
    literals in identical operand order)."""
    arms = []
    for name, poly in GEOFENCES:
        arms.append(
            f"""SELECT '{name}' AS fence,
  CAST(sum(CASE WHEN ({_crossing_sql(poly)}) % 2 = 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_points,
  CAST(count(DISTINCT CASE WHEN ({_crossing_sql(poly)}) % 2 = 1
       THEN user_id END) AS BIGINT) AS n_users
FROM pts"""
        )
    body = "\nUNION ALL\n".join(arms)
    return (
        f"WITH {locations_cte},\n"
        "pts AS (SELECT longitude, latitude, user_id FROM locations "
        "WHERE source <> 'background')\n" + body
    )


def geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (q_geofence_transitions): enter/exit event
    detection — for every (user, fence), order the user's points by
    time and compare each point's membership with the previous one
    (lag); a false→true flip is an entry, true→false an exit.

    This is the geofencing product feature (arrival notifications,
    zone-dwell billing) composed from the repo's two primitives: the
    plan-literal point-in-polygon test (map-only) and the single-sort
    window chain (PLANS.md §11 — ONE exchange on the partition key
    (user_id, fence), every lag reuses the sort, and the final
    per-fence rollup is a second exchange over transition rows only).
    Event times are globally unique in the fixture, so the (ts) order
    is total and the lag is deterministic."""
    loc = load_locations(spark, sf_dir).where(F.col("source") != "background")
    lon, lat = F.col("longitude"), F.col("latitude")
    flags = F.array(
        *[
            F.struct(
                F.lit(name).alias("fence"),
                point_in_polygon(lon, lat, poly).alias("inside"),
            )
            for name, poly in GEOFENCES
        ]
    )
    per_point = loc.select("user_id", "ts", F.explode(flags).alias("f")).select(
        "user_id", "ts", F.col("f.fence").alias("fence"), F.col("f.inside").alias("inside")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id", "fence").orderBy("ts")
    marked = per_point.select(
        "user_id",
        "fence",
        "inside",
        F.lag("inside").over(w).alias("prev"),
    )
    return (
        marked.groupBy("fence")
        .agg(
            F.sum(
                F.when(F.col("inside") & ~F.coalesce("prev", F.lit(False)), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_entries"),
            F.sum(
                F.when(
                    ~F.col("inside") & F.coalesce("prev", F.lit(False)), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_exits"),
            F.count_distinct(
                F.when(
                    F.col("inside") & ~F.coalesce("prev", F.lit(False)),
                    F.col("user_id"),
                )
            )
            .cast("bigint")
            .alias("n_entering_users"),
        )
        .select("fence", "n_entries", "n_exits", "n_entering_users")
    )


def geofence_transitions_oracle_sql(locations_cte: str) -> str:
    """DuckDB oracle for :func:`geofence_transitions`, generated from
    the same polygon constants."""
    arms = []
    for name, poly in GEOFENCES:
        arms.append(
            f"""SELECT user_id, ts, '{name}' AS fence,
  (({_crossing_sql(poly)}) % 2 = 1) AS inside
FROM pts"""
        )
    member = "\nUNION ALL\n".join(arms)
    return (
        f"WITH {locations_cte},\n"
        "pts AS (SELECT longitude, latitude, user_id, ts FROM locations "
        "WHERE source <> 'background'),\n"
        f"member AS (\n{member}),\n"
        """marked AS (
  SELECT fence, user_id, inside,
    lag(inside) OVER (PARTITION BY user_id, fence ORDER BY ts) AS prev
  FROM member)
SELECT fence,
  CAST(sum(CASE WHEN inside AND NOT coalesce(prev, false) THEN 1 ELSE 0 END)
       AS BIGINT) AS n_entries,
  CAST(sum(CASE WHEN NOT inside AND coalesce(prev, false) THEN 1 ELSE 0 END)
       AS BIGINT) AS n_exits,
  CAST(count(DISTINCT CASE WHEN inside AND NOT coalesce(prev, false)
       THEN user_id END) AS BIGINT) AS n_entering_users
FROM marked GROUP BY fence"""
    )
