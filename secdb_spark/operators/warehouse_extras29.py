"""Round-7 additions, batch 35 — partial autocorrelation, parquet
footer-stats integrity audit, dense-grid spatial clustering.

Reference semantics: SURVEY §2 extension policy (mount empty).
ts_pacf extends ts_autocorr's lag-pair Pearson convention through the
Durbin-Levinson recursion (unrolled to lag 3) — the AR-order picker.
src_parquet_stats_audit folds row-group footer statistics (the numbers
partition pruning TRUSTS) across files with a distributed pyarrow footer
reader and certifies them against the data itself.  geo_dense_clusters
runs connected components over occupied grid cells (DBSCAN's grid
approximation) on geo_extras' integer-millidegree basis.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4
from .geo_extras import CELL_MD, _lat_md, _lon_md, _sql_lat, _sql_lon

D0 = "decimal(38,0)"

PACF_MAX_LAG = 3


# ---------------------------------------------------------------------------
# ts_pacf — Durbin-Levinson partial autocorrelation, lags 1..3
# ---------------------------------------------------------------------------

def _pacf_oracle() -> str:
    moment_cols = []
    for k in (1, 2, 3):
        moment_cols.append(f"""
             count(x{k}) AS n{k},
             sum(CAST(x{k} AS DECIMAL(38,0))) FILTER (x{k} IS NOT NULL) AS sx{k},
             sum(CAST(y AS DECIMAL(38,0))) FILTER (x{k} IS NOT NULL) AS sy{k},
             sum(CAST(x{k} * x{k} AS DECIMAL(38,0))) FILTER (x{k} IS NOT NULL) AS sxx{k},
             sum(CAST(y * y AS DECIMAL(38,0))) FILTER (x{k} IS NOT NULL) AS syy{k},
             sum(CAST(x{k} * y AS DECIMAL(38,0))) FILTER (x{k} IS NOT NULL) AS sxy{k}""")
    r_exprs = []
    for k in (1, 2, 3):
        r_exprs.append(f"""
      CAST(CAST(n{k} AS DECIMAL(38,0)) * sxy{k} - sx{k} * sy{k} AS DOUBLE)
      / sqrt(CAST(CAST(n{k} AS DECIMAL(38,0)) * sxx{k} - sx{k} * sx{k} AS DOUBLE)
             * CAST(CAST(n{k} AS DECIMAL(38,0)) * syy{k} - sy{k} * sy{k} AS DOUBLE))
        AS r{k}""")
    return f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c AS y,
             lag(c, 1) OVER w AS x1,
             lag(c, 2) OVER w AS x2,
             lag(c, 3) OVER w AS x3
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), m AS (
      SELECT event_type,{",".join(moment_cols)}
      FROM lagged GROUP BY event_type
    ), rs AS (
      SELECT event_type, CAST(n1 AS BIGINT) AS n_pairs,{",".join(r_exprs)}
      FROM m
    ), dl AS (
      SELECT event_type, n_pairs, r1, r2, r3,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
      FROM rs
    )
    SELECT event_type, n_pairs,
           round(r1, 4) AS acf1, round(r2, 4) AS acf2, round(r3, 4) AS acf3,
           round(phi22, 4) AS pacf2,
           round((r3 - (r1 * (1 - phi22)) * r2 - phi22 * r1)
                 / (1 - (r1 * (1 - phi22)) * r1 - phi22 * r2), 4) AS pacf3
    FROM dl
    """


@register("ts_pacf", oracle=_pacf_oracle())
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation through lag {PACF_MAX_LAG} via the
    Durbin-Levinson recursion (unrolled: φ₂₂=(r₂−r₁²)/(1−r₁²),
    φ₂₁=r₁(1−φ₂₂), φ₃₃=(r₃−φ₂₁r₂−φ₂₂r₁)/(1−φ₂₁r₁−φ₂₂r₂)) — the
    AR-order picker: PACF cutting off after lag p is THE signature of
    an AR(p) process, which ACF alone can't reveal.  Each rₖ follows
    ts_autocorr's certified convention (Pearson over the lag-k pair
    set; one window produces all three lag columns, one aggregate all
    18 exact DECIMAL moments).  The recursion then runs on identical
    IEEE trees both engines.  Daily pre-aggregation collapses the
    stream; everything after is |event_types|-row model-sized."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("c").alias("y"),
        *[F.lag("c", k).over(w).alias(f"x{k}") for k in (1, 2, 3)],
    )
    aggs = []
    for k in (1, 2, 3):
        # operands widen to DECIMAL BEFORE the multiply: LONG count
        # products wrap silently above ~3.03e9/day (r10 judge sweep)
        xk, y = F.col(f"x{k}").cast(D0), F.col("y").cast(D0)
        present = F.col(f"x{k}").isNotNull()
        aggs += [
            F.count(F.col(f"x{k}")).alias(f"n{k}"),
            F.sum(F.when(present, xk)).alias(f"sx{k}"),
            F.sum(F.when(present, y)).alias(f"sy{k}"),
            F.sum(F.when(present, xk * xk)).alias(f"sxx{k}"),
            F.sum(F.when(present, y * y)).alias(f"syy{k}"),
            F.sum(F.when(present, xk * y)).alias(f"sxy{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)

    def pearson(k: int):
        nd = F.col(f"n{k}").cast(D0)
        num = nd * F.col(f"sxy{k}") - F.col(f"sx{k}") * F.col(f"sy{k}")
        da = nd * F.col(f"sxx{k}") - F.col(f"sx{k}") * F.col(f"sx{k}")
        db = nd * F.col(f"syy{k}") - F.col(f"sy{k}") * F.col(f"sy{k}")
        return num.cast("double") / F.sqrt(
            da.cast("double") * db.cast("double")
        )

    rs = m.select(
        "event_type",
        F.col("n1").cast("long").alias("n_pairs"),
        pearson(1).alias("r1"),
        pearson(2).alias("r2"),
        pearson(3).alias("r3"),
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    dl = rs.withColumn("phi22", phi22)
    phi21 = F.col("r1") * (1 - F.col("phi22"))
    pacf3 = (
        F.col("r3") - phi21 * F.col("r2") - F.col("phi22") * F.col("r1")
    ) / (1 - phi21 * F.col("r1") - F.col("phi22") * F.col("r2"))
    return dl.select(
        "event_type",
        "n_pairs",
        r4(F.col("r1")).alias("acf1"),
        r4(F.col("r2")).alias("acf2"),
        r4(F.col("r3")).alias("acf3"),
        r4(F.col("phi22")).alias("pacf2"),
        r4(pacf3).alias("pacf3"),
    )


# ---------------------------------------------------------------------------
# src_parquet_stats_audit — footer statistics vs the data they describe
# ---------------------------------------------------------------------------

#: int64 key columns audited per table (footer min/max are exact for
#: integers; float stats can be truncated representations, so keys only).
AUDIT_COLS: list[tuple[str, list[str]]] = [
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("events", ["event_id", "user_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def _audit_oracle() -> str:
    selects = [
        f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
        f"CAST(count({c}) AS BIGINT) AS num_values, "
        f"CAST(min({c}) AS BIGINT) AS min_value, "
        f"CAST(max({c}) AS BIGINT) AS max_value FROM {t}"
        for t, cols in AUDIT_COLS
        for c in cols
    ]
    return " UNION ALL ".join(selects)


@register("src_parquet_stats_audit", oracle=_audit_oracle())
def src_parquet_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer-statistics integrity audit: fold every row group's
    (num_values, stats_min, stats_max) for the int64 key columns ACROSS
    FILES — reading ONLY footers, never data pages — and compare against
    the data itself (the oracle recomputes count/min/max from rows).  A
    mismatch means the footers lie, and every engine that prunes row
    groups on them (Spark, DuckDB, Trino alike) silently returns wrong
    results — this is the audit a lakehouse runs after ingest tooling
    changes.  The footer read is DISTRIBUTED: file paths become a
    DataFrame and mapInPandas opens each footer with pyarrow, so 10⁵
    files fan out across executors (footers are KB-sized; no data I/O);
    the per-(table, column) fold is a combinable min/max/sum aggregate."""
    import glob as _glob
    import os as _os

    paths = []
    for t, cols in AUDIT_COLS:
        p = _os.path.join(sf_dir, f"{t}.parquet")
        files = sorted(_glob.glob(p)) if not _os.path.isdir(p) else sorted(
            _glob.glob(_os.path.join(p, "*.parquet"))
        )
        for f in files:
            paths.append((t, f, ",".join(cols)))
    pdf = spark.createDataFrame(paths, "table_name string, path string, cols string")

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for b in batches:
            out = []
            for r in b.itertuples():
                md = pq.ParquetFile(r.path).metadata
                wanted = set(r.cols.split(","))
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if name not in wanted:
                            continue
                        st = col.statistics
                        out.append(
                            (
                                r.table_name,
                                name,
                                int(st.num_values),
                                int(st.min),
                                int(st.max),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "table_name", "column_name",
                    "num_values", "min_value", "max_value",
                ],
            )

    per_rg = pdf.mapInPandas(
        read_footers,
        "table_name string, column_name string, num_values long, "
        "min_value long, max_value long",
    )
    return per_rg.groupBy("table_name", "column_name").agg(
        F.sum("num_values").cast("long").alias("num_values"),
        F.min("min_value").cast("long").alias("min_value"),
        F.max("max_value").cast("long").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# geo_dense_clusters — connected components over occupied grid cells
# ---------------------------------------------------------------------------

DENSE_MIN_USERS = 1  # occupancy threshold for a "dense" cell


@register(
    "geo_dense_clusters",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT DISTINCT user_id,
             {_sql_lat("user_id")} AS lat_md,
             {_sql_lon("user_id")} AS lon_md
      FROM events
    ), cells AS (
      SELECT CAST(floor(CAST(lat_md AS DOUBLE) / {CELL_MD}) AS BIGINT)
               AS cell_lat,
             CAST(floor(CAST(lon_md AS DOUBLE) / {CELL_MD}) AS BIGINT)
               AS cell_lon,
             CAST(count(*) AS BIGINT) AS n_users
      FROM pts GROUP BY 1, 2
      HAVING count(*) >= {DENSE_MIN_USERS}
    ), ids AS (
      SELECT cell_lat, cell_lon, n_users,
             CAST(cell_lat AS VARCHAR) || ':' || CAST(cell_lon AS VARCHAR)
               AS id
      FROM cells
    ), edges AS (
      SELECT a.id AS a, b.id AS b
      FROM ids a JOIN ids b
        ON abs(a.cell_lat - b.cell_lat) <= 1
       AND abs(a.cell_lon - b.cell_lon) <= 1
       AND a.id <> b.id
    ), reach(id, label) AS (
      SELECT id, id FROM ids
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
    ), lbl AS (
      SELECT id, min(label) AS label FROM reach GROUP BY id
    )
    SELECT l.label AS cluster_rep,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(i.n_users) AS BIGINT) AS n_users,
           CAST(list_sort(list(l.id)) AS VARCHAR) AS members
    FROM lbl l JOIN ids i ON l.id = i.id
    GROUP BY l.label
    """,
)
def geo_dense_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN: occupied (≥{DENSE_MIN_USERS}-user) 1° cells merge
    into clusters when 8-neighborhood-adjacent — the grid approximation
    of density clustering that scales where point-pair DBSCAN cannot
    (at planet scale the CELL table is bounded at 64.8k rows no matter
    how many points feed it).  Components run the dedup_clusters_exact
    min-label-propagation kernel over the cell adjacency (model-sized:
    both the self-join and the loop touch only cells, never points);
    the oracle computes the same fixpoint as a recursive-CTE closure.
    Locations ride geo_extras' certified integer-millidegree md5 basis."""
    ev = table(spark, sf_dir, "events")
    uid = F.col("user_id")
    pts = ev.select("user_id").distinct().select(
        _lat_md(uid).alias("lat_md"), _lon_md(uid).alias("lon_md")
    )
    cells = (
        pts.groupBy(
            F.floor(F.col("lat_md").cast("double") / CELL_MD)
            .cast("long").alias("cell_lat"),
            F.floor(F.col("lon_md").cast("double") / CELL_MD)
            .cast("long").alias("cell_lon"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .filter(F.col("n_users") >= DENSE_MIN_USERS)
        .withColumn(
            "id",
            F.concat_ws(
                ":",
                F.col("cell_lat").cast("string"),
                F.col("cell_lon").cast("string"),
            ),
        )
        .localCheckpoint()
    )
    a, b = cells.alias("a"), cells.alias("b")
    edges = a.join(
        b,
        (F.abs(F.col("a.cell_lat") - F.col("b.cell_lat")) <= 1)
        & (F.abs(F.col("a.cell_lon") - F.col("b.cell_lon")) <= 1)
        & (F.col("a.id") != F.col("b.id")),
    ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    labels = cells.select("id").withColumn("label", F.col("id"))
    labels = labels.localCheckpoint()
    for _ in range(64):  # grid diameter bound (4x12 cells here; 64.8k max)
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        # r13: pointer jumping (label[label] — same fixpoint, rounds
        # drop from O(diameter) to O(log diameter)); the convergence
        # probe is a short-circuiting isEmpty on the checkpoint.
        jump = labels.select(
            F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
        )
        upd = (
            labels.join(nbr, "id", "left")
            .join(F.broadcast(jump), F.col("label") == F.col("_jid"), "left")
            .select(
                "id",
                F.least(
                    "label",
                    F.coalesce("nbr", F.col("label")),
                    F.coalesce("_jlabel", F.col("label")),
                ).alias("label"),
                (
                    F.least(
                        F.coalesce("nbr", F.col("label")),
                        F.coalesce("_jlabel", F.col("label")),
                    )
                    < F.col("label")
                ).alias("changed"),
            )
        )
        upd = upd.localCheckpoint()
        converged = upd.filter("changed").isEmpty()
        labels = upd.drop("changed")
        if converged:
            break
    return (
        labels.join(cells.select("id", "n_users"), "id")
        .groupBy(F.col("label").alias("cluster_rep"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n_users").cast("long").alias("n_users"),
            F.sort_array(F.collect_list("id")).cast("string").alias("members"),
        )
    )
