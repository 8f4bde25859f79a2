"""Time-series / hypertable-style operators over the `events` table.

The reference's event-log surface (SURVEY §1.3, §2.I) covers streaming
sessionization and windowed aggregates; these are the BATCH counterparts a
warehouse runs over the historical event store — gap-based sessionization
as pure window algebra, and the TimescaleDB-style "continuous aggregate"
rollup where coarser resolutions re-aggregate finer partials instead of
rescanning the raw events.

Scale notes (100 TB event store):
- `events_sessionize` costs exactly ONE shuffle: both window specs and the
  final groupBy share the user_id hash partitioning, so Catalyst plans a
  single Exchange followed by one sort — verified in tests/test_plans.py.
  Per-user state is a running sum, never a materialized session list.
- `rollup_timeseries` scans raw events ONCE for the finest resolution;
  every coarser bucket re-aggregates the hourly partials (|hours| rows,
  ~10^5 per year — trivially small vs 10^12 raw events).  This is the
  hypertable invariant: rollup cost is proportional to the finer AGGREGATE,
  not to the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches stream_session


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           round(sum(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 30-min-gap sessionization — the historical-store counterpart
    of stream_session, expressed as window algebra: flag a session break
    where the gap to the previous event exceeds the threshold, running-sum
    the flags into a per-user session sequence, then aggregate per session.

    Both windows and the final groupBy hash-partition on user_id, so the
    whole pipeline is one Exchange + one sort; ts is projected to epoch-µs
    once so the lag/running-sum operate on plain longs."""
    ev = table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("us") - F.lag("us").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq", F.sum("new_sess").over(run).cast("long")
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "rollup_timeseries",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             count(*) AS n_events, sum(value) AS raw_sum
      FROM events
      GROUP BY 1, 2
    )
    SELECT 'hour' AS resolution, event_type, bucket,
           n_events, round(raw_sum, 4) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS resolution, event_type,
           date_trunc('day', bucket) AS bucket,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(sum(raw_sum), 4) AS sum_value
    FROM hourly
    GROUP BY 2, 3
    """,
)
def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly per-type
    aggregates from ONE scan of raw events, then the daily resolution
    re-aggregated FROM THE HOURLY PARTIALS (sum of sums / sum of counts) —
    never a second pass over raw data.  Both resolutions union into one
    result keyed by a `resolution` column.

    Rounding happens only at the output projection (the daily re-aggregate
    sums RAW hourly sums) so the two resolutions stay bit-consistent with
    a direct daily aggregation."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("raw_sum"),
    )
    hour_out = hourly.select(
        F.lit("hour").alias("resolution"),
        "event_type",
        "bucket",
        "n_events",
        F.round("raw_sum", 4).alias("sum_value"),
    )
    day_out = (
        hourly.groupBy("event_type", F.date_trunc("day", "bucket").alias("bucket"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("raw_sum").alias("raw_sum"),
        )
        .select(
            F.lit("day").alias("resolution"),
            "event_type",
            "bucket",
            "n_events",
            F.round("raw_sum", 4).alias("sum_value"),
        )
    )
    return hour_out.unionByName(day_out)
