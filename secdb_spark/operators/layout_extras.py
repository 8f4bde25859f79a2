"""Round-6 additions, batch 12 — SURVEY §2.Z: multi-dimensional data
layout (Z-order / Morton clustering) and character-n-gram language
profiles.

Design rules as everywhere in this package: one declarative DataFrame
plan per op, every value reaching the driver exact integer or an
identical IEEE tree in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register

Z_BITS = 8            # bits per dimension (16-bit Morton code)
Z_BLOCK = 16          # z-values per reported block
Z_DATE_EPOCH = "1995-01-01"
Z_DATE_DIV = 10       # days per date bucket


def _morton_sql(xb: str, yb: str) -> str:
    """Dialect: DuckDB (>> << &)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey,
             CAST(o_custkey % {1 << Z_BITS} AS BIGINT) AS xb,
             CAST((datediff('day', DATE '{Z_DATE_EPOCH}',
                            CAST(o_orderdate AS DATE)) // {Z_DATE_DIV})
                  % {1 << Z_BITS} AS BIGINT) AS yb
      FROM orders
    ), z AS (
      SELECT o_orderkey, xb, yb,
             CAST({_morton_sql("xb", "yb")} AS BIGINT) AS zval
      FROM b
    )
    SELECT CAST(zval // {Z_BLOCK} AS BIGINT) AS z_block,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(xb) AS BIGINT) AS min_xb, CAST(max(xb) AS BIGINT) AS max_xb,
           CAST(min(yb) AS BIGINT) AS min_yb, CAST(max(yb) AS BIGINT) AS max_yb
    FROM z GROUP BY 1
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of orders on (customer, date) — the
    multi-dimensional lakehouse layout technique: interleaving the bit
    representations of two bucket coordinates produces a 1-D sort key
    whose contiguous ranges cover small RECTANGLES of the 2-D space, so
    files written in z-order can be pruned by min/max footer stats on
    EITHER dimension (a plain sort clusters one dimension and scatters
    the other).  The op emits per-z-block extent stats — each block's
    (min,max) bucket rectangle is the pruning envelope a reader would
    get — all exact integer bit arithmetic, certified cross-engine.

    Scale: the Morton code is {2 * Z_BITS} scan-fused shift/mask terms
    (whole-stage codegen); the block rollup is one bounded-key
    aggregate.  In production the z-value feeds repartitionByRange +
    sortWithinPartitions before the parquet write — the layout.py
    write path composes with this column directly.  Block extents are
    the measurable evidence: max_xb−min_xb and max_yb−min_yb stay
    O(2^{Z_BITS}/sqrt(blocks)) — BOTH dimensions bounded, the property
    a single-column sort cannot give."""
    o = table(spark, sf_dir, "orders")
    xb = (F.col("o_custkey") % (1 << Z_BITS)).cast("long")
    yb = (
        F.floor(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit(Z_DATE_EPOCH).cast("date")
            )
            / Z_DATE_DIV
        )
        % (1 << Z_BITS)
    ).cast("long")
    b = o.select("o_orderkey", xb.alias("xb"), yb.alias("yb"))
    zval = None
    for i in range(Z_BITS):
        tx = F.shiftleft(
            F.shiftright(F.col("xb"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        ty = F.shiftleft(
            F.shiftright(F.col("yb"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        zval = tx + ty if zval is None else zval + tx + ty
    z = b.select("xb", "yb", zval.cast("long").alias("zval"))
    return (
        z.groupBy(F.floor(F.col("zval") / Z_BLOCK).cast("long").alias("z_block"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("xb").alias("min_xb"),
            F.max("xb").alias("max_xb"),
            F.min("yb").alias("min_yb"),
            F.max("yb").alias("max_yb"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_char_trigrams — character-n-gram language profiles
# ---------------------------------------------------------------------------

CHAR_TOPK = 20
CHAR_MAXLEN = 600  # static position-spine bound; Spark side asserts <= this


@register(
    "corpus_char_trigrams",
    oracle=f"""
    WITH pos AS (
      SELECT lang, text, unnest(range(1, {CHAR_MAXLEN})) AS p
      FROM documents
    ), tri AS (
      SELECT lang, substr(text, p, 3) AS g
      FROM pos WHERE p + 2 <= length(text)
    ), counts AS (
      SELECT lang, g, count(*) AS n FROM tri GROUP BY lang, g
    ), ranked AS (
      SELECT lang, g, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rk
      FROM counts
    )
    SELECT lang, g, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {CHAR_TOPK}
    """,
)
def corpus_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile (top-{CHAR_TOPK}) — the
    feature table a classic n-gram language identifier ranks against
    (text_langid consumes word-level signals; character n-grams are the
    script-robust variant that survives unseen vocabulary).  Trigrams
    come from a position spine + substring — pure JVM-side string ops,
    no UDF — and the per-language top-k is a bounded rank window over
    the (lang, gram) aggregate.

    Scale: the explode multiplies rows by document LENGTH, but the
    grouped count combines map-side before the (lang, gram) exchange;
    the rank window input is |langs|·|distinct grams| — model-sized.
    The {CHAR_MAXLEN}-char spine bound is asserted (documents here are
    short); production chunks long docs first (text_chunk composes)."""
    docs = table(spark, sf_dir, "documents")
    max_len = docs.agg(F.max(F.length("text"))).collect()[0][0]
    assert max_len is not None and max_len + 1 <= CHAR_MAXLEN, (
        f"document length {max_len} exceeds the static oracle spine "
        f"{CHAR_MAXLEN}; raise CHAR_MAXLEN"
    )
    tri = docs.select(
        "lang",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("p"),
    ).select("lang", F.expr("substr(text, p, 3)").alias("g"))
    counts = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), "g")
    ranked = counts.select(
        "lang", "g", "n", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= CHAR_TOPK)
    return ranked.select(
        "lang",
        "g",
        F.col("n").cast("long").alias("n"),
        F.col("rk").cast("long").alias("rk"),
    )
