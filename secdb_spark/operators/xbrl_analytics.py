"""Round-6 additions, batch 7 — SURVEY §2.U: EXACT certification for the
XBRL analytics layer, the reference's core domain (altova/SECDB layer 2:
standardized cross-company / cross-period financial queries).

The XBRL chain was R-class until now because no SQL engine can parse the
XML fixtures.  These ops close that gap with GOLDEN differential
oracles: fixtures/gen_xbrl.py generates every filing as a PURE FUNCTION
of (company, quarter, concept, region), so the expected analytics can be
recomputed in plain Python arithmetic — an INDEPENDENT path from the
Spark side, which genuinely parses the 100 XML instances with
ElementTree inside mapInPandas, resolves contexts/dimensions, applies
amendment supersedence, and aggregates.  The oracle is the Python-
computed result rendered as a VALUES literal: if the parse, the
supersedence rule, the dimension filters, or the ratio arithmetic drift,
the driver's value hash catches it.  Derived ratios are fixed-point
basis points computed by the IDENTICAL IEEE expression (Python floats
are doubles; `floor(a*10000/b + 0.5)` with both products exact below
2^53), so no rounding-mode divergence is possible.

Scope note: golden ops restrict to the generated cohort (ciks
0000001000–0000001019); the 4 hand-written fixtures keep exercising the
parser through the original R-class chain.
"""

from __future__ import annotations

import importlib.util
import math
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from .sources_sinks import FIXTURES_DIR, _xbrl_facts, _xbrl_supersede_facts


def _load_gen():
    path = os.path.abspath(os.path.join(FIXTURES_DIR, "gen_xbrl.py"))
    spec = importlib.util.spec_from_file_location("gen_xbrl", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_GEN = _load_gen()
GEN_CIKS = tuple(_GEN.cik(ci) for ci in range(_GEN.N_COMPANIES))
_QE = [end for (_s, end) in _GEN.QUARTERS]  # quarter period_end strings


def _values_sql(rows: list[tuple], cols: str) -> str:
    """Render golden rows as a DuckDB VALUES relation."""

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        return repr(v)

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {body}) AS t({cols})"


def _cons_value(ci: int, qi: int, concept: str) -> int:
    """Post-supersedence consolidated value: the amendment (latest
    accession) wins for the amended quarter."""
    amended = qi == _GEN.AMENDED_QUARTER
    return _GEN.value(ci, qi, concept, None, amended)


def _region_value(ci: int, qi: int, region: str) -> int:
    amended = qi == _GEN.AMENDED_QUARTER
    return _GEN.value(ci, qi, "us-gaap:Revenues", region, amended)


def _bp(num: int, den: int) -> int:
    """floor(num*10000/den + 0.5) — the shared Python/Spark IEEE tree."""
    return math.floor(num * 10000 / den + 0.5)


# ---------------------------------------------------------------------------
# xbrl_q_trend — QoQ consolidated revenue growth, post-supersedence
# ---------------------------------------------------------------------------

def _trend_gold() -> list[tuple]:
    rows = []
    for ci in range(_GEN.N_COMPANIES):
        prev = None
        for qi in range(len(_GEN.QUARTERS)):
            rev = _cons_value(ci, qi, "us-gaap:Revenues")
            growth = (
                None
                if prev is None
                else math.floor((rev / prev - 1) * 10000 + 0.5)
            )
            rows.append((_GEN.cik(ci), _QE[qi], rev, prev, growth))
            prev = rev
    return rows


@register(
    "xbrl_q_trend",
    oracle=_values_sql(
        _trend_gold(),
        "cik, period_end, revenue, prev_revenue, qoq_growth_bp",
    ),
)
def xbrl_q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter consolidated revenue growth per company —
    the reference's headline cross-period query shape, certified EXACTLY
    end to end: XML parse → context resolution → consolidated filter
    (no dimension members) → amendment supersedence → lag window →
    fixed-point growth.  The oracle is the generator's ground truth
    recomputed in Python, so a silent parse or supersedence regression
    flips the value hash.

    Scale: facts partition by accession at parse; the per-company series
    is a (cik) window over the filing-level aggregate — model-sized
    after the consolidated filter (one row per filing)."""
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.col("concept") == "us-gaap:Revenues")
        & (F.size("dims") == 0)
        & F.col("cik").isin(*GEN_CIKS)
    )
    series = facts.select(
        "cik",
        "period_end",
        F.col("value_num").cast("long").alias("revenue"),
    )
    w = Window.partitionBy("cik").orderBy("period_end")
    prev = F.lag("revenue").over(w)
    return series.select(
        "cik",
        "period_end",
        "revenue",
        prev.alias("prev_revenue"),
        F.floor(
            (F.col("revenue").cast("double") / prev - 1) * 10000 + 0.5
        )
        .cast("long")
        .alias("qoq_growth_bp"),
    )


# ---------------------------------------------------------------------------
# xbrl_q_ratios — leverage and margin in exact basis points
# ---------------------------------------------------------------------------

def _ratios_gold() -> list[tuple]:
    rows = []
    for ci in range(_GEN.N_COMPANIES):
        for qi in range(len(_GEN.QUARTERS)):
            rev = _cons_value(ci, qi, "us-gaap:Revenues")
            ni = _cons_value(ci, qi, "us-gaap:NetIncomeLoss")
            assets = _cons_value(ci, qi, "us-gaap:Assets")
            liab = _cons_value(ci, qi, "us-gaap:Liabilities")
            rows.append(
                (
                    _GEN.cik(ci),
                    _QE[qi],
                    _bp(liab, assets),
                    _bp(ni, rev),
                )
            )
    return rows


@register(
    "xbrl_q_ratios",
    oracle=_values_sql(
        _ratios_gold(), "cik, period_end, leverage_bp, net_margin_bp"
    ),
)
def xbrl_q_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial ratio screen per filing (post-supersedence): leverage
    (liabilities/assets) and net margin (net income/revenue) in exact
    basis points — the standardized-metric layer SECDB exists to serve,
    certified against generator ground truth.  Ratios use the shared
    `floor(a·10⁴/b + 0.5)` IEEE tree (products exact below 2^53 at these
    magnitudes), so the integer bp values are cross-engine stable in a
    way raw double division would not guarantee.

    Scale: one pivot-style conditional aggregation per (cik, period)
    over the consolidated facts — map-side combinable; output is one row
    per filing."""
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.size("dims") == 0) & F.col("cik").isin(*GEN_CIKS)
    )
    v = F.col("value_num").cast("long")

    def of(concept: str):
        return F.min(F.when(F.col("concept") == concept, v))

    # instant facts (Assets/Liabilities at the balance date) carry
    # period_instant; duration facts carry period_end — the filing's
    # reporting date is their coalesce (both are the quarter end)
    facts = facts.withColumn(
        "period_end", F.coalesce("period_end", "period_instant")
    )
    g = facts.groupBy("cik", "period_end").agg(
        of("us-gaap:Revenues").alias("rev"),
        of("us-gaap:NetIncomeLoss").alias("ni"),
        of("us-gaap:Assets").alias("assets"),
        of("us-gaap:Liabilities").alias("liab"),
    )

    def bp(num, den):
        return (
            F.floor(num.cast("double") * 10000 / den + 0.5)
            .cast("long")
        )

    return g.select(
        "cik",
        "period_end",
        bp(F.col("liab"), F.col("assets")).alias("leverage_bp"),
        bp(F.col("ni"), F.col("rev")).alias("net_margin_bp"),
    )


# ---------------------------------------------------------------------------
# xbrl_q_restatement — amendment impact report
# ---------------------------------------------------------------------------

def _restatement_gold() -> list[tuple]:
    rows = []
    qi = _GEN.AMENDED_QUARTER
    for ci in range(_GEN.N_COMPANIES):
        for concept in _GEN.DUR_CONCEPTS + _GEN.INST_CONCEPTS:
            orig = _GEN.value(ci, qi, concept, None, False)
            amended = _GEN.value(ci, qi, concept, None, True)
            if orig != amended:
                rows.append(
                    (
                        _GEN.cik(ci),
                        _QE[qi],
                        concept,
                        orig,
                        amended,
                        amended - orig,
                    )
                )
    return rows


@register(
    "xbrl_q_restatement",
    oracle=_values_sql(
        _restatement_gold(),
        "cik, period_end, concept, original_value, amended_value, delta",
    ),
)
def xbrl_q_restatement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restatement impact report: for every amended consolidated fact,
    the original 10-Q value, the 10-Q/A value, and the delta — the audit
    question amendments exist to answer ("what changed, by how much").
    Original and amendment facts join on (cik, period_end, concept)
    within the consolidated context; equal values drop out, so the
    report contains exactly the restated concepts.

    Scale: both sides are filing-level consolidated facts (one row per
    concept per filing) — the join key is the natural (cik, period)
    partitioning; no fact-stream blowup."""
    facts = _xbrl_facts(spark, sf_dir).filter(
        (F.size("dims") == 0)
        & F.col("cik").isin(*GEN_CIKS)
        & F.col("value_num").isNotNull()
    )
    v = F.col("value_num").cast("long")
    orig = facts.filter(F.col("form") == "10-Q").select(
        "cik", "period_end", "concept", v.alias("original_value")
    )
    amend = facts.filter(F.col("form") == "10-Q/A").select(
        "cik", "period_end", "concept", v.alias("amended_value")
    )
    return (
        orig.join(amend, ["cik", "period_end", "concept"])
        .filter(F.col("original_value") != F.col("amended_value"))
        .select(
            "cik",
            "period_end",
            "concept",
            "original_value",
            "amended_value",
            (F.col("amended_value") - F.col("original_value")).alias(
                "delta"
            ),
        )
    )


# ---------------------------------------------------------------------------
# xbrl_region_mix — dimensioned revenue shares, post-supersedence
# ---------------------------------------------------------------------------

def _region_gold() -> list[tuple]:
    rows = []
    for ci in range(_GEN.N_COMPANIES):
        for qi in range(len(_GEN.QUARTERS)):
            vals = {r: _region_value(ci, qi, r) for r in _GEN.REGIONS}
            total = sum(vals.values())
            for r in _GEN.REGIONS:
                rows.append(
                    (
                        _GEN.cik(ci),
                        _QE[qi],
                        r,
                        vals[r],
                        _bp(vals[r], total),
                    )
                )
    return rows


@register(
    "xbrl_region_mix",
    oracle=_values_sql(
        _region_gold(), "cik, period_end, region, revenue, share_bp"
    ),
)
def xbrl_region_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue mix per filing from the DIMENSIONED contexts
    (seg:Region single-member contexts only — the two-dimensional
    AMER×ONLINE context must be excluded, which is exactly the
    dimension-discipline mistake this golden oracle would catch):
    per-region revenue and its share of the regional total in exact
    basis points, post-supersedence.

    Scale: the dimension filter is a map predicate inside the scan of
    the superseded facts; the share window runs per (cik, period) over
    exactly |regions| rows."""
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.col("concept") == "us-gaap:Revenues")
        & (F.size("dims") == 1)
        & F.col("dims")["seg:Region"].isNotNull()
        & F.col("cik").isin(*GEN_CIKS)
    )
    v = F.col("value_num").cast("long")
    rows = facts.select(
        "cik",
        "period_end",
        F.col("dims")["seg:Region"].alias("region"),
        v.alias("revenue"),
    )
    w = Window.partitionBy("cik", "period_end")
    total = F.sum("revenue").over(w)
    return rows.select(
        "cik",
        "period_end",
        "region",
        "revenue",
        F.floor(F.col("revenue").cast("double") * 10000 / total + 0.5)
        .cast("long")
        .alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# xbrl_peer_rank — quarterly revenue league table across the cohort
# ---------------------------------------------------------------------------

def _peer_rank_gold() -> list[tuple]:
    rows = []
    for qi in range(len(_GEN.QUARTERS)):
        revs = [
            (_cons_value(ci, qi, "us-gaap:Revenues"), _GEN.cik(ci))
            for ci in range(_GEN.N_COMPANIES)
        ]
        total = sum(r for r, _ in revs)
        for rank, (rev, cik) in enumerate(
            sorted(revs, key=lambda t: (-t[0], t[1])), start=1
        ):
            rows.append((cik, _QE[qi], rev, rank, _bp(rev, total)))
    return rows


@register(
    "xbrl_peer_rank",
    oracle=_values_sql(
        _peer_rank_gold(), "cik, period_end, revenue, peer_rank, share_bp"
    ),
)
def xbrl_peer_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly revenue league table across the filing cohort
    (post-supersedence): rank within each quarter (revenue DESC, cik
    tiebreak) and share of cohort revenue in exact basis points — the
    cross-company standardized-metric query SECDB's layer-2 exists for,
    certified against generator ground truth.

    Scale: the ranking window runs per period over the |companies|-row
    consolidated aggregate (model-sized: one row per filer per
    quarter)."""
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.col("concept") == "us-gaap:Revenues")
        & (F.size("dims") == 0)
        & F.col("cik").isin(*GEN_CIKS)
    )
    rows = facts.select(
        "cik", "period_end", F.col("value_num").cast("long").alias("revenue")
    )
    wp = Window.partitionBy("period_end")
    w = wp.orderBy(F.col("revenue").desc(), F.col("cik"))
    total = F.sum("revenue").over(wp)
    return rows.select(
        "cik",
        "period_end",
        "revenue",
        F.row_number().over(w).cast("long").alias("peer_rank"),
        F.floor(F.col("revenue").cast("double") * 10000 / total + 0.5)
        .cast("long")
        .alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# xbrl_half_growth — H2-vs-H1 consolidated growth per company
# ---------------------------------------------------------------------------

def _half_growth_gold() -> list[tuple]:
    rows = []
    for ci in range(_GEN.N_COMPANIES):
        h1 = sum(_cons_value(ci, qi, "us-gaap:Revenues") for qi in (0, 1))
        h2 = sum(_cons_value(ci, qi, "us-gaap:Revenues") for qi in (2, 3))
        rows.append((_GEN.cik(ci), h1, h2, _bp(h2 - h1, h1)))
    return rows


@register(
    "xbrl_half_growth",
    oracle=_values_sql(
        _half_growth_gold(), "cik, rev_h1, rev_h2, growth_bp"
    ),
)
def xbrl_half_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-year revenue growth per company (H2 = Q3+Q4 vs H1 = Q1+Q2,
    post-supersedence — so the Q2 amendment lands in the H1 base, which
    is exactly the aggregation-after-supersedence discipline this golden
    oracle pins): growth in exact basis points.

    Scale: one conditional-sum aggregate per cik over the consolidated
    filing rows (model-sized), no windows."""
    h1_ends = {_QE[0], _QE[1]}
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.col("concept") == "us-gaap:Revenues")
        & (F.size("dims") == 0)
        & F.col("cik").isin(*GEN_CIKS)
    )
    v = F.col("value_num").cast("long")
    g = facts.groupBy("cik").agg(
        F.sum(F.when(F.col("period_end").isin(*h1_ends), v))
        .cast("long")
        .alias("rev_h1"),
        F.sum(F.when(~F.col("period_end").isin(*h1_ends), v))
        .cast("long")
        .alias("rev_h2"),
    )
    return g.select(
        "cik",
        "rev_h1",
        "rev_h2",
        F.floor(
            (F.col("rev_h2") - F.col("rev_h1")).cast("double")
            * 10000
            / F.col("rev_h1")
            + 0.5
        )
        .cast("long")
        .alias("growth_bp"),
    )


# ---------------------------------------------------------------------------
# xbrl_region_hhi — regional revenue concentration per filing
# ---------------------------------------------------------------------------

def _region_hhi_gold() -> list[tuple]:
    rows = []
    for ci in range(_GEN.N_COMPANIES):
        for qi in range(len(_GEN.QUARTERS)):
            vals = [_region_value(ci, qi, r) for r in _GEN.REGIONS]
            total = sum(vals)
            sumsq = sum(v * v for v in vals)
            hhi = math.floor(
                float(sumsq) * 10000 / (float(total) * total) + 0.5
            )
            rows.append((_GEN.cik(ci), _QE[qi], total, hhi))
    return rows


@register(
    "xbrl_region_hhi",
    oracle=_values_sql(
        _region_hhi_gold(), "cik, period_end, total_revenue, hhi_bp"
    ),
)
def xbrl_region_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue concentration (Herfindahl, basis points) per
    filing from the seg:Region dimensioned contexts — the geographic
    concentration screen beside xbrl_region_mix's share table.  The
    square sum runs in DECIMAL(38,0) (region values reach ~2e10, so
    BIGINT squares would overflow); the final bp conversion is the
    shared float(sumsq)*1e4/(float(total)*total) IEEE tree on both the
    Spark and the Python-golden side.

    Scale: one combinable aggregate per (cik, period) over exactly
    |regions| dimensioned rows each."""
    facts = _xbrl_supersede_facts(spark, sf_dir).filter(
        (F.col("concept") == "us-gaap:Revenues")
        & (F.size("dims") == 1)
        & F.col("dims")["seg:Region"].isNotNull()
        & F.col("cik").isin(*GEN_CIKS)
    )
    v = F.col("value_num").cast("long")
    g = facts.groupBy("cik", "period_end").agg(
        F.sum(v).cast("long").alias("total_revenue"),
        F.sum(v.cast("decimal(38,0)") * v).alias("sumsq"),
    )
    return g.select(
        "cik",
        "period_end",
        "total_revenue",
        F.floor(
            F.col("sumsq").cast("double")
            * 10000
            / (
                F.col("total_revenue").cast("double")
                * F.col("total_revenue")
            )
            + 0.5
        )
        .cast("long")
        .alias("hhi_bp"),
    )
