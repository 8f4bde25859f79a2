"""Round-tie discipline sweep (SURVEY §4.4 rule 6; round-7 judge finding).

`round(x, 4)` on a raw double ratio diverges between engines when the
quotient's shortest decimal repr ties at the 5th decimal: Spark rounds the
DECIMAL repr HALF_UP (BigDecimal(Double.toString(x))), DuckDB rounds the
binary value.  changepoint_binary hit this live at sf0.01 (mean_left =
24255.51/8 -> 3031.93875: Spark 3031.9388, DuckDB 3031.9387).  The fix
class is `he4`/`sql_he4` (_helpers.py): floor(x*1e4 + 0.5) runs the SAME
IEEE ops on the SAME double in both engines, so the quantized value is
bit-identical by construction.

This sweep freezes the hazard class: every `r4(...)`/`F.round(...)` call
whose argument is SYNTACTICALLY a division (ast.BinOp/Div at the top of
the argument) must either route through he4 or appear in the FROZEN list
below.  The frozen members are grandfathered deliberately: each is
driver- or judge-certified green at its CURRENT oracle text, and editing
a certified oracle re-queues the op for certification (the repo's
recert-pending machinery), which would explode the 50-slot/round driver
backlog for a measure-thin hazard (divergence needs the exact quotient to
land on a short-decimal 4-dp half-tie).  Policy, enforced by this test:

- NEW operators must use he4/sql_he4 for presented raw ratios — adding a
  new round-over-division site fails this sweep until consciously
  adjudicated here.
- Any frozen member whose certification ever goes red on a value hash
  migrates to he4/sql_he4 (changepoint_binary is the precedent and has
  been REMOVED from the list below).
"""

from __future__ import annotations

import ast
import pathlib

OPS_DIR = pathlib.Path(__file__).resolve().parent.parent / "secdb_spark" / "operators"

#: (file, enclosing def) -> certified round-over-division sites, frozen at
#: round 8.  Do not add entries without the adjudication note above.
FROZEN_ROUND_DIV_SITES = {
    ("corpus_extras.py", "corpus_word_len_dist"),
    ("corpus_extras2.py", "corpus_stopword_coverage"),
    ("corpus_extras2.py", "knn_reciprocity"),
    ("curation_extras.py", "chunk_dedup_share"),
    ("curation_extras.py", "doc_quality_gate"),
    ("curation_extras.py", "embed_matryoshka_truncate"),
    ("curation_extras.py", "mix_epoch_upsample"),
    ("curation_extras.py", "source_lang_matrix"),
    ("curation_extras.py", "text_hapax_ratio"),
    ("curation_extras.py", "token_fertility_by_lang"),
    ("econ_extras.py", "chi2_independence"),
    ("econ_extras.py", "peak_to_avg"),
    ("econ_extras.py", "price_elasticity"),
    ("econ_extras.py", "sla_attainment"),
    ("econ_extras.py", "text_novelty"),
    ("econ_extras.py", "top_decile_share"),
    ("embed_extras.py", "embed_dim_stats"),
    ("embed_extras.py", "embed_label_outliers"),
    ("embed_extras.py", "embed_margin"),
    ("eval_extras.py", "ivf_eval"),
    ("ml_prep.py", "audit_k_anonymity"),
    ("ml_prep.py", "ts_cross_corr"),
    ("similarity_extras.py", "events_type_overlap"),
    ("similarity_extras.py", "sim_containment"),
    ("sources_sinks.py", "xbrl_metrics"),
    ("stats_extras.py", "abtest_ztest"),
    ("stats_extras.py", "conversion_rate_ci"),
    ("stats_extras2.py", "stat_mannwhitney"),
    ("stats_extras2.py", "stat_welch_ttest"),
    ("stats_extras3.py", "abtest_cuped"),
    ("stats_extras3.py", "abtest_srm"),
    ("stats_extras3.py", "stat_levene"),
    ("timeseries.py", "event_transitions"),
    ("timeseries.py", "twap"),
    ("variance_extras.py", "anova_dow"),
    ("variance_extras.py", "error_rate_daily"),
    ("variance_extras.py", "first_touch_mix"),
    ("warehouse_extras.py", "conversion_window"),
    ("warehouse_extras10.py", "graph_assortativity"),
    ("warehouse_extras10.py", "markov_entropy_rate"),
    ("warehouse_extras10.py", "source_cross_entropy"),
    ("warehouse_extras10.py", "stickiness_ratio"),
    ("warehouse_extras11.py", "retention_halflife"),
    ("warehouse_extras11.py", "supplier_leadtime_drift"),
    ("warehouse_extras11.py", "user_hour_entropy"),
    ("warehouse_extras12.py", "brand_revenue_corr"),
    ("warehouse_extras12.py", "text_bigram_logprob"),
    ("warehouse_extras13.py", "gapfill_interpolate"),
    ("warehouse_extras13.py", "source_length_ks"),
    ("warehouse_extras13.py", "ts_dominant_period"),
    ("warehouse_extras14.py", "ewma"),
    ("warehouse_extras14.py", "nation_home_bias"),
    ("warehouse_extras14.py", "session_error_impact"),
    ("warehouse_extras15.py", "brand_size_chi2"),
    ("warehouse_extras15.py", "customer_order_count_dist"),
    ("warehouse_extras15.py", "session_depth_dist"),
    ("warehouse_extras15.py", "source_dup_rate"),
    ("warehouse_extras16.py", "customer_lorenz_deciles"),
    ("warehouse_extras16.py", "knn_label_eval"),
    ("warehouse_extras17.py", "fn_business_days"),
    ("warehouse_extras18.py", "cross_source_dup_matrix"),
    ("warehouse_extras18.py", "event_trigram_transitions"),
    ("warehouse_extras19.py", "spearman_corr"),
    ("warehouse_extras2.py", "assoc_rules"),
    ("warehouse_extras2.py", "audit_benford"),
    ("warehouse_extras2.py", "events_entropy"),
    ("warehouse_extras2.py", "percent_of_total"),
    ("warehouse_extras2.py", "seasonal_decompose_ma"),
    ("warehouse_extras20.py", "embed_cluster_purity"),
    ("warehouse_extras20.py", "pack_fill_stats"),
    ("warehouse_extras20.py", "ts_hurst"),
    ("warehouse_extras21.py", "audit_round_prices"),
    ("warehouse_extras21.py", "term_burstiness"),
    ("warehouse_extras21.py", "ts_theilsen_slope"),
    ("warehouse_extras22.py", "purchase_acceleration"),
    ("warehouse_extras23.py", "doc_opening_diversity"),
    ("warehouse_extras23.py", "heavy_user_concentration"),
    ("warehouse_extras23.py", "ts_rolling_slope"),
    ("warehouse_extras24.py", "embed_quantize_error"),
    ("warehouse_extras24.py", "mix_unique_mass"),
    ("warehouse_extras24.py", "trade_repeat_rate"),
    ("warehouse_extras25.py", "customer_brand_loyalty"),
    ("warehouse_extras26.py", "first_session_conversion"),
    ("warehouse_extras26.py", "trade_matrix"),
    ("warehouse_extras27.py", "audit_benford2"),
    ("warehouse_extras27.py", "forecast_snaive_mase"),
    ("warehouse_extras27.py", "win_exclude_current"),
    ("warehouse_extras28.py", "quality_band_mix"),
    ("warehouse_extras3.py", "agg_skew_kurt"),
    ("warehouse_extras30.py", "brand_nation_lift"),
    ("warehouse_extras30.py", "winback_rate"),
    ("warehouse_extras31.py", "dedup_savings_report"),
    ("warehouse_extras31.py", "weekend_lift"),
    ("warehouse_extras32.py", "decile_lift_table"),
    ("warehouse_extras32.py", "part_sourcing_breadth"),
    ("warehouse_extras33.py", "embed_angle_hist"),
    ("warehouse_extras34.py", "ecdf_lookup"),
    ("warehouse_extras34.py", "langid_confusion"),
    ("warehouse_extras34.py", "minhash_jaccard_calibration"),
    ("warehouse_extras4.py", "ts_vwap"),
    ("warehouse_extras5.py", "corr"),
    ("warehouse_extras5.py", "customer_churn"),
    ("warehouse_extras5.py", "purchase_gaps"),
    ("warehouse_extras5.py", "ts_bollinger"),
    ("warehouse_extras6.py", "mix_temperature"),
    ("warehouse_extras6.py", "ts_autocorr"),
    ("warehouse_extras7.py", "corpus_zipf_slope"),
    ("warehouse_extras7.py", "events_props_stats"),
    ("warehouse_extras7.py", "orders_seasonality_index"),
    ("warehouse_extras7.py", "win_moving_median"),
    ("warehouse_extras8.py", "brand_return_rate"),
    ("warehouse_extras8.py", "customer_reorder_rate"),
    ("warehouse_extras8.py", "funnel_latency"),
    ("warehouse_extras8.py", "nation_tax_rate"),
    ("warehouse_extras8.py", "session_bounce_rate"),
    ("warehouse_extras8.py", "source_vocab_overlap"),
    ("warehouse_extras8.py", "supplier_otd"),
    ("warehouse_extras9.py", "event_gap_hist"),
    ("warehouse_extras9.py", "part_supplier_concentration"),
    ("warehouse_extras9.py", "ts_cusum"),
    ("warehouse_extras9.py", "ts_stochastic"),
    ("windows.py", "win_ewma"),
}


def _round_div_sites():
    sites = []
    for path in sorted(OPS_DIR.glob("*.py")):
        tree = ast.parse(path.read_text())
        funcs = [
            (n.lineno, max(getattr(n, "end_lineno", n.lineno), n.lineno), n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]

        def enclosing(ln):
            best = None
            for a, b, name in funcs:
                if a <= ln <= b and (best is None or a > best[0]):
                    best = (a, name)
            return best[1] if best else "<module>"

        for n in ast.walk(tree):
            if not isinstance(n, ast.Call) or not n.args:
                continue
            fn = n.func
            is_r4 = isinstance(fn, ast.Name) and fn.id == "r4"
            is_round = isinstance(fn, ast.Attribute) and fn.attr == "round"
            if not (is_r4 or is_round):
                continue
            arg = n.args[0]
            if isinstance(arg, ast.BinOp) and isinstance(arg.op, ast.Div):
                sites.append((path.name, enclosing(n.lineno), n.lineno))
    return sites


def test_no_new_round_over_division_sites():
    """New presented raw ratios must use he4/sql_he4, not round()."""
    unknown = [
        (f, fn, ln)
        for f, fn, ln in _round_div_sites()
        if (f, fn) not in FROZEN_ROUND_DIV_SITES
    ]
    assert not unknown, (
        "round()/r4() applied directly to a raw double division outside the "
        "frozen certified set — route it through he4/sql_he4 (_helpers.py) "
        f"or adjudicate it in FROZEN_ROUND_DIV_SITES: {unknown}"
    )


def test_changepoint_binary_migrated():
    """The precedent op must not reappear in the frozen list."""
    assert ("warehouse_extras21.py", "changepoint_binary") not in FROZEN_ROUND_DIV_SITES
    src = (OPS_DIR / "warehouse_extras21.py").read_text()
    assert "he4" in src and "sql_he4" in src


def test_he4_sql_he4_agree_on_ties(spark, duck):
    """Spark he4 and DuckDB sql_he4 must agree bit-for-bit on constructed
    4-dp half-ties — including the live 24255.51/8 case — where round()
    demonstrably diverges between the engines."""
    from pyspark.sql import functions as F

    from secdb_spark.operators._helpers import he4, sql_he4

    cases = [
        (24255.51, 8.0),      # the sf0.01 live tie: 3031.93875
        (1.00005, 1.0),       # shortest-repr tie at the 5th decimal
        (0.12345, 1.0),
        (99999.99995, 1.0),
        (7.0, 3.0),           # infinite expansion (no tie)
        (2.5, 2.0),           # 1.25 (short, no 5th-digit tie)
        (0.00005, 1.0),
        (12345.67895, 1.0),
    ]
    sdf = spark.createDataFrame(cases, "a double, b double")
    got = [
        r["v"]
        for r in sdf.select(he4(F.col("a") / F.col("b")).alias("v"))
        .collect()
    ]
    want = [
        r[0]
        for r in duck.execute(
            "SELECT " + sql_he4("a / b") + " AS v FROM (VALUES "
            + ", ".join(f"({a!r}, {b!r})" for a, b in cases)
            + ") t(a, b)"
        ).fetchall()
    ]
    assert got == want


def test_round_diverges_where_he4_does_not(duck):
    """Documents the hazard he4 closes: DuckDB round() on the live tie
    disagrees with Spark's HALF_UP decimal rounding."""
    (dd,) = duck.execute("SELECT round(24255.51 / 8, 4)").fetchone()
    assert dd == 3031.9387  # DuckDB rounds the binary value (below tie)
    # Spark round() gives 3031.9388 (BigDecimal HALF_UP of the shortest
    # repr "3031.93875") — the divergence.  he4 follows the binary value
    # ((x*1e4 = 30319387.499999996, below the tie) in BOTH engines, so
    # both present 3031.9387.
    (hv,) = duck.execute(
        "SELECT (CAST(floor((24255.51 / 8) * 10000 + 0.5) AS BIGINT) / 10000.0)"
    ).fetchone()
    assert hv == 3031.9387
