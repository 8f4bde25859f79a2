"""Round-7 additions, batch 40 — language-ID confusion matrix, inverse
percentile lookup, MinHash calibration curve.

Reference semantics: SURVEY §2 extension policy (mount empty).
langid_confusion turns text_langid's per-doc predictions into the
confusion matrix + per-language recall that decides whether the
heuristic is shippable.  ecdf_lookup answers "what share of orders is
below $X" for a fixed probe grid — the inverse of the percentile
family.  minhash_jaccard_calibration scores the 8-signature MinHash
estimator against exact Jaccard ON ITS OWN CANDIDATES — the calibration
evidence behind trusting dedup_near's threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import pin, r4
from .text_analysis import LANGID_MARKERS
from .warehouse_extras28 import SWEEP_SEEDS

#: probe values (whole dollars) for the inverse-percentile lookup.
ECDF_PROBES = [50_000, 150_000, 300_000]


# ---------------------------------------------------------------------------
# langid_confusion — confusion matrix + recall of the marker heuristic
# ---------------------------------------------------------------------------

def _langid_sql_score(lang: str) -> str:
    words = LANGID_MARKERS[lang]
    if not words:
        return "0"
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"
    )


@register(
    "langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS declared_lang,
             CASE
               WHEN {_langid_sql_score('en')} >= greatest({_langid_sql_score('de')},
                    {_langid_sql_score('es')}, {_langid_sql_score('fr')}, 1) THEN 'en'
               WHEN {_langid_sql_score('de')} >= greatest({_langid_sql_score('es')},
                    {_langid_sql_score('fr')}, 1) THEN 'de'
               WHEN {_langid_sql_score('es')} >= greatest({_langid_sql_score('fr')}, 1) THEN 'es'
               WHEN {_langid_sql_score('fr')} >= 1 THEN 'fr'
               ELSE 'unknown'
             END AS predicted_lang
      FROM documents
    )
    SELECT declared_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY declared_lang), 4)
             AS share_of_declared,
           declared_lang = predicted_lang AS correct
    FROM pred GROUP BY 1, 2
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the text_langid marker heuristic against the
    corpus's GOLD lang labels — the evaluation that decides whether a
    language filter is shippable: each (declared, predicted) cell with
    its share of the declared language (diagonal share = recall; the
    'unknown' column = abstention rate; zh has no marker list, so its
    row IS the heuristic's blind spot made visible).  Same fused column
    expressions as text_langid (scores are array-filter sizes inside
    the scan, no UDF, no explode), then a |langs|²-bounded aggregate
    and a model-sized share window."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(lang: str):
        words = LANGID_MARKERS[lang]
        if not words:
            return F.lit(0)
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    en, de, es, fr = score("en"), score("de"), score("es"), score("fr")
    pred = (
        F.when(en >= F.greatest(de, es, fr, F.lit(1)), "en")
        .when(de >= F.greatest(es, fr, F.lit(1)), "de")
        .when(es >= F.greatest(fr, F.lit(1)), "es")
        .when(fr >= 1, "fr")
        .otherwise("unknown")
    )
    cells = d.select(
        F.col("lang").alias("declared_lang"),
        pred.alias("predicted_lang"),
    ).groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    per_declared = cells.groupBy("declared_lang").agg(
        F.sum("n_docs").alias("dl_total")
    )
    return cells.join(F.broadcast(per_declared), "declared_lang").select(
        "declared_lang",
        "predicted_lang",
        "n_docs",
        r4(
            F.col("n_docs").cast("double") / F.col("dl_total")
        ).alias("share_of_declared"),
        (F.col("declared_lang") == F.col("predicted_lang")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# ecdf_lookup — inverse percentile: P(total <= probe) per priority
# ---------------------------------------------------------------------------

@register(
    "ecdf_lookup",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {", ".join(
        f"round(CAST(sum(CASE WHEN o_totalprice <= {p} THEN 1 ELSE 0 END)"
        f" AS DOUBLE) / count(*), 4) AS ecdf_{p // 1000}k"
        for p in ECDF_PROBES)}
    FROM orders GROUP BY 1
    """,
)
def ecdf_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse percentile lookup — "what share of orders is at or below
    $X" for a fixed probe grid, per priority: the ECDF evaluated at
    points, the mirror image of the percentile family (percentile:
    rank→value; this: value→rank share).  Useful as the fast
    first-answer before running exact quantiles at 100 TB because it is
    ONE conditional combinable aggregate over the scan — no spine, no
    window, no join; probes are compile-time constants pushed into the
    same pass."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_orders")]
    for p in ECDF_PROBES:
        aggs.append(
            r4(
                F.sum(
                    F.when(F.col("o_totalprice") <= p, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias(f"ecdf_{p // 1000}k")
        )
    return o.groupBy("o_orderpriority").agg(*aggs)


# ---------------------------------------------------------------------------
# minhash_jaccard_calibration — sketch estimate vs exact Jaccard
# ---------------------------------------------------------------------------

def _cal_sig_sql(i: int, s: str) -> str:
    return f"min(md5('{s}' || term)) AS sig{i}"


@register(
    "minhash_jaccard_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents
    ), sigs AS (
      SELECT doc_id,
             {", ".join(_cal_sig_sql(i, s) for i, s in enumerate(SWEEP_SEEDS))},
             list_sort(list(DISTINCT term)) AS terms
      FROM toks GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, sig0 || sig1 AS b0, sig2 || sig3 AS b1,
             sig4 || sig5 AS b2, sig6 || sig7 AS b3
      FROM sigs
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
       AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT CAST(
               (CASE WHEN sa.sig0 = sb.sig0 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig1 = sb.sig1 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig2 = sb.sig2 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig3 = sb.sig3 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig4 = sb.sig4 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig5 = sb.sig5 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig6 = sb.sig6 THEN 1 ELSE 0 END) +
               (CASE WHEN sa.sig7 = sb.sig7 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_match,
             CAST(len(list_intersect(sa.terms, sb.terms)) AS DOUBLE)
               / (len(sa.terms) + len(sb.terms)
                  - len(list_intersect(sa.terms, sb.terms))) AS exact_j
      FROM cand c
      JOIN sigs sa ON c.doc_a = sa.doc_id
      JOIN sigs sb ON c.doc_b = sb.doc_id
    )
    SELECT n_match,
           round(CAST(n_match AS DOUBLE) / 8, 4) AS est_jaccard,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(exact_j AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 4) AS mean_exact_jaccard
    FROM scored GROUP BY 1
    """,
)
def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration curve: on the LSH candidate pairs (2-row
    bands over 8 portable md5-min signatures — lsh_band_sweep's b4r2
    layout), compare the sketch's Jaccard estimate (matching-signature
    fraction k/8) against EXACT Jaccard on the full token sets, bucketed
    by k.  E[k/8] = J is the MinHash theorem; this table is the
    empirical check that the estimator is unbiased on THIS corpus — the
    evidence that dedup_near's signature threshold means what its
    docstring claims.  Exact Jaccard is computed only on candidates
    (duplicate-density-scaled, never n²); token sets travel once per
    candidate side; the exact-J mean is decimal-quantized so both
    engines agree."""
    from .llm_pipeline import _mask_vocab, _spread_docs, _vocab_mask_words

    d = _spread_docs(spark, sf_dir, table(spark, sf_dir, "documents"))
    # r13 closed-vocab bitmask verify (guide §2.3): with the dictionary
    # in hand the per-pair exact intersection is bit_count(a AND b)
    # over n_words mask longs — no array_intersect, and the verify
    # joins ship 8 bytes/word instead of the hashed-term arrays.  Masks
    # are exact dictionary indices; identical integers feed the
    # identical exact_j division.  Open vocab keeps the array path.
    vocab = _mask_vocab(spark, sf_dir)
    # r13 TOKSET-GROUP COLLAPSE (guide §2.3 "aggregate before you
    # shuffle" applied to a self-join): every number this op emits is a
    # function of the DISTINCT TERM SET — the signatures are min-md5
    # over the set, exact Jaccard is set algebra — so docs sharing a
    # term set are interchangeable.  The sf0.1 corpus collapses 5000
    # docs -> ~3935 groups, which shrinks the candidate pair stream
    # quadratically; each surviving group pair carries its doc-pair
    # multiplicity mX*mY, and identical-set pairs (all 8 signatures
    # match, exact J = 1) contribute C(m, 2) straight into the k=8
    # bucket without touching any join.  The weighted decimal sum is
    # EXACTLY the per-pair sum (decimal x integer is exact), so the
    # DuckDB oracle — still the doc-pair form — certifies the algebra
    # every round.  Signatures are per-group map-side array_min folds:
    # no explode, no per-doc aggregate.
    sets_per_doc = d.select(
        "doc_id",
        F.sort_array(F.array_distinct(F.split("text", " "))).alias("terms"),
    )
    groups = sets_per_doc.groupBy("terms").agg(
        F.count(F.lit(1)).alias("m"), F.min("doc_id").alias("gid")
    )
    # pinned: gsigs feeds the band stack + both verify sides — un-pinned
    # each re-ran the signature build (plan-audit, SCALE.md §50).
    if vocab is not None:
        n_words = (len(vocab) + 63) // 64
        set_cols = [
            w.alias(f"mw{i}")
            for i, w in enumerate(_vocab_mask_words(vocab, F.col("terms")))
        ] + [F.size("terms").alias("nt")]
    else:
        n_words = 0
        # hashed copy for the verify intersect: long equality beats
        # string equality and the set SIZES are unchanged (the
        # dedup_near 2^-64 collision precedent)
        set_cols = [
            F.sort_array(
                F.transform("terms", lambda t: F.xxhash64(t))
            ).alias("hterms")
        ]
    sigs0 = groups.select(
        "gid",
        "m",
        *[
            F.array_min(
                F.transform(
                    "terms",
                    lambda t: F.md5(F.concat(F.lit(s), t)),
                )
            ).alias(f"sig{i}")
            for i, s in enumerate(SWEEP_SEEDS)
        ],
        *set_cols,
    )
    # band keys and signature-compare columns as LONGs (xxhash64):
    # primitive joins/comparisons beat 64-char concat strings; a 2^-64
    # collision shifts one pair's bucket — the dedup_near precedent.
    # r13: band keys AND per-signature compare hashes fold INTO the
    # pinned projection (pure functions of sig0..7) — computed
    # post-checkpoint, every band leg re-derived (and re-codegen'd)
    # them for both join sides; the md5 signature strings drop out of
    # the checkpoint entirely.
    gsigs = pin(
        sigs0.select(
            "gid",
            "m",
            *(
                [f"mw{i}" for i in range(n_words)] + ["nt"]
                if vocab is not None
                else ["hterms"]
            ),
            F.xxhash64("sig0", "sig1").alias("b0"),
            F.xxhash64("sig2", "sig3").alias("b1"),
            F.xxhash64("sig4", "sig5").alias("b2"),
            F.xxhash64("sig6", "sig7").alias("b3"),
            *[F.xxhash64(f"sig{i}").alias(f"hs{i}") for i in range(8)],
        )
    )
    bands = gsigs.select("gid", "b0", "b1", "b2", "b3")
    # FIRST-MATCHING-BAND union (the dedup_near construction): band i's
    # equi-join carries the residual "bands j < i differ", so every
    # group pair is emitted at exactly one band and the multi-million-
    # row distinct() that used to absorb the OR-banding multiplicity
    # (10.4M raw -> 5.4M unique at sf0.1, a 7.7 s shuffle) disappears.
    a, b = bands.alias("a"), bands.alias("b")
    legs = []
    for i in range(4):
        cond = (F.col(f"a.b{i}") == F.col(f"b.b{i}")) & (
            F.col("a.gid") < F.col("b.gid")
        )
        for j in range(i):
            cond = cond & (F.col(f"a.b{j}") != F.col(f"b.b{j}"))
        legs.append(
            a.join(b, cond).select(
                F.col("a.gid").alias("ga"), F.col("b.gid").alias("gb")
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionAll(leg)
    set_a_cols = (
        [F.col(f"mw{i}").alias(f"aw{i}") for i in range(n_words)]
        + [F.col("nt").alias("na")]
        if vocab is not None
        else [F.col("hterms").alias("a_terms")]
    )
    set_b_cols = (
        [F.col(f"mw{i}").alias(f"bw{i}") for i in range(n_words)]
        + [F.col("nt").alias("nb")]
        if vocab is not None
        else [F.col("hterms").alias("b_terms")]
    )
    sa = gsigs.select(
        F.col("gid").alias("ga"),
        F.col("m").alias("ma"),
        *[F.col(f"hs{i}").alias(f"a_sig{i}") for i in range(8)],
        *set_a_cols,
    )
    sb = gsigs.select(
        F.col("gid").alias("gb"),
        F.col("m").alias("mb"),
        *[F.col(f"hs{i}").alias(f"b_sig{i}") for i in range(8)],
        *set_b_cols,
    )
    n_match = sum(
        F.when(F.col(f"a_sig{i}") == F.col(f"b_sig{i}"), 1).otherwise(0)
        for i in range(8)
    ).cast("long")
    if vocab is not None:
        inter = sum(
            [
                F.bit_count(F.col(f"aw{i}").bitwiseAND(F.col(f"bw{i}")))
                for i in range(n_words)
            ],
            F.lit(0),
        )
        union = F.col("na") + F.col("nb") - inter
    else:
        inter = F.size(F.array_intersect("a_terms", "b_terms"))
        union = F.size("a_terms") + F.size("b_terms") - inter
    scored = (
        cand.join(sa, "ga")
        .join(sb, "gb")
        .select(
            n_match.alias("n_match"),
            (inter.cast("double") / union).alias("exact_j"),
            (F.col("ma") * F.col("mb")).cast("long").alias("w"),
        )
    )
    self_pairs = groups.filter(F.col("m") >= 2).select(
        F.lit(8).cast("long").alias("n_match"),
        F.lit(1.0).alias("exact_j"),
        F.expr("m * (m - 1) div 2").cast("long").alias("w"),
    )
    return scored.unionByName(self_pairs).groupBy("n_match").agg(
        F.sum("w").cast("long").alias("n_pairs"),
        F.sum(
            F.col("exact_j").cast("decimal(38,6)") * F.col("w")
        ).alias("_sum_j"),
    ).select(
        "n_match",
        r4(F.col("n_match").cast("double") / 8).alias("est_jaccard"),
        "n_pairs",
        r4(
            F.col("_sum_j").cast("double") / F.col("n_pairs")
        ).alias("mean_exact_jaccard"),
    )
