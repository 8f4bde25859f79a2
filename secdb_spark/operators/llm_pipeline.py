"""§2.J — LLM-data-pipeline operators: dedup, similarity, ANN, multimodal.

North-star extensions (BASELINE.json:6; no reference implementation —
designed Spark-first for 100 TB training-data curation).

Scale design notes:
- sim_cosine_topk is the reformulation of the survey's 141 s HOF trap
  (SURVEY §6): the candidate matrix is broadcast ONCE as a NumPy array and
  each Arrow batch of queries does one blocked float64 matmul — ~50-100x
  the naive Catalyst-HOF formulation, and the same shape scales out:
  queries partition freely; at 10^9 vectors the broadcast side becomes an
  IVF index (ann_ivf below) instead of the full matrix.
- dedup_near is MinHash+LSH entirely in DataFrame ops (explode ->
  min-hash agg -> band keys -> bucket self-join): the shuffle is on band
  keys whose cardinality grows with corpus size, so no pairwise blowup;
  candidates are verified with exact Jaccard before reporting.
- dedup_exact hash-partitions on the content hash — at 100 TB this is the
  only dedup that needs no candidate generation at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
JACCARD_THRESHOLD = 0.9


def _tokens(col: str = "text"):
    """Distinct token set per document (order-insensitive, sorted)."""
    return F.sort_array(F.array_distinct(F.split(F.col(col), " ")))


@register(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, deterministic keeper (min doc_id).
    NOT dropDuplicates(): that keeps an arbitrary row per key — fine for
    throughput, wrong for a reproducible pipeline. groupBy(hash) hash-
    partitions by content hash, so each duplicate cluster lands in one
    partition regardless of corpus size."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.sha2("text", 256))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "sim_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ), card AS (
      SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
    FROM inter
    JOIN card ca ON doc_a = ca.doc_id
    JOIN card cb ON doc_b = cb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def sim_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard for pairs >= 0.9 via inverted-index join
    (explode -> join on token -> count). Exact rational in double ->
    bit-identical across engines. Scale note: the token join explodes on
    hot tokens — at corpus scale drop ultra-common tokens first (they
    cannot push Jaccard over a high threshold on their own) or go through
    dedup_near's LSH instead."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens()).alias("tok"))
    card = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register("dedup_near", oracle=None)  # R class: hash-family dependent
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash (16 perms) + LSH (4 bands x 4),
    verified with exact Jaccard >= 0.9 — all DataFrame ops, no pairwise
    blowup: candidates only form inside LSH buckets. xxhash64(seed || tok)
    is the seeded permutation family (deterministic, JVM-side).
    Property-tested against sim_jaccard (precision = 1 by construction of
    the verify step; recall asserted in tests)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens()).alias("tok"))
    sig = toks.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.concat(F.lit(f"mh{j}:"), F.col("tok")))).alias(f"h{j}")
            for j in range(N_MINHASH)
        ]
    )
    rows_per_band = N_MINHASH // N_BANDS
    bands = sig.select(
        "doc_id",
        *[
            F.concat_ws(
                "_",
                F.lit(str(band)),
                *[F.col(f"h{band * rows_per_band + r}") for r in range(rows_per_band)],
            ).alias(f"band{band}")
            for band in range(N_BANDS)
        ],
    )
    band_long = bands.selectExpr(
        "doc_id",
        f"stack({N_BANDS}, "
        + ", ".join(f"band{i}" for i in range(N_BANDS))
        + ") AS band_key",
    )
    cand = (
        band_long.alias("x")
        .join(band_long.alias("y"), "band_key")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard (keeps precision = 1)
    sets = d.select("doc_id", _tokens().alias("tokset"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("tokset").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("tokset").alias("set_b"))
    inter_sz = F.size(F.array_intersect("set_a", "set_b"))
    union_sz = F.size(F.array_union("set_a", "set_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter_sz.cast("double") / union_sz).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


COSINE_SCHEMA = "query_id long, neighbor_id long, sim double"
TOP_K = 5


def _cosine_topk_impl(spark: SparkSession, sf_dir: str, probe_buckets: int | None = None) -> DataFrame:
    """Shared brute/IVF ANN kernel: broadcast candidate matrix + blocked
    NumPy matmul per Arrow batch. probe_buckets=None -> exact brute force;
    an int -> IVF with that many probed centroid buckets."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    pdf = emb.toPandas()  # candidate index build (driver-side; at scale
    # this becomes a distributed IVF build — see ann_ivf docstring)
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["e"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    if probe_buckets is not None:
        n_cent = 16
        cent = Mn[: n_cent]  # deterministic centroid choice: first 16 vectors
        assign = (Mn @ cent.T).argmax(axis=1)  # bucket per candidate
    bc = spark.sparkContext.broadcast(
        (ids, Mn, assign if probe_buckets is not None else None,
         cent if probe_buckets is not None else None)
    )

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_assign, c_cent = bc.value
        for b in batches:
            q_ids = b["vec_id"].to_numpy()
            Q = np.stack(b["e"].to_numpy())
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = Qn @ c_mat.T  # blocked float64 matmul — the fast path
            if c_assign is not None:
                # IVF: mask candidates outside the probed buckets
                probes = np.argsort(-(Qn @ c_cent.T), axis=1)[:, :probe_buckets]
                mask = np.zeros_like(S, dtype=bool)
                for r in range(S.shape[0]):
                    mask[r] = ~np.isin(c_assign, probes[r])
                S[mask] = -np.inf
            out = []
            for r in range(S.shape[0]):
                s = S[r].copy()
                s[c_ids == q_ids[r]] = -np.inf  # exclude self
                order = np.lexsort((c_ids, -s))[:TOP_K]
                for j in order:
                    if s[j] == -np.inf:
                        continue
                    out.append((int(q_ids[r]), int(c_ids[j]), round(float(s[j]), 6)))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    return emb.repartition(8).mapInPandas(block, COSINE_SCHEMA)


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT query_id, neighbor_id, sim FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.e, b.e), 6) AS sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ) t WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEADLINE q_cosine_topk — exact top-5 cosine neighbors per vector.
    Reformulated per SURVEY §6 (naive HOF SQL was 141 s): pre-normalized
    float64 broadcast matrix + one matmul per Arrow batch; tie-safe
    (sim desc, neighbor_id) ordering."""
    return _cosine_topk_impl(spark, sf_dir, probe_buckets=None)


@register("ann_ivf", oracle=None)  # R class: approximate by design
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN: 16 deterministic centroids, candidates
    bucketed by nearest centroid, queries probe their 6 nearest buckets
    only (~6/16 of the corpus scanned). Recall@5 vs sim_cosine_topk is
    property-tested. At 10^9+ vectors the centroid count grows ~sqrt(n)
    and the bucketed matrix is partitioned by bucket instead of broadcast."""
    return _cosine_topk_impl(spark, sf_dir, probe_buckets=6)


@register(
    "sim_knn",
    oracle=f"""
    WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
        FROM n a JOIN n b ON a.vec_id <> b.vec_id
      ) t WHERE rn <= {TOP_K}
    ),
    votes AS (
      SELECT query_id, e.label, count(*) AS n_votes
      FROM topk JOIN embeddings e ON neighbor_id = e.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, label AS predicted_label, n_votes FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS rv
      FROM votes
    ) t WHERE rv = 1
    """,
)
def sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label vote over the exact top-5 neighbors (deterministic
    tie-break: highest vote count, then smallest label)."""
    topk = _cosine_topk_impl(spark, sf_dir, probe_buckets=None)
    labels = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = (
        topk.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), F.col("label"))
    return (
        votes.withColumn("rv", F.row_number().over(w))
        .filter(F.col("rv") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "n_votes")
    )


@register(
    "embed_neardup",
    oracle="""
    WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    """,
)
def embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.4; corpus max is
    ~0.51 so the threshold is meaningfully selective). Same broadcast-
    matmul kernel as sim_cosine_topk, thresholded instead of top-k."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["e"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, Mn))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = bc.value
        for b in batches:
            q_ids = b["vec_id"].to_numpy()
            Q = np.stack(b["e"].to_numpy())
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = Qn @ c_mat.T
            rows, cols = (S >= 0.4).nonzero()
            out = [
                (int(q_ids[r]), int(c_ids[c]), round(float(S[r, c]), 6))
                for r, c in zip(rows, cols)
                if q_ids[r] < c_ids[c]  # canonical pair orientation
            ]
            yield pd.DataFrame(out, columns=["vec_a", "vec_b", "sim"])

    return emb.repartition(8).mapInPandas(block, "vec_a long, vec_b long, sim double")


@register(
    "mm_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           len(e.embedding) AS dim,
           round(sqrt(list_aggregate(
             list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x), 'sum')), 6
           ) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def mm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal assembly: text record ⋈ embedding vector into one row
    (struct built internally, scalar fields surfaced for comparison)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).withColumn(
        "record",
        F.struct("doc_id", "lang", "source", "n_chars", "label", "embedding"),
    )
    emb_d = F.col("record.embedding").cast("array<double>")
    return joined.select(
        F.col("record.doc_id").alias("doc_id"),
        F.col("record.lang").alias("lang"),
        F.col("record.source").alias("source"),
        F.col("record.n_chars").alias("n_chars"),
        F.col("record.label").alias("label"),
        F.size("record.embedding").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(emb_d, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("emb_norm"),
    )


MM_FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes long, checksum bigint, "
    "feat array<float>, decode_error string"
)


@register("mm_features", oracle=None)  # R class: binary plumbing, stubbed decode
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction plumbing: opaque binary payload +
    typed metadata -> mapInPandas batch feature extractor.

    The real image/audio decode is STUBBED (no codec libs in this
    container): modality 'text' gets deterministic fake features
    (byte-histogram moments); any other modality raises
    NotImplementedError inside the batch fn and is surfaced per-row in
    decode_error. The Spark-side contract — binary column, Arrow batch
    shape, schema, partitioning — is real and tested."""
    import numpy as np

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text").alias("modality"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for doc_id, payload, modality in zip(
                b["doc_id"], b["payload"], b["modality"]
            ):
                raw = bytes(payload)
                try:
                    if modality != "text":
                        # STUB: real decode (image resize / audio resample /
                        # video frame-sample) needs codec libs absent here.
                        raise NotImplementedError(f"decode[{modality}]")
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    feat = [
                        float(arr.mean()),
                        float(arr.std()),
                        float(arr.min()),
                        float(arr.max()),
                    ]
                    out.append(
                        (int(doc_id), modality, len(raw), int(arr.sum()), feat, None)
                    )
                except NotImplementedError as exc:
                    out.append((int(doc_id), modality, len(raw), None, None, str(exc)))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "modality",
                    "n_bytes",
                    "checksum",
                    "feat",
                    "decode_error",
                ],
            )

    return d.mapInPandas(extract, MM_FEATURES_SCHEMA)


@register(
    "embed_quantize",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), rng AS (
      SELECT vec_id, e,
             list_aggregate(e, 'min') AS lo,
             list_aggregate(e, 'max') AS hi
      FROM src
    ), coded AS (
      SELECT vec_id, lo, hi,
             -- hi==lo (constant vector): code 0, value reconstructs as lo.
             -- An unguarded divide crashes Spark (ANSI mode) outright.
             list_transform(e, x -> CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor((x - lo) / (hi - lo) * 255 + 0.5) AS BIGINT)
                  END) AS codes
      FROM rng
    )
    SELECT vec_id, lo, hi,
           coalesce(array_to_string(codes[1:4], ','), '') AS q_head,
           CAST(coalesce(list_aggregate(codes, 'sum'), 0) AS BIGINT) AS q_checksum
    FROM coded
    """,
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style scalar quantization per vector (min/max range -> 0..255
    codes): 4x storage compression for ANN candidate sets — quantized
    codes live in the broadcast index, full floats only for reranking.
    Codes + per-vector (lo, hi) allow dequantization with bounded error
    (property-tested). floor(x+0.5) keeps both engines bit-identical on
    the code values; checksum + head surfaced for the hash gate."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    lo = F.array_min("e")
    hi = F.array_max("e")
    with_rng = emb.select("vec_id", "e", lo.alias("lo"), hi.alias("hi"))

    def code(x):
        # constant vector (hi == lo): code 0 — an unguarded divide is a
        # DIVIDE_BY_ZERO job abort under Spark ANSI mode (default in 4.x)
        return F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long")).otherwise(
            F.floor(
                (x - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255 + 0.5
            ).cast("long")
        )

    codes = F.transform(F.col("e"), code)
    return with_rng.select(
        "vec_id",
        "lo",
        "hi",
        F.array_join(F.slice(codes, 1, 4), ",").alias("q_head"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_checksum"
        ),
    )


@register(
    "curation_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, text,
             (CASE WHEN len(string_split(text, ' ')) BETWEEN 30 AND 200
                   THEN 1 ELSE 0 END
              + CASE WHEN CAST(len(list_distinct(string_split(lower(text), ' ')))
                          AS DOUBLE) / len(string_split(text, ' ')) >= 0.45
                     THEN 1 ELSE 0 END
              + CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                                               t -> t IN ('a', 'the'))) AS DOUBLE)
                          / len(string_split(text, ' ')) <= 0.5
                     THEN 1 ELSE 0 END) AS quality_score
      FROM documents
    ), kept AS (
      SELECT * FROM quality WHERE quality_score = 3
    ), deduped AS (
      SELECT lang, text, min(doc_id) AS keeper_doc_id
      FROM kept GROUP BY sha256(text), lang, text
    )
    SELECT lang,
           count(*) AS docs_kept,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_kept,
           min(keeper_doc_id) AS first_keeper
    FROM deduped
    GROUP BY lang
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition as ONE lazy plan: quality filter
    (text_quality's 0-3 score) -> exact dedup (sha256, deterministic
    keeper) -> per-language token accounting. Catalyst fuses the filter
    and scoring into the scan stage; the two aggregations are the only
    shuffles. This is the shape of a real corpus-prep job — and the point
    of an engine: stages compose without materialization between them."""
    d = table(spark, sf_dir, "documents")
    raw_toks = F.split(F.col("text"), " ")
    low_toks = F.split(F.lower("text"), " ")
    n_tokens = F.size(raw_toks)
    uniq_ratio = F.size(F.array_distinct(low_toks)).cast("double") / n_tokens
    stop_ratio = (
        F.size(F.filter(low_toks, lambda t: t.isin("a", "the"))).cast("double")
        / n_tokens
    )
    quality = (
        F.when(n_tokens.between(30, 200), 1).otherwise(0)
        + F.when(uniq_ratio >= 0.45, 1).otherwise(0)
        + F.when(stop_ratio <= 0.5, 1).otherwise(0)
    )
    kept = d.withColumn("quality_score", quality).filter(F.col("quality_score") == 3)
    deduped = (
        kept.groupBy(F.sha2("text", 256).alias("h"), "lang", "text")
        .agg(F.min("doc_id").alias("keeper_doc_id"))
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens_kept"),
        F.min("keeper_doc_id").alias("first_keeper"),
    )


@register("dedup_clusters", oracle=None)  # R class: iterative, no SQL oracle
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate pair graph — turns
    pairwise matches into dedup CLUSTERS with a canonical representative
    (min doc_id), the step that makes near-dedup actionable (keep one doc
    per component, not per pair).

    Iterative min-label propagation (the SURVEY's 'iterative algorithms'
    oracle-exempt class): each round every node adopts the smallest label
    among itself and its neighbors; converges in O(component diameter)
    rounds. Scale notes: labels are localCheckpoint()ed each round to cut
    the growing lineage (the classic iterative-Spark failure mode), and
    convergence is a count of changed labels (one small action per round),
    not a collect. Property-tested against union-find."""
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    pairs = pairs.localCheckpoint()  # computed once; reused every round
    nodes = (
        pairs.select(F.col("doc_a").alias("id"))
        .union(pairs.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("id")).localCheckpoint()
    edges_bidir = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    for _ in range(15):  # diameter bound; corpus components are tiny
        neighbor_min = (
            edges_bidir.join(labels, edges_bidir.doc_b == labels.id)
            .groupBy(F.col("doc_a").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint()
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return (
        labels.groupBy(F.col("label").alias("cluster_rep"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sort_array(F.collect_list("id")).cast("string").alias("members"),
        )
    )
