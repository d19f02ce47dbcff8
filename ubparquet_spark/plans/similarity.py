"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

The LLM-data-pipeline extension surface (BASELINE.json): brute-force cosine
top-k as the correctness baseline, a sign-bit LSH-bucketed ANN variant as the
scale path, bucket-local near-dup pair detection, and per-label norm stats.

All vector math stays JVM-side via higher-order functions
(``zip_with``/``aggregate``) — no Python UDFs. Each float element is cast to
double before multiplying, so per-element products are exact in both engines;
summation order differs across engines (Spark left-fold vs DuckDB group agg),
so cosines are floor-rounded to 6 decimals (double error ~1e-15, far below
the rounding grain).

Scale notes (100 TB): brute-force is a broadcast of ONE query row against a
linear scan — embarrassingly parallel, no shuffle. The LSH variant buckets
every vector by sign bits (extendable to more planes), turning ANN into an
equi-join on bucket id: candidates co-locate in one shuffle; bucket-local
work is quadratic only within a bucket. For real workloads add more
bits/bands to keep buckets bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.plans.tpch import roundn, sql_roundn

QUERY_VEC_ID = 0
LSH_SIGN_BITS = 8


def _dot(a: str, b: str) -> Column:
    """Exact-per-element dot product, sequential left-fold sum."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _sq_norm(a: str) -> Column:
    return _dot(a, a)


def _cosine(a: str, b: str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (a
    padding/all-zero embedding leaves the angle undefined) — matching
    DuckDB, whose x/0 yields NULL, instead of an ANSI DIVIDE_BY_ZERO
    (zero-vector corpus sweep, round 6). NULLs sort last under the
    descending top-k orderings in both engines."""
    den = _sq_norm(a) * _sq_norm(b)
    return F.when(den > 0, _dot(a, b) / F.sqrt(den))


def _cosine_pre(a: str, b: str, n2a: str, n2b: str) -> Column:
    """``_cosine`` with both sides' SQUARED norms precomputed as columns
    (round 11, guide §1.2 per-task work). In a pair join ``_cosine``
    re-folds each side's O(d) norm per PAIR — and because the
    ``when(den > 0, ...)`` guard is lambda-bearing (Spark's codegen
    subexpression elimination skips expressions containing lambda
    functions), ``den`` is folded once for the predicate and once for the
    divide: ~5 O(d) folds per pair. With per-side n² computed once per
    ROW before the join, the per-pair work is the ONE dot fold.
    ``den = n2a * n2b`` multiplies the identical doubles ``_cosine``
    would produce, so the result is bit-identical."""
    den = F.col(n2a) * F.col(n2b)
    return F.when(den > 0, _dot(a, b) / F.sqrt(den))


def _sign_bucket(a: str, bits: int = LSH_SIGN_BITS, offset: int = 0) -> Column:
    """Sign-bit LSH bucket from ``bits`` dimensions starting at ``offset``."""
    terms = " + ".join(
        f"(CASE WHEN CAST(element_at({a}, {offset + i + 1}) AS DOUBLE) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return F.expr(terms).cast("long")


def _sql_dot(a: str, b: str) -> str:
    """DuckDB dot product via list_transform over an index range (lateral
    generate_series doesn't accept CTE columns in DuckDB 1.0; sum order may
    differ from Spark's fold — rounded downstream)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _sql_sign_bucket(a: str, bits: int = LSH_SIGN_BITS, offset: int = 0) -> str:
    terms = " + ".join(
        f"(CASE WHEN CAST({a}[{offset + i + 1}] AS DOUBLE) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (the correctness baseline ANN)
# ---------------------------------------------------------------------------

def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-side squared norms once per row; the pair stage folds only the dot
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_n2", _sq_norm("embedding")
    )
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").alias("qvec"), F.col("_n2").alias("_qn2"))
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            roundn(
                _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


Q_KNN_SQL = f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       FLOOR(({_sql_dot("e.embedding", "q.qvec")}
              / SQRT({_sql_dot("e.embedding", "e.embedding")} * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5) / 1000000 AS cosine
FROM embeddings e, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: restrict the scan to the query's sign bucket
# ---------------------------------------------------------------------------

def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("bucket", _sign_bucket("embedding"))
        .withColumn("_n2", _sq_norm("embedding"))
    )
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            F.col("embedding").alias("qvec"),
            F.col("bucket").alias("qbucket"),
            F.col("_n2").alias("_qn2"),
        )
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            "bucket",
            roundn(
                _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


Q_ANN_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_sql_sign_bucket("embedding")} AS bucket
  FROM embeddings
), q AS (
  SELECT embedding AS qvec, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id, label, bucket,
       FLOOR(({_sql_dot("e.embedding", "q.qvec")}
              / SQRT({_sql_dot("e.embedding", "e.embedding")} * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5) / 1000000 AS cosine
FROM b e, q
WHERE e.vec_id != {QUERY_VEC_ID} AND e.bucket = q.qbucket
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


# ---------------------------------------------------------------------------
# ANN quality harness: recall@k of the sign-LSH candidate set against exact
# brute-force ground truth, per query — the standard way to TUNE an ANN
# index (bits/bands vs recall) before trusting it at scale. Ground truth
# scores every (query, vector) pair, so this runs on a SAMPLE of queries
# (vec_id < ANN_RECALL_QUERIES): the corpus-sized work is one broadcast of
# the tiny query set against a linear scan (no shuffle), then a per-query
# top-k window (WindowGroupLimit pushes the rank filter map-side, same shape
# as q_knn_batch). Recall is hits/k with integer hits — exact across
# engines.
# ---------------------------------------------------------------------------

ANN_RECALL_K = 10
ANN_RECALL_QUERIES = 20


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("bucket", _sign_bucket("embedding"))
        .withColumn("_n2", _sq_norm("embedding"))
    )
    qs = emb.filter(F.col("vec_id") < ANN_RECALL_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
        F.col("_n2").alias("_qn2"),
    )
    scored = emb.join(F.broadcast(qs), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        "bucket",
        "qbucket",
        roundn(
            _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    truth = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= ANN_RECALL_K
    )
    hit = (F.col("bucket") == F.col("qbucket")).cast("int")
    recall = truth.groupBy("qid").agg(
        F.sum(hit).cast("long").alias("hits"),
        roundn(F.sum(hit).cast("double") / F.lit(ANN_RECALL_K)).alias(
            "recall_at_k"
        ),
    )
    cands = (
        emb.join(
            F.broadcast(qs),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    return recall.join(cands, "qid", "left").select(
        "qid",
        "hits",
        "recall_at_k",
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias(
            "n_candidates"
        ),
    )


Q_ANN_RECALL_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_sql_sign_bucket("embedding")} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, embedding AS qvec, bucket AS qbucket
  FROM b WHERE vec_id < {ANN_RECALL_QUERIES}
), scored AS (
  SELECT q.qid, e.vec_id, e.bucket, q.qbucket,
         FLOOR(({_sql_dot("e.embedding", "q.qvec")}
                / SQRT({_sql_dot("e.embedding", "e.embedding")}
                       * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5)
           / 1000000 AS cosine
  FROM b e, q
  WHERE e.vec_id != q.qid
), truth AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
), r AS (
  SELECT qid,
         CAST(SUM(CASE WHEN bucket = qbucket THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         FLOOR((CAST(SUM(CASE WHEN bucket = qbucket THEN 1 ELSE 0 END) AS DOUBLE)
                / {ANN_RECALL_K}) * 10000 + 0.5) / 10000 AS recall_at_k
  FROM truth WHERE rnk <= {ANN_RECALL_K}
  GROUP BY qid
), c AS (
  SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM b e, q
  WHERE e.bucket = q.qbucket AND e.vec_id != q.qid
  GROUP BY q.qid
)
SELECT r.qid, r.hits, r.recall_at_k,
       CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates
FROM r LEFT JOIN c ON r.qid = c.qid
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs, bucket-local (LSH candidates only)
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.35
NEARDUP_BANDS = 4
NEARDUP_BAND_BITS = 16
NEARDUP_BUCKET_CAP = 1000


def embedding_neardup_pairs(
    emb: DataFrame,
    *,
    bands: int = NEARDUP_BANDS,
    band_bits: int = NEARDUP_BAND_BITS,
    bucket_cap: int = NEARDUP_BUCKET_CAP,
    threshold: float = NEARDUP_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs via multi-band sign-LSH: a pair is a candidate if it
    agrees on the signs of ANY band's ``band_bits`` consecutive dimensions.

    Scale shape: one explode (``bands``× rows) → equi-join on
    (band, bucket) → within-bucket pairs → distinct. With b bands of k bits
    the quadratic work is O(bands · n²/2^k) instead of the single-8-bit
    bucket's O(n²/256), and ``bucket_cap`` drops degenerate buckets (e.g.
    all-zero embeddings or dead dimensions at 100 TB) instead of letting
    one hot bucket go quadratic — standard LSH practice: an over-full
    bucket carries no discriminating signal."""
    # squared norm once per VECTOR, before the band explode duplicates rows
    emb = emb.select("vec_id", "embedding", _sq_norm("embedding").alias("_n2"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                _sign_bucket(
                    "embedding", band_bits, b * band_bits
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    e = emb.select(
        "vec_id", "embedding", "_n2", F.explode(band_structs).alias("_b")
    ).select("vec_id", "embedding", "_n2", "_b.band", "_b.bucket")
    # window count over the same (band, bucket) shuffle the join needs —
    # a separate groupBy branch would re-execute the banding subplan; with
    # the window the a/b sides are identical and the exchange is reused
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    e = (
        e.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= bucket_cap)
        .drop("_n")
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = roundn(
        _cosine_pre("a.embedding", "b.embedding", "a._n2", "b._n2"),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
        .distinct()  # a pair can agree in more than one band
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb)


def _neardup_band_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {b} THEN {_sql_sign_bucket(col, NEARDUP_BAND_BITS, b * NEARDUP_BAND_BITS)}"
        for b in range(NEARDUP_BANDS)
    )
    return f"CASE band {whens} END"


Q_EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
), banded AS (
  SELECT vec_id, embedding, band, {_neardup_band_case("embedding")} AS bucket
  FROM e, range(0, {NEARDUP_BANDS}) t(band)
), ok AS (
  SELECT band, bucket FROM banded GROUP BY 1, 2
  HAVING COUNT(*) <= {NEARDUP_BUCKET_CAP}
), bx AS (
  SELECT banded.* FROM banded JOIN ok USING (band, bucket)
), pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         FLOOR(({_sql_dot("a.embedding", "b.embedding")}
                / SQRT({_sql_dot("a.embedding", "a.embedding")} * {_sql_dot("b.embedding", "b.embedding")})) * 1000000 + 0.5) / 1000000 AS cosine
  FROM bx a JOIN bx b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine > {NEARDUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# K-means IVF quantizer training (Lloyd's, unrolled): train k centroids on
# a bounded sample, assign the whole table, report the cluster histogram.
# The Spark side drives operators/kmeans.py (assign via broadcast-literal
# argmin, update via one (cluster, dim) shuffle); the oracle unrolls the
# SAME fixed number of rounds as chained CTEs. Centroid means are rounded
# to 6 dp each round in BOTH engines so summation order can never flip an
# argmin — the rounded-centroid determinism trick q_ann_ivf already uses.
# ---------------------------------------------------------------------------

KMEANS_K = 4
KMEANS_ROUNDS = 2
KMEANS_TRAIN_LIMIT = 256  # train on a bounded id-range sample


def _rounded_update(assigned: DataFrame, prev: list[list[float]]) -> list[list[float]]:
    """Per-cluster mean, rounded 6 dp; empty clusters keep ``prev``."""
    rows = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("centroid")
        )
        .collect()
    )
    updated = {r.cluster: list(r.centroid) for r in rows}
    return [updated.get(i, prev[i]) for i in range(len(prev))]


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.kmeans import assign_clusters

    # round-8 NULL-payload policy: clustering covers vectors that EXIST —
    # NULL embeddings are excluded at the scan in BOTH engines (the
    # trainer cannot seed from a NULL row, and a NULL distance would
    # otherwise pick an engine-dependent "nearest" cluster)
    # round-11 A/B note: the lazy in-plan Lloyd chain (lazy_lloyd_cents,
    # adopted for the SemDeDup family) was MEASURED SLOWER here (1.7 s →
    # 3.1 s best-of-3 at sf0.1): at k = 4 the literal-centroid plans are
    # tiny and the lazy chain's extra broadcast/AQE stages cost more than
    # the two driver collects they remove — the driver loop stays.
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    train = emb.filter(F.col("vec_id") < KMEANS_TRAIN_LIMIT)
    init = train.orderBy("vec_id").limit(KMEANS_K).collect()
    cents = [[float(v) for v in r.embedding] for r in init]
    if not cents:  # empty training set -> no clusters, typed empty result
        return spark.createDataFrame(
            [], "cluster int, n_vecs long, avg_sq_norm double"
        )
    for _ in range(KMEANS_ROUNDS):
        cents = _rounded_update(assign_clusters(train, cents), cents)
    return (
        assign_clusters(emb, cents)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            roundn(F.avg(_sq_norm("embedding")), 4).alias("avg_sq_norm"),
        )
    )


def _kmeans_sql() -> str:
    dist = (
        "list_sum(list_transform(range(1, len({v}) + 1),"
        " i -> (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])"
        " * (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])))"
    )

    def assign_cte(name: str, src: str, cents: str) -> str:
        d = dist.format(v=f"{src}.embedding", c=cents)
        return f"""{name} AS (
  SELECT vec_id, embedding, c AS cluster FROM (
    SELECT {src}.vec_id, {src}.embedding, {cents}.c,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {d} ASC, {cents}.c ASC) AS rn
    FROM {src}, {cents}
  ) WHERE rn = 1
)"""

    def update_cte(name: str, assigned: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT p.c,
         COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cluster AS c,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT cluster, dim,
             FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT cluster,
               UNNEST(range(1, len(embedding) + 1)) AS dim,
               UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        FROM {assigned}
      )
      GROUP BY cluster, dim
    )
    GROUP BY cluster
  ) u ON u.c = p.c
)"""

    ctes = [
        # round-8 NULL-payload policy: clustering covers non-NULL vectors
        "embnn AS (SELECT vec_id, embedding FROM embeddings"
        " WHERE embedding IS NOT NULL)",
        f"train AS (SELECT vec_id, embedding FROM embnn WHERE vec_id < {KMEANS_TRAIN_LIMIT})",
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT * FROM train ORDER BY vec_id LIMIT {KMEANS_K})
)""",
    ]
    prev = "c0"
    for r in range(KMEANS_ROUNDS):
        ctes.append(assign_cte(f"a{r}", "train", prev))
        ctes.append(update_cte(f"c{r + 1}", f"a{r}", prev))
        prev = f"c{r + 1}"
    ctes.append(assign_cte("afinal", "embnn", prev))
    sq = _sql_dot("afinal.embedding", "afinal.embedding")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT cluster, COUNT(*) AS n_vecs,
       FLOOR(AVG({sq}) * 10000 + 0.5) / 10000 AS avg_sq_norm
FROM afinal
GROUP BY cluster
"""
    )


Q_KMEANS_SQL = _kmeans_sql()


# ---------------------------------------------------------------------------
# Per-label embedding norm stats (array aggregation + group-by)
# ---------------------------------------------------------------------------

def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq = roundn(_sq_norm("embedding"), 6)
    return (
        emb.select("label", sq.alias("sq_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            roundn(F.sum("sq_norm") / F.count(F.lit(1)), 4).alias("avg_sq_norm"),
            F.max("sq_norm").alias("max_sq_norm"),
        )
    )


Q_EMBEDDING_NORMS_SQL = f"""
WITH n AS (
  SELECT label,
         FLOOR(({_sql_dot("embedding", "embedding")}) * 1000000 + 0.5) / 1000000 AS sq_norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       FLOOR((SUM(sq_norm) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_sq_norm,
       MAX(sq_norm) AS max_sq_norm
FROM n
GROUP BY label
"""


# ---------------------------------------------------------------------------
# Batched ANN: top-3 neighbors for each of a batch of query vectors in ONE
# join+window pass (how a serving pipeline issues ANN: per-batch, not
# per-query jobs).
# ---------------------------------------------------------------------------

N_QUERY_BATCH = 5


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_n2", _sq_norm("embedding")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_BATCH).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("_n2").alias("_qn2"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            roundn(
                _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "vec_id", "cosine", "rank")
    )


Q_KNN_BATCH_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {N_QUERY_BATCH}
), scored AS (
  SELECT q.query_id, e.vec_id,
         FLOOR(({_sql_dot("e.embedding", "q.qvec")}
                / SQRT({_sql_dot("e.embedding", "e.embedding")} * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5) / 1000000 AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Per-label centroids (the IVF coarse-quantizer building block): element-wise
# mean vector per label via positional explode — one shuffle keyed by
# (label, dim), linear in N x dims.
# ---------------------------------------------------------------------------

def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .filter(F.col("dim") < 8)  # first 8 dims keep the result compact
        .groupBy("label", "dim")
        .agg(
            roundn(
                F.sum(F.col("v").cast("double")) / F.count(F.lit(1)), 6
            ).alias("centroid_v"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


Q_LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
)
SELECT label, CAST(dim AS INTEGER) AS dim,
       FLOOR((SUM(CAST(v AS DOUBLE)) / COUNT(*)) * 1000000 + 0.5) / 1000000 AS centroid_v,
       COUNT(*) AS n_vecs
FROM e
WHERE dim < 8
GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# IVF-probe ANN: coarse quantizer = per-label centroid vectors; the query
# probes only its nearest cell, so the fine scan touches ~1/n_cells of the
# data. Centroid coordinates are floor-rounded to 6 decimals BEFORE scoring,
# making the cell assignment identical across engines despite differing
# float-summation orders. At 100 TB: centroids are a tiny broadcast table;
# cell assignment is a map-side broadcast join (no shuffle of the vectors);
# with data written partitioned by cell, the probe prunes whole files.
# ---------------------------------------------------------------------------

def _label_centroids(emb: DataFrame) -> DataFrame:
    """(label, centroid): 6-dp-rounded per-label mean vectors — the coarse
    quantizer every IVF-family query shares. ONE (label, dim)-keyed shuffle
    (partial-aggregatable), centroids reassembled in dim order. The
    rounding grain is the cross-engine determinism convention: change it
    here and in _CENTROID_CTES together."""
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(roundn(F.sum(F.col("v").cast("double")) / F.count(F.lit(1)), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)"
            ).alias("centroid")
        )
    )


#: the SQL mirror of _label_centroids — shared WITH-prefix for every
#: IVF-family oracle so the centroid convention lives in exactly one place
#: per engine
_CENTROID_CTES = """e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim,
         FLOOR((SUM(CAST(v AS DOUBLE)) / COUNT(*)) * 1000000 + 0.5) / 1000000 AS cv
  FROM e GROUP BY label, dim
),
carr AS (
  SELECT label, list(cv ORDER BY dim) AS centroid FROM cent GROUP BY label
)"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_n2", _sq_norm("embedding")
    )
    cent = _label_centroids(emb.drop("_n2"))
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").alias("qvec"), F.col("_n2").alias("_qn2"))
    )
    best = (
        cent.crossJoin(F.broadcast(qv))
        .select(
            "label",
            "qvec",
            "_qn2",
            roundn(
                _cosine("centroid", "qvec"),
                6,
            ).alias("cscore"),
        )
        .orderBy(F.desc("cscore"), F.asc("label"))
        .limit(1)
        .select("label", "qvec", "_qn2")
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(best), on="label")
        .select(
            "vec_id",
            "label",
            roundn(
                _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


Q_ANN_IVF_SQL = f"""
WITH {_CENTROID_CTES},
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
best AS (
  SELECT label FROM carr, q
  ORDER BY FLOOR(({_sql_dot("centroid", "qvec")}
                  / SQRT({_sql_dot("centroid", "centroid")} * {_sql_dot("qvec", "qvec")})) * 1000000 + 0.5) / 1000000 DESC,
           label ASC
  LIMIT 1
)
SELECT vec_id, e2.label,
       FLOOR(({_sql_dot("e2.embedding", "q.qvec")}
              / SQRT({_sql_dot("e2.embedding", "e2.embedding")} * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5) / 1000000 AS cosine
FROM embeddings e2 JOIN best ON e2.label = best.label, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Multi-probe IVF: probe the P nearest cells instead of 1 — the standard
# recall/latency knob (single-probe misses neighbors that fall just across
# a cell boundary; P cells scan P/n_cells of the corpus and recover them).
# Plan shape is unchanged from q_ann_ivf: centroids are a tiny broadcast,
# the probe set is P rows broadcast into one equi-join on the cell id —
# with vectors partitioned by cell, P partitions' files are read and the
# rest are pruned at the source. ``probe_rank`` in the output shows which
# probe produced each hit (rank 1 = the single-probe cell).
# ---------------------------------------------------------------------------

IVF_PROBES = 3


def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_n2", _sq_norm("embedding")
    )
    cent = _label_centroids(emb.drop("_n2"))
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").alias("qvec"), F.col("_n2").alias("_qn2"))
    )
    w = Window.orderBy(F.desc("cscore"), F.asc("label"))
    probes = (
        cent.crossJoin(F.broadcast(qv))
        .select(
            "label",
            "qvec",
            "_qn2",
            roundn(
                _cosine("centroid", "qvec"),
                6,
            ).alias("cscore"),
        )
        .orderBy(F.desc("cscore"), F.asc("label"))
        .limit(IVF_PROBES)
        # window over <= P rows — the probe set, never the corpus
        .withColumn("probe_rank", F.row_number().over(w).cast("long"))
        .select("label", "qvec", "_qn2", "probe_rank")
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), on="label")
        .select(
            "vec_id",
            "label",
            "probe_rank",
            roundn(
                _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


Q_ANN_IVF_MULTIPROBE_SQL = f"""
WITH {_CENTROID_CTES},
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT label,
         FLOOR(({_sql_dot("centroid", "qvec")}
                / SQRT({_sql_dot("centroid", "centroid")} * {_sql_dot("qvec", "qvec")})) * 1000000 + 0.5) / 1000000 AS cscore
  FROM carr, q
),
probes AS (
  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY cscore DESC, label ASC) AS BIGINT) AS probe_rank
  FROM scored
  ORDER BY cscore DESC, label ASC
  LIMIT {IVF_PROBES}
)
SELECT vec_id, e2.label, p.probe_rank,
       FLOOR(({_sql_dot("e2.embedding", "q.qvec")}
              / SQRT({_sql_dot("e2.embedding", "e2.embedding")} * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5) / 1000000 AS cosine
FROM embeddings e2 JOIN probes p ON e2.label = p.label, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# IVF probe→recall curve: for a sample of queries, what fraction of the
# exact cosine top-k lives in the 1 / 2 / 3 nearest cells? This is THE
# number that sets the probe count (the q_ann_ivf_multiprobe knob): the
# corpus-sized work is one cell-assignment map + the ground-truth scoring
# pass (sample-bounded, like q_ann_recall); cell rankings are tiny
# (queries × cells) broadcasts. Distances rank on 6-dp-rounded doubles
# with a label tie-break so both engines order cells identically.
# ---------------------------------------------------------------------------

IVF_RECALL_K = 10
IVF_RECALL_QUERIES = 20
IVF_RECALL_PROBES = (1, 2, 3)


def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = _label_centroids(emb)
    cents1 = cent.agg(
        F.collect_list(F.struct("label", "centroid")).alias("cents")
    )
    # per-vector cell: argmin over the broadcast centroid array on the
    # ROUNDED squared distance (6 dp), ties to the lowest label
    cell = F.expr(
        "array_min(transform(cents, s -> struct("
        " CAST(floor(aggregate(zip_with(embedding, s.centroid, (x, y) ->"
        "  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) * 1000000 + 0.5) AS DOUBLE)"
        " / 1000000 AS d,"
        " s.label AS c))).c"
    )
    vecs = emb.crossJoin(F.broadcast(cents1)).select(
        "vec_id",
        "embedding",
        cell.alias("cell"),
        _sq_norm("embedding").alias("_n2"),
    )
    qs = vecs.filter(F.col("vec_id") < IVF_RECALL_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("_n2").alias("_qn2"),
    )
    # query-side cell ranking: queries × cells — tiny both sides
    qdist = roundn(
        F.expr(
            "aggregate(zip_with(qvec, centroid, (x, y) ->"
            " (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ),
        6,
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("qd"), F.asc("label"))
    qcells = (
        qs.crossJoin(F.broadcast(cent))
        .select("qid", "label", qdist.alias("qd"))
        .withColumn("crank", F.row_number().over(wq).cast("long"))
        .select("qid", "label", "crank")
    )
    # exact cosine ground truth over the query sample (q_ann_recall shape)
    scored = vecs.join(F.broadcast(qs), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        "cell",
        roundn(
            _cosine_pre("embedding", "qvec", "_n2", "_qn2"),
            6,
        ).alias("cosine"),
    )
    wt = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    truth = scored.withColumn("rnk", F.row_number().over(wt)).filter(
        F.col("rnk") <= IVF_RECALL_K
    )
    joined = truth.join(
        F.broadcast(qcells),
        (truth.qid == qcells.qid) & (truth.cell == qcells.label),
    ).select(truth.qid.alias("qid"), "crank")
    aggs = [
        roundn(
            F.sum((F.col("crank") <= p).cast("int")).cast("double")
            / F.lit(float(IVF_RECALL_K))
        ).alias(f"recall_p{p}")
        for p in IVF_RECALL_PROBES
    ]
    return joined.groupBy("qid").agg(*aggs)


_IVF_SQDIST = (
    "list_sum(list_transform(range(1, len({v}) + 1),"
    " i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])))"
)

Q_IVF_RECALL_SQL = f"""
WITH {_CENTROID_CTES},
vc AS (
  SELECT vec_id, embedding, carr.label AS cl,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
           FLOOR(({_IVF_SQDIST.format(v="embedding", c="centroid")}) * 1000000 + 0.5) / 1000000 ASC,
           carr.label ASC) AS rn
  FROM embeddings, carr
),
cells AS (
  SELECT vec_id, embedding, cl AS cell FROM vc WHERE rn = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM cells
  WHERE vec_id < {IVF_RECALL_QUERIES}
),
qcells AS (
  SELECT qid, label,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
           FLOOR(({_IVF_SQDIST.format(v="qvec", c="centroid")}) * 1000000 + 0.5) / 1000000 ASC,
           label ASC) AS BIGINT) AS crank
  FROM q, carr
),
scored AS (
  SELECT q.qid, c.vec_id, c.cell,
         FLOOR(({_sql_dot("c.embedding", "q.qvec")}
                / SQRT({_sql_dot("c.embedding", "c.embedding")}
                       * {_sql_dot("q.qvec", "q.qvec")})) * 1000000 + 0.5)
           / 1000000 AS cosine
  FROM cells c, q
  WHERE c.vec_id != q.qid
),
truth AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {IVF_RECALL_K}
)
SELECT t.qid,
       {", ".join(
         f"FLOOR((CAST(SUM(CASE WHEN qc.crank <= {p} THEN 1 ELSE 0 END) AS DOUBLE)"
         f" / {IVF_RECALL_K}) * 10000 + 0.5) / 10000 AS recall_p{p}"
         for p in IVF_RECALL_PROBES
       )}
FROM truth t JOIN qcells qc ON t.qid = qc.qid AND t.cell = qc.label
GROUP BY t.qid
"""


# ---------------------------------------------------------------------------
# Product quantization + ADC search: train m sub-quantizers (ONE fused
# (sub, code, dim) shuffle per Lloyd round — not m jobs), encode the whole
# table to m small codes, then answer a query via the broadcast m x k
# distance table (asymmetric distance computation). The 100 TB story:
# scanning codes (m ints) instead of embeddings (dim floats) cuts the
# scan-side bytes ~dim/m x, and the per-row work is m table lookups.
# Oracle: the DuckDB side runs the SAME rounds generically over an
# exploded (vec_id, sub, svec) relation — per-round centroid means and
# per-entry table distances rounded 6 dp, final ADC sum rounded 4 dp, so
# summation order can't flip a hash (see operators/pq.py).
# ---------------------------------------------------------------------------

PQ_M = 4
PQ_K = 8
PQ_ROUNDS = 1
PQ_TRAIN_LIMIT = 256
PQ_TOPK = 10


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators import pq

    # round-8 NULL-payload policy: PQ trains/encodes/queries over vectors
    # that EXIST — NULL embeddings excluded at the scan in BOTH engines
    # (the query row is the lowest NON-NULL vec_id)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    train = emb.filter(F.col("vec_id") < PQ_TRAIN_LIMIT)
    qrow = emb.orderBy("vec_id").limit(1).collect()
    if not qrow:  # empty table -> typed empty result
        return spark.createDataFrame([], "vec_id long, adc_dist double")
    codebooks = pq.pq_fit(train, PQ_M, PQ_K, rounds=PQ_ROUNDS)
    query = [float(v) for v in qrow[0].embedding]
    table = pq.adc_table(codebooks, query)
    enc = pq.pq_encode(emb, codebooks).filter(
        F.col("vec_id") != int(qrow[0].vec_id)
    )
    return (
        pq.pq_adc_scores(enc, table)
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(PQ_TOPK)
        .select("vec_id", "adc_dist")
    )


def _pq_sql() -> str:
    w = 64 // PQ_M
    dist = (
        "list_sum(list_transform(range(1, len({v}) + 1),"
        " i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])))"
    )

    def assign_cte(name: str, src: str, cents: str) -> str:
        d = dist.format(v=f"{src}.svec", c=f"{cents}.cvec")
        return f"""{name} AS (
  SELECT vec_id, sub, svec, code FROM (
    SELECT {src}.vec_id, {src}.sub, {src}.svec, {cents}.code,
           row_number() OVER (PARTITION BY {src}.vec_id, {src}.sub
                              ORDER BY {d} ASC, {cents}.code ASC) AS rn
    FROM {src} JOIN {cents} ON {cents}.sub = {src}.sub
  ) WHERE rn = 1
)"""

    ctes = [
        # round-8 NULL-payload policy: PQ covers non-NULL vectors
        "embnn AS (SELECT vec_id, embedding FROM embeddings"
        " WHERE embedding IS NOT NULL)",
        f"train AS (SELECT vec_id, embedding FROM embnn WHERE vec_id < {PQ_TRAIN_LIMIT})",
        f"""subs AS (
  SELECT vec_id, j.j AS sub,
         list_transform(list_slice(embedding, j.j * {w} + 1, (j.j + 1) * {w}),
                        x -> CAST(x AS DOUBLE)) AS svec
  FROM train, range(0, {PQ_M}) j(j)
)""",
        f"""c0 AS (
  SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS code,
         svec AS cvec
  FROM subs
  WHERE vec_id IN (SELECT vec_id FROM train ORDER BY vec_id LIMIT {PQ_K})
)""",
    ]
    prev = "c0"
    for r in range(PQ_ROUNDS):
        ctes.append(assign_cte(f"a{r}", "subs", prev))
        ctes.append(
            f"""c{r + 1} AS (
  SELECT p.sub, p.code, COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT sub, code,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT sub, code, dim, FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT sub, code,
               UNNEST(range(1, len(svec) + 1)) AS dim,
               UNNEST(svec) AS v
        FROM a{r}
      )
      GROUP BY sub, code, dim
    )
    GROUP BY sub, code
  ) u ON u.sub = p.sub AND u.code = p.code
)"""
        )
        prev = f"c{r + 1}"
    ctes += [
        f"""all_subs AS (
  SELECT vec_id, j.j AS sub,
         list_transform(list_slice(embedding, j.j * {w} + 1, (j.j + 1) * {w}),
                        x -> CAST(x AS DOUBLE)) AS svec
  FROM embnn, range(0, {PQ_M}) j(j)
)""",
        assign_cte("enc", "all_subs", prev),
        """qv AS (
  SELECT vec_id, embedding FROM embnn ORDER BY vec_id LIMIT 1
)""",
        f"""qsubs AS (
  SELECT j.j AS sub,
         list_transform(list_slice(embedding, j.j * {w} + 1, (j.j + 1) * {w}),
                        x -> CAST(x AS DOUBLE)) AS svec
  FROM qv, range(0, {PQ_M}) j(j)
)""",
        f"""tbl AS (
  SELECT c.sub, c.code,
         FLOOR(({dist.format(v='q.svec', c='c.cvec')}) * 1000000 + 0.5) / 1000000 AS d
  FROM {prev} c JOIN qsubs q ON q.sub = c.sub
)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.vec_id,
       FLOOR(SUM(t.d) * 10000 + 0.5) / 10000 AS adc_dist
FROM enc e
JOIN tbl t ON t.sub = e.sub AND t.code = e.code
WHERE e.vec_id != (SELECT min(vec_id) FROM embnn)
GROUP BY e.vec_id
ORDER BY adc_dist ASC, e.vec_id ASC
LIMIT {PQ_TOPK}
"""
    )


Q_PQ_TOPK_SQL = _pq_sql()


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster embeddings with a
# coarse quantizer, then inside each cell drop all but one member of every
# cosine-ε ball. Cells here are the per-label mean centroids (the same
# coarse quantizer q_ann_ivf probes; production trains it with
# operators/kmeans.py at k ≈ n/10k and composes the bucket-cap guard from
# embedding_neardup_pairs). The keep rule is deterministic keep-lowest-id
# (the paper keeps the member farthest from the centroid; any fixed rule
# dedups the ball — lowest id is reproducible across engines).
#
# Scale shape: centroids reduce to ONE broadcastable row
# (collect_list into a single array — k·dim doubles), so cell assignment is
# a narrow map via a higher-order argmin: NO shuffle of the vector table to
# assign. (A literal-unrolled fully-codegen assign was measured SLOWER here:
# 640 unrolled terms push the Project past the whole-stage-codegen size
# limits, dropping the entire stage to interpreted mode — the HOF fold keeps
# the surrounding stage codegen'd.) The only corpus-sized shuffles are the
# within-cell self-join (quadratic per cell only, O(n²/k)) and the final
# per-vector aggregation — the SemDeDup cost model.
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.35
_SEMDEDUP_DIMS = 64  # corpus embedding width (operators/pq.py relies on it)


def q_semantic_dedup_smallk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents1 = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)"
            ).alias("cvec")
        )
        .agg(F.collect_list(F.struct("label", "cvec")).alias("cents"))
    )
    # argmin over the broadcast centroid array: struct comparison is
    # lexicographic, ties break to the lowest cell id — same trick as
    # operators/kmeans.assign_clusters, but with in-plan centroids
    cell = F.expr(
        "array_min(transform(cents, s -> struct("
        " aggregate(zip_with(embedding, s.cvec, (x, y) ->"
        "  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        " s.label AS c))).c"
    )
    n_dims = _SEMDEDUP_DIMS
    # Per-row precompute: double-cast vector + norm ONCE, so each of the
    # O(n²/k) pair comparisons is a single fold over doubles (no per-pair
    # casts, no per-pair norm recompute — measured 8.6 s → ~2 s at sf0.1).
    # Identical a/b subplans also let Spark reuse the cell-join exchange.
    assigned = (
        emb.crossJoin(F.broadcast(cents1))
        .select(
            "vec_id",
            cell.alias("cell"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dvec"),
        )
        .withColumn(
            "norm",
            F.expr(
                "sqrt(aggregate(zip_with(dvec, dvec, (x, y) -> x * y),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
            ),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    # Unrolled 64-term dot: interpreted higher-order lambdas cost ~50 ns per
    # element — at O(n²/k) pairs that IS the query (measured 5.0 s at sf0.1);
    # a flat left-associated sum is whole-stage-codegen arithmetic (1.7 s)
    # and adds in the same order as the fold, so the double is bit-identical.
    # 64 dims is the corpus embedding width (operators/pq.py relies on it).
    pair_dot = F.expr(
        " + ".join(f"(a.dvec[{i}] * b.dvec[{i}])" for i in range(n_dims))
    )
    # zero-norm guard: an all-zero embedding has no angle — NULL cosine
    # (DuckDB's /0 -> NULL), so the >= threshold join arm never matches;
    # without it ANSI mode throws DIVIDE_BY_ZERO (zero-vector sweep)
    den = F.col("a.norm") * F.col("b.norm")
    cos = F.when(den > 0, roundn(pair_dot / den, 6))
    # LEFT join from every b row to its earlier near-duplicates, then one
    # any-match aggregation — fuses the old pairs → distinct → join-back
    # tail (3 stages, a 3rd re-execution of `assigned`) into join + groupBy:
    # fewer exchanges, and at scale the only corpus-sized shuffles are the
    # cell-join and the final per-vec_id aggregation.
    return (
        b.join(
            a,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id"))
            & (cos >= SEMDEDUP_THRESHOLD),
            "left",
        )
        .groupBy(F.col("b.vec_id").alias("vec_id"), F.col("b.cell").alias("cell"))
        .agg(
            F.max(
                F.when(F.col("a.vec_id").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("keep")
        )
    )


_SEMDEDUP_SQDIST = (
    "list_sum(list_transform(range(1, len({v}) + 1),"
    " i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])))"
)

Q_SEMANTIC_DEDUP_SMALLK_SQL = f"""
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
), cent AS (
  SELECT label, dim,
         FLOOR((SUM(CAST(v AS DOUBLE)) / COUNT(*)) * 1000000 + 0.5) / 1000000 AS cv
  FROM e GROUP BY label, dim
), carr AS (
  SELECT label, list(cv ORDER BY dim) AS cvec FROM cent GROUP BY label
), assigned0 AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT emb.vec_id, emb.embedding, carr.label AS cell,
           row_number() OVER (PARTITION BY emb.vec_id
                              ORDER BY {_SEMDEDUP_SQDIST.format(v="emb.embedding", c="carr.cvec")} ASC,
                                       carr.label ASC) AS rn
    FROM embeddings emb, carr
  ) WHERE rn = 1
), assigned AS (
  -- precomputed double vector + norm, mirroring the Spark side exactly:
  -- the pair expression divides by norm_a * norm_b (NOT sqrt(sq_a * sq_b),
  -- which differs in the last ulp), so both engines round the same double
  SELECT vec_id, cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
         SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS norm
  FROM assigned0
), drops AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE FLOOR(({_sql_dot("a.dvec", "b.dvec")}
               / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
        >= {SEMDEDUP_THRESHOLD}
)
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# Scale-true SemDeDup — the CANONICAL q_semantic_dedup since round 4.
# The q_semantic_dedup_smallk variant above keeps the paper's "cells =
# class labels" quantizer, which is a FIXED k — within-cell pair work is
# O(n²/k) and therefore quadratic as the corpus grows (measured 15.4× wall
# at 10× data, BENCHNOTES.md). This plan is the shape you run at 100 TB:
#
#   quantizer  k-means (operators/kmeans.py) with k TRACKING corpus size
#              (k ≈ n / CELL_TARGET, clamped) trained on a 20% mod-sample
#              with rounded-centroid updates — so expected cell size is a
#              CONSTANT and pair work is O(n · CELL_TARGET), linear in n.
#              Assignment dispatches to the Arrow/BLAS GEMM path past
#              k = 128 cells (13× at k = 1000, measured) — at driver-oracle
#              scale (sf0.01, k = 8) the interpreted fold runs, keeping
#              distance arithmetic bit-identical to the SQL CTEs.
#   cell cap   the realized-cell-size guard from embedding_neardup_pairs:
#              a window count over the SAME cell shuffle the self-join
#              needs; members of cells larger than SEMDEDUP_CELL_CAP take
#              no part in pair generation and keep = 1 (bounded work under
#              quantizer degeneracy — one runaway cell can't go quadratic).
#
# Remaining super-linear term: assignment is O(n·k·d) = O(n²·d/CELL_TARGET)
# once k tracks n — but through one BLAS GEMM per Arrow batch its constant
# is ~10⁻¹⁰ s/flop (256 Mflop at 10×, milliseconds), and k is clamped at
# SEMDEDUP_K_MAX: past that a two-level (hierarchical) quantizer is the
# documented path, same as IVF practice. The n·CELL_TARGET pair fold is the
# measured cost driver and it scales linearly.
#
# The oracle unrolls the SAME Lloyd rounds as chained CTEs (the
# Q_KMEANS_SQL technique) with k computed from COUNT(*), then mirrors the
# sized/capped pair join.
# ---------------------------------------------------------------------------

SEMDEDUP_CELL_TARGET = 100   # expected vectors per cell: k = n / this
SEMDEDUP_K_MIN = 8
SEMDEDUP_K_MAX = 4096        # past this, shard or go hierarchical
SEMDEDUP_CELL_CAP = 400      # realized-cell guard (4× target)
SEMDEDUP_ROUNDS = 2          # Lloyd rounds — matches KMEANS_ROUNDS
SEMDEDUP_TRAIN_MOD = 5       # train on vec_id % 5 == 0 (20% mod-sample)


def _materialize_working_set(df: DataFrame) -> DataFrame:
    """Materialize the multi-pass k-means working set ONCE (the sizing
    count, the Lloyd rounds, and the final assignment all re-read it).

    The strategy is switchable via UBSPARK_SEMDEDUP_MATERIALIZE so the
    run-to-run variance of the SemDeDup family can be A/B-measured
    (round 11, VERDICT r10 #3 — BENCHNOTES records the comparison):

      localCheckpoint  eager executor-block materialization, lineage
                       truncated (default — measured winner; see
                       BENCHNOTES round 11)
      disk_only        persist(StorageLevel.DISK_ONLY) + count: blocks
                       on executor-local disk, lineage kept (cache-hit
                       short-circuit at execution, full lineage at
                       planning)
      memory_deser     persist(MEMORY_AND_DISK_DESER) + count — Spark's
                       default cache level
    """
    import os

    mode = os.environ.get("UBSPARK_SEMDEDUP_MATERIALIZE", "localCheckpoint")
    if mode == "localCheckpoint":
        return df.localCheckpoint()
    from pyspark import StorageLevel

    level = {
        "disk_only": StorageLevel.DISK_ONLY,
        "memory_deser": StorageLevel.MEMORY_AND_DISK_DESER,
    }[mode]
    df = df.persist(level)
    df.count()  # eager, like localCheckpoint(eager=True)
    return df


def _cents_row(cents_df: DataFrame) -> DataFrame:
    """Fold a (c int, cvec array<double>) centroid table into the ONE-row
    broadcastable ``cents`` array-of-structs the argmin expression scans."""
    return cents_df.agg(
        F.sort_array(F.collect_list(F.struct("c", "cvec"))).alias("_cents")
    )


_LAZY_ARGMIN = (
    "array_min(transform(_cents, s -> struct("
    " aggregate(zip_with({v}, s.cvec, (x, y) ->"
    "  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
    "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
    " s.c AS c))).c"
)


def lazy_assign(
    df: DataFrame, cents_row: DataFrame, out_col: str = "cluster"
) -> DataFrame:
    """``df`` + ``out_col``: nearest-centroid id against the 1-row
    ``cents_row`` artifact — the LAZY twin of ``operators.kmeans.
    assign_clusters``. Same fold arithmetic ((CAST(x AS DOUBLE) - y)²
    left-fold over doubles), same struct-argmin lowest-id tie-break, same
    NULL-vector → NULL contract, so assignments are bit-identical; the
    centroids ride a broadcast crossJoin instead of a plan literal, which
    keeps the whole Lloyd chain inside ONE Spark job (no per-round
    driver collect) and keeps k·d doubles out of the expression tree."""
    best = F.expr(_LAZY_ARGMIN.format(v="embedding"))
    return (
        df.crossJoin(F.broadcast(cents_row))
        .withColumn(
            out_col, F.when(F.col("embedding").isNotNull(), best)
        )
        .drop("_cents")
    )


def _lazy_rounded_update(
    assigned: DataFrame, cents_df: DataFrame, cluster_col: str = "cluster"
) -> DataFrame:
    """LAZY twin of ``_rounded_update``: per-cluster mean rounded 6 dp;
    empty clusters keep their previous centroid via the LEFT join —
    returns the next (c, cvec) centroid table without an action.

    The mean is computed as ``d`` per-column ``avg`` aggregates in ONE
    (cluster)-keyed exchange, not posexplode → (cluster, dim) groupBy →
    (cluster) re-group: the explode form shuffles d rows per cluster per
    mapper through TWO exchanges (guide §2.3/§2.4 — same values, 2×
    stages); per-element avgs are the identical partial-aggregated
    double means, rounded 6 dp like every centroid update."""
    # posexplode → (cluster, dim) avg → re-group, matching _rounded_update
    # exactly. An A/B against d per-column avg aggregates in one exchange
    # (ABAB, 4 process pairs) measured the explode form consistently
    # FASTER here despite the extra exchange — the 64 array-extract agg
    # buffers cost more per row than the explode at this dim count — so
    # the bit-matching shape also wins on time.
    means = (
        assigned.select(cluster_col, F.posexplode("embedding").alias("dim", "v"))
        .groupBy(cluster_col, "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("m"))
        .groupBy(cluster_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("mvec")
        )
    )
    return cents_df.join(
        F.broadcast(means), cents_df["c"] == means[cluster_col], "left"
    ).select("c", F.coalesce("mvec", "cvec").alias("cvec"))


def lazy_lloyd_cents(
    train: DataFrame,
    init_cents: list[list[float]],
    rounds: int = SEMDEDUP_ROUNDS,
) -> DataFrame:
    """``rounds`` rounded Lloyd iterations over ``train`` built as ONE
    lazy plan (the Spark twin of the oracle's unrolled CTE chain): the
    centroid state stays a k-row DataFrame, each round is
    assign → rounded update → coalesce-with-previous, and nothing
    executes until the consumer's single action. Replaces the former
    per-round ``collect()`` driver loop, whose job-submission +
    k·d-literal planning overhead dominated the family at bench scale
    (BENCHNOTES round 11) — per-round arithmetic is unchanged, so
    centroids (and every downstream assignment) are bit-identical.
    Returns the final (c int, cvec array<double>) table."""
    spark = train.sparkSession
    cents_df = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(init_cents)],
        "c int, cvec array<double>",
    )
    for _ in range(rounds):
        assigned = lazy_assign(
            train.select("embedding"), _cents_row(cents_df)
        )
        cents_df = _lazy_rounded_update(assigned, cents_df)
    return cents_df


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.kmeans import assign_clusters_blas

    # round-8 NULL-payload policy: semantic dedup covers vectors that
    # EXIST — NULL embeddings excluded at the scan in BOTH engines.
    # round-9: the filtered narrow projection is localCheckpoint'ed ONCE —
    # the k ∝ n sizing count, the Lloyd rounds, and the full assignment
    # pass are all multi-pass consumers of the same working set, and the
    # checkpoint turns 4-5 parquet scans + filter re-evals into one
    # (executor-local storage: n × ~(8 + 4d) bytes, spilled past memory —
    # the standard iterative-ML working-set pattern, same as the repo's
    # quantile/mixture checkpoints)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
    )
    emb = _materialize_working_set(emb)
    n = emb.count()
    k = int(max(SEMDEDUP_K_MIN, min(SEMDEDUP_K_MAX, n // SEMDEDUP_CELL_TARGET)))
    train = emb.filter(F.col("vec_id") % SEMDEDUP_TRAIN_MOD == 0)
    init = train.orderBy("vec_id").limit(k).collect()
    cents = [[float(v) for v in r.embedding] for r in init]
    if not cents:
        return spark.createDataFrame([], "vec_id long, cell int, keep int")
    if len(cents) <= 128:
        # round-11 (guide §2.4/§5): the Lloyd rounds + final assignment run
        # as ONE lazy plan — 3 driver-synchronized jobs (2 Lloyd collects +
        # the final action) fuse into one action; arithmetic unchanged.
        cents_row = _cents_row(lazy_lloyd_cents(train, cents))
        assigned = lazy_assign(emb, cents_row, out_col="cell")
    else:
        # large-k path: per-round BLAS GEMM assignment (Arrow) — the
        # k·d work per row is real here and the driver loop stays
        for _ in range(SEMDEDUP_ROUNDS):
            cents = _rounded_update(assign_clusters_blas(train, cents), cents)
        assigned = assign_clusters_blas(emb, cents).withColumnRenamed(
            "cluster", "cell"
        )
    # precompute double vec + norm once (the q_semantic_dedup trick): each
    # O(n·CELL_TARGET) pair comparison is then pure codegen arithmetic
    assigned = (
        assigned.select(
            "vec_id",
            "cell",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dvec"),
        )
        .withColumn(
            "norm",
            F.expr(
                "sqrt(aggregate(zip_with(dvec, dvec, (x, y) -> x * y),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
            ),
        )
    )
    return semdedup_keep(assigned)


def semdedup_keep(
    assigned: DataFrame,
    *,
    cap: int = SEMDEDUP_CELL_CAP,
    threshold: float = SEMDEDUP_THRESHOLD,
    quality_col: str | None = None,
) -> DataFrame:
    """(vec_id, cell, keep) from an assigned frame carrying precomputed
    ``dvec`` (double vector) and ``norm`` columns.

    Within-cell dedup with a realized-cell-size guard: the cell count is a
    window over the SAME cell shuffle the self-join needs (exchange
    reuse), and ``b.n_in_cell <= cap`` gates pair generation —
    ``a.cell == b.cell`` means the guard covers both sides.  Members of
    over-full cells fall through the LEFT join with no match and keep = 1,
    so a degenerate quantizer cell bounds work instead of going quadratic.

    Keep policy (round 10, VERDICT r09 #6): by default the representative
    of an ε-ball is the LOWEST-id member (id-deterministic, the original
    SemDeDup-style rule).  With ``quality_col`` set, a member is dropped
    when a ≥threshold neighbour has strictly HIGHER quality (tie-break
    lowest vec_id) — the FineWeb-style quality-aware selection: within
    every connected ε-component the top-quality member is a local maximum
    of the priority order, so it is always kept.  NULL quality sorts
    lowest (a scoreless member never displaces a scored one).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("cell")
    sized = assigned.withColumn("n_in_cell", F.count(F.lit(1)).over(w))
    a, b = sized.alias("a"), sized.alias("b")
    pair_dot = F.expr(
        " + ".join(f"(a.dvec[{i}] * b.dvec[{i}])" for i in range(_SEMDEDUP_DIMS))
    )
    cos = roundn(pair_dot / (F.col("a.norm") * F.col("b.norm")), 6)
    if quality_col is None:
        beats = F.col("a.vec_id") < F.col("b.vec_id")
    else:
        aq = F.coalesce(F.col(f"a.{quality_col}"), F.lit(-1.0))
        bq = F.coalesce(F.col(f"b.{quality_col}"), F.lit(-1.0))
        beats = (aq > bq) | ((aq == bq) & (F.col("a.vec_id") < F.col("b.vec_id")))
    group_cols = [F.col("b.vec_id").alias("vec_id"), F.col("b.cell").alias("cell")]
    if quality_col is not None:
        group_cols.append(F.col(f"b.{quality_col}").alias(quality_col))
    return (
        b.join(
            a,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id"))
            & beats
            & (F.col("b.n_in_cell") <= F.lit(int(cap)))
            & (cos >= F.lit(threshold)),
            "left",
        )
        .groupBy(*group_cols)
        .agg(
            F.max(
                F.when(F.col("a.vec_id").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("keep")
        )
    )


def _semdedup_scaled_sql() -> str:
    """Oracle: unrolled Lloyd rounds (the Q_KMEANS_SQL CTE technique) with
    k computed from COUNT(*), then the sized/capped pair join."""
    dist = (
        "list_sum(list_transform(range(1, len({v}) + 1),"
        " i -> (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])"
        " * (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])))"
    )

    def assign_cte(name: str, src: str, cents: str) -> str:
        d = dist.format(v=f"{src}.embedding", c=cents)
        return f"""{name} AS (
  SELECT vec_id, embedding, c AS cell FROM (
    SELECT {src}.vec_id, {src}.embedding, {cents}.c,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {d} ASC, {cents}.c ASC) AS rn
    FROM {src}, {cents}
  ) WHERE rn = 1
)"""

    def update_cte(name: str, assigned: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT p.c,
         COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cell AS c,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT cell, dim,
             FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT cell,
               UNNEST(range(1, len(embedding) + 1)) AS dim,
               UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        FROM {assigned}
      )
      GROUP BY cell, dim
    )
    GROUP BY cell
  ) u ON u.c = p.c
)"""

    ctes = [
        # round-8 NULL-payload policy: semantic dedup covers non-NULL vectors
        "embnn AS (SELECT vec_id, embedding FROM embeddings"
        " WHERE embedding IS NOT NULL)",
        f"""kk AS (
  SELECT GREATEST({SEMDEDUP_K_MIN},
                  LEAST({SEMDEDUP_K_MAX}, COUNT(*) // {SEMDEDUP_CELL_TARGET})) AS k
  FROM embnn
)""",
        f"""train AS (
  SELECT vec_id, embedding FROM embnn
  WHERE vec_id % {SEMDEDUP_TRAIN_MOD} = 0
)""",
        """c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM train
  QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k FROM kk)
)""",
    ]
    prev = "c0"
    for r in range(SEMDEDUP_ROUNDS):
        ctes.append(assign_cte(f"a{r}", "train", prev))
        ctes.append(update_cte(f"c{r + 1}", f"a{r}", prev))
        prev = f"c{r + 1}"
    ctes.append(assign_cte("afinal", "embnn", prev))
    ctes.extend(
        [
            """assigned AS (
  SELECT vec_id, cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
         SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS norm
  FROM afinal
)""",
            """sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY cell) AS n_in_cell FROM assigned
)""",
        ]
    )
    joined = ",\n".join(ctes)
    return f"""WITH {joined},
drops AS (
  SELECT DISTINCT b.vec_id
  FROM sized a JOIN sized b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
   AND b.n_in_cell <= {SEMDEDUP_CELL_CAP}
  WHERE FLOOR(({_sql_dot("a.dvec", "b.dvec")}
               / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
        >= {SEMDEDUP_THRESHOLD}
)
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id
"""


Q_SEMANTIC_DEDUP_SQL = _semdedup_scaled_sql()

# backward-compat aliases for the pre-round-4 names
q_semantic_dedup_scaled = q_semantic_dedup
Q_SEMANTIC_DEDUP_SCALED_SQL = Q_SEMANTIC_DEDUP_SQL


# ---------------------------------------------------------------------------
# Quality-aware SemDeDup (round 10, VERDICT r09 #6): same scale-true k ∝ n
# pipeline, but the ε-ball representative is selected by QUALITY, not by
# lowest id — the FineWeb-style policy (keep the best member of a near-dup
# group; SemDeDup §3 keeps by similarity-to-centroid, production pipelines
# keep by quality signal).  The score is the shared ``quality_cols()``
# heuristic from plans/text.py — the SAME formula as q_doc_quality and
# q_weighted_sample, joined from the documents table on vec_id = doc_id
# (the shared synthetic corpus aligns the two ids; a vector without a doc
# gets NULL quality, which sorts LOWEST — a scoreless member never
# displaces a scored one; ties break to the lowest vec_id, so the policy
# stays fully deterministic).
#
# Scale shape: identical to q_semantic_dedup plus ONE id-keyed join of two
# co-sized tables (shuffle-join on the key both tables are naturally
# bucketed by at 100 TB; AQE broadcasts the dim at small sf).  The pair
# stage is unchanged — banded by cell, capped by realized cell size.
#
# Property (tested in test_similarity.py): within every connected
# ε-component of a cell, the max-quality member is a maximum of the
# priority order, so it is ALWAYS kept.
# ---------------------------------------------------------------------------


def q_semantic_dedup_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.kmeans import assign_clusters_blas
    from ubparquet_spark.plans.text import quality_cols

    docs_q = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"),
        quality_cols()["quality"].alias("quality"),
    )
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
        .join(docs_q, "vec_id", "left")
    )
    emb = _materialize_working_set(emb)
    n = emb.count()
    k = int(max(SEMDEDUP_K_MIN, min(SEMDEDUP_K_MAX, n // SEMDEDUP_CELL_TARGET)))
    train = emb.select("vec_id", "embedding").filter(
        F.col("vec_id") % SEMDEDUP_TRAIN_MOD == 0
    )
    init = train.orderBy("vec_id").limit(k).collect()
    cents = [[float(v) for v in r.embedding] for r in init]
    if not cents:
        return spark.createDataFrame(
            [], "vec_id long, cell int, quality double, keep int"
        )
    if len(cents) <= 128:
        # round-11: lazy in-plan Lloyd + assignment (see q_semantic_dedup)
        cents_row = _cents_row(lazy_lloyd_cents(train, cents))
        assigned = lazy_assign(emb, cents_row, out_col="cell")
    else:
        for _ in range(SEMDEDUP_ROUNDS):
            cents = _rounded_update(assign_clusters_blas(train, cents), cents)
        assigned = assign_clusters_blas(emb, cents).withColumnRenamed(
            "cluster", "cell"
        )
    assigned = (
        assigned.select(
            "vec_id",
            "cell",
            "quality",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dvec"),
        )
        .withColumn(
            "norm",
            F.expr(
                "sqrt(aggregate(zip_with(dvec, dvec, (x, y) -> x * y),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
            ),
        )
    )
    return semdedup_keep(assigned, quality_col="quality")


def _semdedup_quality_sql() -> str:
    """Oracle: the Q_SEMANTIC_DEDUP_SQL CTE chain with the quality join and
    the quality-priority drop condition."""
    from ubparquet_spark.plans.text import STOPWORDS, _sql_quality

    base = _semdedup_scaled_sql()
    # splice: reuse everything up to (and including) the `sized` CTE, then
    # swap in the quality-joined frame + priority rule
    head, _sep, _tail = base.partition(",\ndrops AS (")
    assert _sep, "Q_SEMANTIC_DEDUP_SQL shape changed; update the splice"
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    aq = "COALESCE(a.quality, -1.0)"
    bq = "COALESCE(b.quality, -1.0)"
    return f"""{head},
qual AS (
  SELECT doc_id AS vec_id, {_sql_quality("n_stop", "n_tokens")} AS quality
  FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               x -> x IN ({stop_list}))) AS n_stop
    FROM documents
  )
),
sizedq AS (
  SELECT s.*, q.quality
  FROM sized s LEFT JOIN qual q ON s.vec_id = q.vec_id
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM sizedq a JOIN sizedq b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id
   AND ({aq} > {bq} OR ({aq} = {bq} AND a.vec_id < b.vec_id))
   AND b.n_in_cell <= {SEMDEDUP_CELL_CAP}
  WHERE FLOOR(({_sql_dot("a.dvec", "b.dvec")}
               / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
        >= {SEMDEDUP_THRESHOLD}
)
SELECT s.vec_id, s.cell, s.quality,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM sizedq s LEFT JOIN drops d ON s.vec_id = d.vec_id
"""


Q_SEMANTIC_DEDUP_QUALITY_SQL = _semdedup_quality_sql()


# ---------------------------------------------------------------------------
# Incremental SemDeDup (round 11, VERDICT r10 "What's missing" #2 /
# "Next round" #4): the continuously-ingesting pipeline's semantic-dedup
# decision — a NEW batch of vectors arrives against an already-deduped
# corpus, assigns to the corpus's FROZEN centroids, and ε-balls only
# against existing members of its cells. Semantics and scale notes in
# functions/incremental.py (incremental_semdedup); this registration
# stands the mod-10 split in for "existing corpus" vs "incoming batch"
# (the q_incremental_dedup convention) and trains the frozen quantizer on
# the CORPUS side with the exact q_semantic_dedup recipe (k ∝ n_corpus,
# mod-5 train sample, SEMDEDUP_ROUNDS Lloyd rounds, 1e-6 rounded
# centroid updates).
#
# Scale shape: the corpus cell index is ONE corpus assignment pass
# (pre-computable, bucketed-by-cell at 100 TB); the batch pays its own
# assignment (narrow map over broadcast-size centroid literals) + a
# cell-keyed equi-join whose corpus side is capped at SEMDEDUP_CELL_CAP
# members per cell + an embedding-equality semi-join for exact dups.
# Never all-pairs; nothing grows with the corpus except the cacheable
# index.
#
# The oracle unrolls the SAME corpus-side Lloyd rounds as chained CTEs
# (the Q_KMEANS_SQL technique), then mirrors the capped cell join and the
# list-equality exact check.
# ---------------------------------------------------------------------------

INCR_SEM_MOD = 10
INCR_SEM_REM = 7


def q_incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.functions.incremental import incremental_semdedup
    from ubparquet_spark.operators.kmeans import assign_clusters_blas

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
    )
    emb = _materialize_working_set(emb)
    incoming = emb.filter(F.col("vec_id") % INCR_SEM_MOD == INCR_SEM_REM)
    corpus = emb.filter(F.col("vec_id") % INCR_SEM_MOD != INCR_SEM_REM)
    # frozen quantizer: trained on the CORPUS only, q_semantic_dedup recipe
    n = corpus.count()
    k = int(max(SEMDEDUP_K_MIN, min(SEMDEDUP_K_MAX, n // SEMDEDUP_CELL_TARGET)))
    train = corpus.filter(F.col("vec_id") % SEMDEDUP_TRAIN_MOD == 0)
    init = train.orderBy("vec_id").limit(k).collect()
    cents = [[float(v) for v in r.embedding] for r in init]
    if not cents:
        return spark.createDataFrame(
            [],
            "vec_id long, cell int, verdict string, n_matches long,"
            " best_match long",
        )
    if len(cents) <= 128:
        # round-11: lazy in-plan Lloyd (see q_semantic_dedup) — training
        # and both frozen assignments fuse into the consumer's one action.
        # The 1-row centroid artifact is lazily checkpointed because BOTH
        # frozen assignments (batch + corpus index) reference it: without
        # the checkpoint the whole training chain is inlined twice into
        # the plan (planned and staged twice even when the broadcast is
        # reused). Measured ABAB at sf0.1: 5.49/4.79 → 4.40/4.65 s.
        cents_row = _cents_row(lazy_lloyd_cents(train, cents)).localCheckpoint(
            eager=False
        )
        return incremental_semdedup(
            incoming, corpus, None, centroids_row=cents_row
        )
    for _ in range(SEMDEDUP_ROUNDS):
        cents = _rounded_update(assign_clusters_blas(train, cents), cents)
    return incremental_semdedup(incoming, corpus, cents)


def _incremental_semdedup_sql() -> str:
    """Oracle: corpus-side unrolled Lloyd rounds, frozen assignment of
    both sides, capped cell join + list-equality exact check."""
    dist = (
        "list_sum(list_transform(range(1, len({v}) + 1),"
        " i -> (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])"
        " * (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])))"
    )

    def assign_cte(name: str, src: str, cents: str) -> str:
        d = dist.format(v=f"{src}.embedding", c=cents)
        return f"""{name} AS (
  SELECT vec_id, embedding, c AS cell FROM (
    SELECT {src}.vec_id, {src}.embedding, {cents}.c,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {d} ASC, {cents}.c ASC) AS rn
    FROM {src}, {cents}
  ) WHERE rn = 1
)"""

    def update_cte(name: str, assigned: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT p.c,
         COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cell AS c,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT cell, dim,
             FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT cell,
               UNNEST(range(1, len(embedding) + 1)) AS dim,
               UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        FROM {assigned}
      )
      GROUP BY cell, dim
    )
    GROUP BY cell
  ) u ON u.c = p.c
)"""

    inc = f"vec_id % {INCR_SEM_MOD} = {INCR_SEM_REM}"
    ctes = [
        "embnn AS (SELECT vec_id, embedding FROM embeddings"
        " WHERE embedding IS NOT NULL)",
        f"inco AS (SELECT * FROM embnn WHERE {inc})",
        f"corp AS (SELECT * FROM embnn WHERE NOT ({inc}))",
        f"""kk AS (
  SELECT GREATEST({SEMDEDUP_K_MIN},
                  LEAST({SEMDEDUP_K_MAX}, COUNT(*) // {SEMDEDUP_CELL_TARGET})) AS k
  FROM corp
)""",
        f"""train AS (
  SELECT vec_id, embedding FROM corp
  WHERE vec_id % {SEMDEDUP_TRAIN_MOD} = 0
)""",
        """c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM train
  QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k FROM kk)
)""",
    ]
    prev = "c0"
    for r in range(SEMDEDUP_ROUNDS):
        ctes.append(assign_cte(f"a{r}", "train", prev))
        ctes.append(update_cte(f"c{r + 1}", f"a{r}", prev))
        prev = f"c{r + 1}"
    ctes.append(assign_cte("acorp", "corp", prev))
    ctes.append(assign_cte("ainc", "inco", prev))
    for side in ("acorp", "ainc"):
        ctes.append(
            f"""{side}d AS (
  SELECT vec_id, cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
         SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS norm
  FROM {side}
)"""
        )
    ctes.append(
        f"""corpok AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY cell) AS n_in_cell FROM acorpd
  ) WHERE n_in_cell <= {SEMDEDUP_CELL_CAP}
)"""
    )
    joined = ",\n".join(ctes)
    return f"""WITH {joined},
near AS (
  SELECT a.vec_id, COUNT(*) AS n_matches, MIN(b.vec_id) AS best_match
  FROM aincd a JOIN corpok b ON a.cell = b.cell
  WHERE FLOOR(({_sql_dot("a.dvec", "b.dvec")}
               / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
        >= {SEMDEDUP_THRESHOLD}
  GROUP BY a.vec_id
),
ex AS (
  SELECT DISTINCT i.vec_id
  FROM inco i
  WHERE EXISTS (SELECT 1 FROM corp c WHERE c.embedding = i.embedding)
)
SELECT s.vec_id, s.cell,
       CASE WHEN ex.vec_id IS NOT NULL THEN 'exact_dup'
            WHEN near.n_matches > 0 THEN 'near_dup'
            ELSE 'new' END AS verdict,
       CAST(COALESCE(near.n_matches, 0) AS BIGINT) AS n_matches,
       near.best_match
FROM ainc s
LEFT JOIN near ON near.vec_id = s.vec_id
LEFT JOIN ex ON ex.vec_id = s.vec_id
"""


Q_INCREMENTAL_SEMDEDUP_SQL = _incremental_semdedup_sql()


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection 64-d -> 8-d (Achlioptas 2001
# database-friendly ±1 form): the standard dimensionality-reduction
# preprocessing for ANN / clustering at scale — distances are preserved to
# (1±ε) while the per-vector footprint drops 8×, which at 100 TB is the
# difference between an index that fits the page cache and one that doesn't.
#
# The projection matrix is data-independent and deterministic: sign(i, j)
# is derived from md5 of the (i, j) pair at module import and baked into
# the plan as literals, so Spark and DuckDB evaluate the identical matrix
# with no RNG state and no broadcast (64×8 int literals travel inside the
# plan). Per-element products are cast to double; summation order differs
# between Spark's left-fold and DuckDB's list_sum, so outputs round to 6
# decimals like every other vector query here.
#
# Scale shape: a pure per-row map — ZERO shuffles, full whole-stage
# codegen, pipelined with the scan. The scan reads only (vec_id, embedding).
# ---------------------------------------------------------------------------

JL_OUT_DIMS = 8
JL_IN_DIMS = 64


def _jl_sign(i: int, j: int) -> int:
    import hashlib

    h = hashlib.md5(f"jl-{i}-{j}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1


_JL_SIGNS = [
    [_jl_sign(i, j) for i in range(JL_IN_DIMS)] for j in range(JL_OUT_DIMS)
]


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for j in range(JL_OUT_DIMS):
        signs = ", ".join(f"CAST({s} AS DOUBLE)" for s in _JL_SIGNS[j])
        proj = F.expr(
            f"aggregate(zip_with(embedding, array({signs}),"
            " (x, s) -> CAST(x AS DOUBLE) * s),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        cols.append(roundn(proj, 6).alias(f"p{j}"))
    return emb.select(*cols)


def _jl_sql_proj(j: int) -> str:
    signs = ", ".join(f"CAST({s} AS DOUBLE)" for s in _JL_SIGNS[j])
    return sql_roundn(
        f"list_sum(list_transform(range(1, {JL_IN_DIMS} + 1),"
        f" i -> CAST(embedding[i] AS DOUBLE) * ([{signs}])[i]))",
        6,
    )


Q_JL_PROJECTION_SQL = "SELECT vec_id, " + ", ".join(
    f"{_jl_sql_proj(j)} AS p{j}" for j in range(JL_OUT_DIMS)
) + " FROM embeddings"


# ---------------------------------------------------------------------------
# Two-level SemDeDup: the hierarchical-quantizer form of
# q_semantic_dedup_scaled (operators/kmeans.py two-level trainer, FAISS
# IMI practice). k = k1·k2 splits into a coarse level and a per-cell
# refinement, so per-row assignment touches k1 + k2 = O(√k) candidates
# instead of k.
#
# Measured honestly (BENCHNOTES round 3): at every locally reachable scale
# the one-level BLAS GEMM wins — 50k rows × d=64 × k=4096 assigns in
# 0.26 s, and the two-level's second Arrow pass costs more than the flops
# it saves (0.32 s). 10× stress: 3.26× (two-level) vs 3.39× (one-level),
# i.e. a wash. What the two-level actually buys at 100 TB is the
# QUANTIZER ARTIFACT SIZE: one-level k tracks the corpus past the 4096
# clamp (k ≈ 10⁵-10⁶ cells at 10⁹-10¹¹ vectors), and a k×d centroid
# matrix at k=10⁶, d=1024 is ~8 GB broadcast to every executor — while
# the two-level ships k1 + k2 ≈ 2√k centroids (~16 MB) and still
# addresses k1·k2 cells. That, not GEMM flops, is why IVF systems go
# hierarchical; the local bench cannot exhibit it and this comment says
# so instead of claiming a fake win.
#
# k1 = ⌊√k_eff⌋, k2 = ⌈k_eff/k1⌉ with the same clamp as the scaled form.
# Level-1 trains SEMDEDUP_ROUNDS rounded Lloyd rounds on the mod-sample;
# level-2 seeds each cell with its k2 lowest-id sample members (cells the
# sample misses carry their own level-1 centroid) and runs ONE rounded
# refinement round. All updates round to 6 dp so cross-engine argmin is
# order-proof; the oracle unrolls BOTH levels as CTEs — seeds via a
# QUALIFY rank, per-cell argmin via a join on the cell id.
# ---------------------------------------------------------------------------


def _two_level_ks(n: int) -> tuple[int, int, int]:
    import math

    k_eff = int(
        max(SEMDEDUP_K_MIN, min(SEMDEDUP_K_MAX, n // SEMDEDUP_CELL_TARGET))
    )
    k1 = max(2, int(math.floor(math.sqrt(k_eff))))
    k2 = (k_eff + k1 - 1) // k1
    return k1, k2, k_eff


def _rounded_sub_update(
    assigned2: DataFrame, prev: list[list[list[float]]]
) -> list[list[list[float]]]:
    """Per-(cell, sub) mean, rounded 6 dp; empty sub-cells keep ``prev``."""
    rows = (
        assigned2.select(
            "cluster", "sub", F.posexplode("embedding").alias("dim", "v")
        )
        .groupBy("cluster", "sub", "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("m"))
        .groupBy("cluster", "sub")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("centroid")
        )
        .collect()
    )
    updated = {(r.cluster, r.sub): list(r.centroid) for r in rows}
    return [
        [updated.get((c, s), prev[c][s]) for s in range(len(prev[c]))]
        for c in range(len(prev))
    ]


def q_semantic_dedup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ubparquet_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_blas,
        assign_subclusters,
        assign_subclusters_blas,
    )

    # round-8 NULL-payload policy: NULL embeddings excluded at the scan
    # in BOTH engines; round-9 checkpoint-once working set (see
    # q_semantic_dedup — this plan re-reads emb even more times: count,
    # 2 Lloyd rounds, level-2 seeding, sub-update, final 2-level assign)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
    )
    emb = _materialize_working_set(emb)
    n = emb.count()
    k1, k2, k_eff = _two_level_ks(n)
    # same dispatch boundary as the one-level scaled form: past 128
    # effective cells the interpreted folds dominate and the Arrow/BLAS
    # paths take over (at driver-oracle scale k_eff = 8, so the fold runs
    # and distance arithmetic stays bit-identical to the SQL CTEs).
    # Dispatch on k_eff, not k1·k2: the ceil in k2 can push k1·k2 up to
    # k1-1 past k_eff, which would flip to BLAS inside the promised
    # fold-parity range.
    # round-11 A/B note: a fully-lazy two-level chain (both levels trained
    # and assigned in one action, the oracle's CTE shape) was MEASURED
    # SLOWER (6.2 s → 9.7 s best-of-3 at sf0.1, 18 → 35 jobs): the two
    # levels reference the level-1 chain from five subtrees, and the
    # resulting broadcast/AQE stage fan-out outweighs the removed driver
    # collects. The driver loop (bounded k_eff-row artifacts per collect)
    # stays; the one-level family DID win from the lazy chain and uses it.
    if k_eff > 128:
        assign1, assign2 = assign_clusters_blas, assign_subclusters_blas
    else:
        assign1, assign2 = assign_clusters, assign_subclusters
    train = emb.filter(F.col("vec_id") % SEMDEDUP_TRAIN_MOD == 0)
    init = train.orderBy("vec_id").limit(k1).collect()
    cents1 = [[float(v) for v in r.embedding] for r in init]
    if not cents1:
        return spark.createDataFrame([], "vec_id long, cell int, keep int")
    for _ in range(SEMDEDUP_ROUNDS):
        cents1 = _rounded_update(assign1(train, cents1), cents1)
    a1t = assign1(train, cents1)
    # level-2 seeds: the k2 lowest-id sample members per cell (bounded
    # collect: ≤ k1·k2 = k_eff rows, the quantizer artifact)
    w = Window.partitionBy("cluster").orderBy(F.col("vec_id").asc())
    seed_rows = (
        a1t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k2)
        .select("cluster", "_rn", "embedding")
        .collect()
    )
    c2: list[list[list[float]]] = [[] for _ in cents1]
    for r in sorted(seed_rows, key=lambda r: (r["cluster"], r["_rn"])):
        c2[r["cluster"]].append([float(v) for v in r["embedding"]])
    for cell in range(len(c2)):
        if not c2[cell]:
            c2[cell] = [list(cents1[cell])]
    c2 = _rounded_sub_update(assign2(a1t, c2), c2)
    width = max(len(cell) for cell in c2)
    a2 = assign2(assign1(emb, cents1), c2)
    assigned = (
        a2.select(
            "vec_id",
            (F.col("cluster") * width + F.col("sub")).alias("cell"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dvec"),
        )
        .withColumn(
            "norm",
            F.expr(
                "sqrt(aggregate(zip_with(dvec, dvec, (x, y) -> x * y),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
            ),
        )
    )
    return semdedup_keep(assigned)


def _semdedup_2level_sql() -> str:
    dist = (
        "list_sum(list_transform(range(1, len({v}) + 1),"
        " i -> (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])"
        " * (CAST({v}[i] AS DOUBLE) - {c}.cvec[i])))"
    )

    def assign_cte(name: str, src: str, cents: str) -> str:
        d = dist.format(v=f"{src}.embedding", c=cents)
        return f"""{name} AS (
  SELECT vec_id, embedding, c AS cell FROM (
    SELECT {src}.vec_id, {src}.embedding, {cents}.c,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {d} ASC, {cents}.c ASC) AS rn
    FROM {src}, {cents}
  ) WHERE rn = 1
)"""

    def update_cte(name: str, assigned: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT p.c,
         COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cell AS c,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT cell, dim,
             FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT cell,
               UNNEST(range(1, len(embedding) + 1)) AS dim,
               UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        FROM {assigned}
      )
      GROUP BY cell, dim
    )
    GROUP BY cell
  ) u ON u.c = p.c
)"""

    ctes = [
        # round-8 NULL-payload policy: semantic dedup covers non-NULL vectors
        "embnn AS (SELECT vec_id, embedding FROM embeddings"
        " WHERE embedding IS NOT NULL)",
        f"""kk AS (
  SELECT keff,
         k1,
         (keff + k1 - 1) // k1 AS k2
  FROM (
    SELECT keff, GREATEST(2, CAST(FLOOR(SQRT(keff)) AS BIGINT)) AS k1
    FROM (
      SELECT GREATEST({SEMDEDUP_K_MIN},
                      LEAST({SEMDEDUP_K_MAX}, COUNT(*) // {SEMDEDUP_CELL_TARGET})) AS keff
      FROM embnn
    )
  )
)""",
        f"""train AS (
  SELECT vec_id, embedding FROM embnn
  WHERE vec_id % {SEMDEDUP_TRAIN_MOD} = 0
)""",
        """c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM train
  QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k1 FROM kk)
)""",
    ]
    prev = "c0"
    for r in range(SEMDEDUP_ROUNDS):
        ctes.append(assign_cte(f"a{r}", "train", prev))
        ctes.append(update_cte(f"c{r + 1}", f"a{r}", prev))
        prev = f"c{r + 1}"
    l1 = prev
    # level-2 seeds from the sample's FINAL level-1 assignment
    ctes.append(assign_cte("at", "train", l1))
    ctes.append(f"""s0 AS (
  SELECT cell AS c,
         row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS sub,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM at
  QUALIFY row_number() OVER (PARTITION BY cell ORDER BY vec_id)
          <= (SELECT k2 FROM kk)
)""")
    ctes.append(f"""seeds AS (
  SELECT * FROM s0
  UNION ALL
  SELECT p.c, 0 AS sub, p.cvec FROM {l1} p
  WHERE p.c NOT IN (SELECT DISTINCT c FROM s0)
)""")
    # one rounded level-2 refinement round: per-cell argmin (join on cell),
    # then per-(cell, sub) rounded mean with empties keeping the seed
    d2 = dist.format(v="at.embedding", c="seeds")
    ctes.append(f"""b0 AS (
  SELECT vec_id, cell, embedding, sub FROM (
    SELECT at.vec_id, at.cell, at.embedding, seeds.sub,
           row_number() OVER (PARTITION BY at.vec_id
                              ORDER BY {d2} ASC, seeds.sub ASC) AS rn
    FROM at JOIN seeds ON seeds.c = at.cell
  ) WHERE rn = 1
)""")
    ctes.append("""subc AS (
  SELECT p.c, p.sub, COALESCE(u.cvec, p.cvec) AS cvec
  FROM seeds p LEFT JOIN (
    SELECT cell AS c, sub,
           list_transform(
             list_sort(list(struct_pack(dim := dim, m := m))), s -> s.m) AS cvec
    FROM (
      SELECT cell, sub, dim,
             FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
      FROM (
        SELECT cell, sub,
               UNNEST(range(1, len(embedding) + 1)) AS dim,
               UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        FROM b0
      )
      GROUP BY cell, sub, dim
    )
    GROUP BY cell, sub
  ) u ON u.c = p.c AND u.sub = p.sub
)""")
    ctes.append("""wd AS (
  SELECT MAX(cnt) AS w FROM (SELECT c, COUNT(*) AS cnt FROM subc GROUP BY c)
)""")
    ctes.append(assign_cte("afin", "embnn", l1))
    dfin = dist.format(v="afin.embedding", c="subc")
    ctes.append(f"""bfin AS (
  SELECT vec_id, cell, embedding, sub FROM (
    SELECT afin.vec_id, afin.cell, afin.embedding, subc.sub,
           row_number() OVER (PARTITION BY afin.vec_id
                              ORDER BY {dfin} ASC, subc.sub ASC) AS rn
    FROM afin JOIN subc ON subc.c = afin.cell
  ) WHERE rn = 1
)""")
    ctes.append("""assigned AS (
  SELECT vec_id,
         CAST(cell * (SELECT w FROM wd) + sub AS INT) AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
         SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS norm
  FROM bfin
)""")
    ctes.append("""sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY cell) AS n_in_cell FROM assigned
)""")
    joined = ",\n".join(ctes)
    return f"""WITH {joined},
drops AS (
  SELECT DISTINCT b.vec_id
  FROM sized a JOIN sized b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
   AND b.n_in_cell <= {SEMDEDUP_CELL_CAP}
  WHERE FLOOR(({_sql_dot("a.dvec", "b.dvec")}
               / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
        >= {SEMDEDUP_THRESHOLD}
)
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id
"""


Q_SEMANTIC_DEDUP_2LEVEL_SQL = _semdedup_2level_sql()




# ---------------------------------------------------------------------------
# Centroid drift: per label, the L2 distance between the centroid of the
# even-vec_id half and the odd-vec_id half — the train/serve embedding-
# drift monitor an ML platform runs per model version. Corpus cost is one
# (label, parity, dim) partial-aggregatable shuffle; the join + distance
# run over the label-sized centroid tables. Centroids are rounded to 6dp
# BEFORE the distance (both engines then square identical doubles), and
# the Spark fold + DuckDB list_sum sum dims in the same index order.
# ---------------------------------------------------------------------------

def q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    halves = (
        emb.select(
            "label",
            (F.col("vec_id") % 2).alias("par"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .groupBy("label", "par", "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy("label", "par")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)"
            ).alias("cvec"),
        )
    )
    counts = emb.groupBy("label").agg(
        F.sum(F.expr("CAST(vec_id % 2 = 0 AS INT)")).alias("n_even"),
        F.sum(F.expr("CAST(vec_id % 2 = 1 AS INT)")).alias("n_odd"),
    )
    ev = halves.filter(F.col("par") == 0).select("label", F.col("cvec").alias("ce"))
    od = halves.filter(F.col("par") == 1).select("label", F.col("cvec").alias("co"))
    drift = F.sqrt(
        F.expr(
            "aggregate(zip_with(ce, co, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )
    return (
        ev.join(od, "label")
        .join(counts, "label")
        .select("label", "n_even", "n_odd", roundn(drift, 6).alias("drift"))
    )


Q_CENTROID_DRIFT_SQL = """
WITH e AS (
  SELECT label, vec_id % 2 AS par,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
), cent AS (
  SELECT label, par, dim,
         FLOOR(AVG(CAST(v AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS cv
  FROM e GROUP BY label, par, dim
), carr AS (
  SELECT label, par, list(cv ORDER BY dim) AS cvec FROM cent GROUP BY label, par
), counts AS (
  SELECT label,
         CAST(SUM(CAST(vec_id % 2 = 0 AS INT)) AS BIGINT) AS n_even,
         CAST(SUM(CAST(vec_id % 2 = 1 AS INT)) AS BIGINT) AS n_odd
  FROM embeddings GROUP BY label
)
SELECT a.label, counts.n_even, counts.n_odd,
       FLOOR(SQRT(list_sum(list_transform(range(1, len(a.cvec) + 1),
             i -> (a.cvec[i] - b.cvec[i]) * (a.cvec[i] - b.cvec[i]))))
             * 1000000 + 0.5) / 1000000 AS drift
FROM carr a
JOIN carr b ON a.label = b.label AND a.par = 0 AND b.par = 1
JOIN counts ON counts.label = a.label
"""


# ---------------------------------------------------------------------------
# Embedding outliers: distance of every vector to its label centroid,
# flagged past mean + 2σ — the mislabeled/corrupt-vector audit run before
# training. Scale shape: centroid and distance-stat aggregations are both
# partial-aggregatable label-keyed shuffles; the stats join back as a
# label-sized broadcast. Distances quantize to exact integer micro-units
# so Σd and Σd² are order-independent and both engines derive bit-equal
# thresholds.
# ---------------------------------------------------------------------------

OUTLIER_SIGMA = 2.0


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(roundn(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)"
            ).alias("cvec")
        )
    )
    dist = F.sqrt(
        F.expr(
            "aggregate(zip_with(embedding, cvec, (x, y) ->"
            " (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )
    d6 = F.expr("CAST(floor(_dist * 1000000 + 0.5) AS BIGINT)")
    dists = (
        emb.join(F.broadcast(cents), "label")
        .select("label", dist.alias("_dist"))
        .select("label", d6.alias("d6"))
    )
    stats = dists.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("d6").alias("sd"),
        # decimal(38,0) accumulation: d6 can reach ~1.6e7, so a BIGINT
        # Σd6² wraps silently past a few 1e4 vectors/label in non-ANSI
        # mode while the oracle's SUM(HUGEINT) widens — cast BEFORE the
        # square, as q_twap/q_winsorized_prices do
        F.sum(F.col("d6").cast("decimal(38,0)") * F.col("d6")).alias("sdd"),
        F.max("d6").alias("maxd"),
    )
    mean = F.col("sd").cast("double") / F.col("n_vecs")
    # greatest(·, 0): an all-equal-distance label would otherwise produce
    # var = -ε from the double mean², and sqrt(-ε) = NaN in both engines
    var = F.greatest(
        F.col("sdd").cast("double") / F.col("n_vecs") - mean * mean,
        F.lit(0.0),
    )
    thr = mean + OUTLIER_SIGMA * F.sqrt(var)
    return (
        dists.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            roundn(F.max(mean) / 1000000.0, 6).alias("avg_dist"),
            roundn(F.max(F.sqrt(var)) / 1000000.0, 6).alias("std_dist"),
            F.sum(F.when(F.col("d6") > thr, 1).otherwise(0)).alias("n_outliers"),
            (F.max("maxd") / 1000000.0).alias("max_dist"),
        )
    )


Q_EMBEDDING_OUTLIERS_SQL = f"""
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
), cent AS (
  SELECT label, dim,
         FLOOR(AVG(CAST(v AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS cv
  FROM e GROUP BY label, dim
), carr AS (
  SELECT label, list(cv ORDER BY dim) AS cvec FROM cent GROUP BY label
), dists AS (
  SELECT emb.label,
         CAST(FLOOR(SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> (CAST(embedding[i] AS DOUBLE) - cvec[i])
                   * (CAST(embedding[i] AS DOUBLE) - cvec[i]))))
              * 1000000 + 0.5) AS BIGINT) AS d6
  FROM embeddings emb JOIN carr ON carr.label = emb.label
), stats AS (
  SELECT label, COUNT(*) AS n_vecs, SUM(d6) AS sd,
         SUM(CAST(d6 AS HUGEINT) * d6) AS sdd, MAX(d6) AS maxd
  FROM dists GROUP BY label
)
SELECT d.label,
       MAX(n_vecs) AS n_vecs,
       {sql_roundn("MAX(CAST(sd AS DOUBLE) / n_vecs) / 1000000.0", 6)} AS avg_dist,
       {sql_roundn(
           "MAX(SQRT(GREATEST(CAST(sdd AS DOUBLE) / n_vecs"
           " - (CAST(sd AS DOUBLE) / n_vecs) * (CAST(sd AS DOUBLE) / n_vecs), 0)))"
           " / 1000000.0", 6)} AS std_dist,
       SUM(CASE WHEN d6 > CAST(sd AS DOUBLE) / n_vecs
                + {OUTLIER_SIGMA} * SQRT(GREATEST(CAST(sdd AS DOUBLE) / n_vecs
                  - (CAST(sd AS DOUBLE) / n_vecs) * (CAST(sd AS DOUBLE) / n_vecs), 0))
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       MAX(maxd) / 1000000.0 AS max_dist
FROM dists d JOIN stats USING (label)
GROUP BY d.label
"""


# ---------------------------------------------------------------------------
# Hard-negative mining — contrastive-training data prep (SimCSE/DPR-style):
# for each anchor, the most-similar vectors carrying a DIFFERENT label.
# "Hard" = near in embedding space, so candidates come from the anchor's
# multi-band sign-LSH buckets (the q_embedding_neardup machinery), never a
# full cross join: equi-join on (band, bucket), bucket cap against
# degenerate buckets, per-anchor top-k via a rank window whose filter
# pushes map-side (WindowGroupLimit). Anchors are gated scan-side by a
# deterministic mod so the mined set is a bounded, reproducible sample —
# the production shape mines per-shard anchors the same way.
# ---------------------------------------------------------------------------

HN_ANCHOR_MOD = 10
HN_K = 2


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label", _sq_norm("embedding").alias("_n2")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                _sign_bucket("embedding", NEARDUP_BAND_BITS, b * NEARDUP_BAND_BITS).alias(
                    "bucket"
                ),
            )
            for b in range(NEARDUP_BANDS)
        ]
    )
    e = emb.select(
        "vec_id", "embedding", "label", "_n2", F.explode(band_structs).alias("_b")
    ).select("vec_id", "embedding", "label", "_n2", "_b.band", "_b.bucket")
    # cap computed over the FULL bucket population (before the anchor
    # gate) on the same (band, bucket) shuffle the join reuses
    w = Window.partitionBy("band", "bucket")
    e = (
        e.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= NEARDUP_BUCKET_CAP)
        .drop("_n")
    )
    # shuffle_hash: anchors are n/HN_ANCHOR_MOD of the corpus — NOT
    # broadcast-safe at scale — and with both sides exchanged on
    # (band, bucket) the banding subplan is computed once and reused
    # (same technique as q_minhash_jaccard_est)
    a = e.filter(F.col("vec_id") % HN_ANCHOR_MOD == 0).alias("a")
    b = e.hint("shuffle_hash").alias("b")
    cos = roundn(
        _cosine_pre("a.embedding", "b.embedding", "a._n2", "b._n2"),
        6,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .select(
            F.col("a.vec_id").alias("anchor_id"),
            F.col("b.vec_id").alias("negative_id"),
            cos.alias("cosine"),
        )
        .distinct()  # a pair can agree in more than one band
    )
    rw = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= HN_K)
        .select("anchor_id", "negative_id", "cosine", "rank")
    )


Q_HARD_NEGATIVES_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, label FROM embeddings
), banded AS (
  SELECT vec_id, embedding, label, band, {_neardup_band_case("embedding")} AS bucket
  FROM e, range(0, {NEARDUP_BANDS}) t(band)
), ok AS (
  SELECT band, bucket FROM banded GROUP BY 1, 2
  HAVING COUNT(*) <= {NEARDUP_BUCKET_CAP}
), bx AS (
  SELECT banded.* FROM banded JOIN ok USING (band, bucket)
), pairs AS (
  SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS negative_id,
         FLOOR(({_sql_dot("a.embedding", "b.embedding")}
                / SQRT({_sql_dot("a.embedding", "a.embedding")} * {_sql_dot("b.embedding", "b.embedding")})) * 1000000 + 0.5) / 1000000 AS cosine
  FROM bx a JOIN bx b
    ON a.band = b.band AND a.bucket = b.bucket AND a.label != b.label
  WHERE a.vec_id % {HN_ANCHOR_MOD} = 0
), ranked AS (
  SELECT anchor_id, negative_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, negative_id ASC) AS rank
  FROM pairs
)
SELECT anchor_id, negative_id, cosine, rank FROM ranked WHERE rank <= {HN_K}
"""


# ---------------------------------------------------------------------------
# Per-DIMENSION embedding health audit — the pre-indexing check a vector
# pipeline runs before ANN/PQ training: a dead dimension (all zeros), a
# constant dimension (max==min), or one whose scale dwarfs the others
# silently degrades every downstream distance. Column grain, not row
# grain: posexplode to (dim, value), ONE dim-keyed shuffle with map-side
# partial aggregation (n·d rows collapse to d per mapper), zero joins.
# Values quantize to exact integer micro-units before any sum; the
# micro-unit sums accumulate in decimal(38,0)/HUGEINT (BIGINT would wrap
# near ~1e12 vectors — the q_twap/q_embedding_outliers rule), so every
# statistic is order-independent and bit-equal cross-engine.
# ---------------------------------------------------------------------------


def q_embedding_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select(
        "dim",
        F.expr(
            "CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("v6"),
    )
    n = F.count(F.lit(1))
    sv = F.sum(F.col("v6").cast("decimal(38,0)")).alias("sv")
    ss = F.sum(F.col("v6").cast("decimal(38,0)") * F.col("v6")).alias("ss")
    agg = ex.groupBy("dim").agg(
        n.alias("n_vecs"),
        sv,
        ss,
        F.min("v6").alias("mn6"),
        F.max("v6").alias("mx6"),
        F.sum(F.when(F.col("v6") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
    )
    mean = F.expr("CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE)")
    var = F.expr(
        "greatest(CAST(ss AS DOUBLE) / CAST(n_vecs AS DOUBLE)"
        " - (CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE))"
        " * (CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE)), CAST(0.0 AS DOUBLE))"
    )
    return agg.select(
        "dim",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        roundn(mean / 1000000.0, 6).alias("mean_v"),
        roundn(F.sqrt(var) / 1000000.0, 6).alias("std_v"),
        (F.col("mn6").cast("double") / 1000000.0).alias("min_v"),
        (F.col("mx6").cast("double") / 1000000.0).alias("max_v"),
        "n_zero",
        (F.col("mn6") == F.col("mx6")).alias("is_constant"),
    )


Q_EMBEDDING_DIM_AUDIT_SQL = f"""
WITH ex AS (
  SELECT UNNEST(range(1, len(embedding) + 1)) AS i, embedding FROM embeddings
), q AS (
  SELECT CAST(i - 1 AS INT) AS dim,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v6
  FROM ex
), agg AS (
  SELECT dim, COUNT(*) AS n_vecs,
         SUM(CAST(v6 AS HUGEINT)) AS sv,
         SUM(CAST(v6 AS HUGEINT) * v6) AS ss,
         MIN(v6) AS mn6, MAX(v6) AS mx6,
         CAST(SUM(CASE WHEN v6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM q GROUP BY dim
)
SELECT dim,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       {sql_roundn("(CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE)) / 1000000.0", 6)} AS mean_v,
       {sql_roundn(
           "SQRT(GREATEST(CAST(ss AS DOUBLE) / CAST(n_vecs AS DOUBLE)"
           " - (CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE))"
           " * (CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE)), CAST(0.0 AS DOUBLE)))"
           " / 1000000.0", 6)} AS std_v,
       CAST(mn6 AS DOUBLE) / 1000000.0 AS min_v,
       CAST(mx6 AS DOUBLE) / 1000000.0 AS max_v,
       n_zero,
       mn6 = mx6 AS is_constant
FROM agg
"""


# ---------------------------------------------------------------------------
# Matryoshka / prefix-dimension recall: how much of the exact full-dim
# top-k survives when ranking by the FIRST half of the dimensions only —
# the evaluation behind matryoshka-style truncatable embeddings and
# dim-sliced ANN shortlists. One broadcast-scored pass computes both
# cosines; the two rank windows share the qid exchange. Ground truth is
# sample-bounded (ANN_RECALL-style fixed query set) — the documented
# harness trade: exact brute-force truth over Q queries, never corpus².
# ---------------------------------------------------------------------------

MATRYOSHKA_K = 10
MATRYOSHKA_QUERIES = 20


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    half = F.expr("slice(embedding, 1, CAST(size(embedding) DIV 2 AS INT))")
    base = emb.select("vec_id", "embedding", half.alias("hvec")).select(
        "vec_id",
        "embedding",
        "hvec",
        _sq_norm("embedding").alias("_n2f"),
        _sq_norm("hvec").alias("_n2h"),
    )
    qs = base.filter(F.col("vec_id") < MATRYOSHKA_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("hvec").alias("qh"),
        F.col("_n2f").alias("_qn2f"),
        F.col("_n2h").alias("_qn2h"),
    )
    scored = base.join(F.broadcast(qs), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        roundn(
            _cosine_pre("embedding", "qvec", "_n2f", "_qn2f"),
            6,
        ).alias("cf"),
        roundn(
            _cosine_pre("hvec", "qh", "_n2h", "_qn2h"),
            6,
        ).alias("ch"),
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cf"), F.asc("vec_id"))
    wh = Window.partitionBy("qid").orderBy(F.desc("ch"), F.asc("vec_id"))
    rnk = scored.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rh", F.row_number().over(wh)
    )
    hit = F.when(
        (F.col("rf") <= MATRYOSHKA_K) & (F.col("rh") <= MATRYOSHKA_K), 1
    ).otherwise(0)
    return rnk.groupBy("qid").agg(
        F.sum(hit).cast("long").alias("hits"),
        roundn(F.sum(hit).cast("double") / F.lit(MATRYOSHKA_K)).alias(
            "recall_at_k"
        ),
    )


Q_MATRYOSHKA_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding,
         embedding[1:CAST(len(embedding) // 2 AS INT)] AS hvec
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, embedding AS qvec, hvec AS qh
  FROM base WHERE vec_id < {MATRYOSHKA_QUERIES}
), scored AS (
  SELECT qid, b.vec_id,
         FLOOR(({_sql_dot("b.embedding", "qvec")}
                / SQRT({_sql_dot("b.embedding", "b.embedding")}
                       * {_sql_dot("qvec", "qvec")})) * 1000000 + 0.5)
           / 1000000 AS cf,
         FLOOR(({_sql_dot("b.hvec", "qh")}
                / SQRT({_sql_dot("b.hvec", "b.hvec")}
                       * {_sql_dot("qh", "qh")})) * 1000000 + 0.5)
           / 1000000 AS ch
  FROM base b JOIN q ON b.vec_id <> qid
), rnk AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cf DESC, vec_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ch DESC, vec_id) AS rh
  FROM scored
)
SELECT qid,
       CAST(SUM(CASE WHEN rf <= {MATRYOSHKA_K} AND rh <= {MATRYOSHKA_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       {sql_roundn(
           "CAST(SUM(CASE WHEN rf <= " + str(MATRYOSHKA_K)
           + " AND rh <= " + str(MATRYOSHKA_K)
           + " THEN 1 ELSE 0 END) AS DOUBLE) / " + str(MATRYOSHKA_K))}
         AS recall_at_k
FROM rnk GROUP BY qid
"""


QUERIES: dict[str, tuple] = {
    "q_matryoshka_recall": (q_matryoshka_recall, Q_MATRYOSHKA_SQL),
    "q_centroid_drift": (q_centroid_drift, Q_CENTROID_DRIFT_SQL),
    "q_embedding_outliers": (q_embedding_outliers, Q_EMBEDDING_OUTLIERS_SQL),
    # CANONICAL SemDeDup = the scale-true k ∝ n plan (round-4 swap per
    # VERDICT r03: no default-name query may carry a quadratic shape).
    "q_semantic_dedup": (q_semantic_dedup, Q_SEMANTIC_DEDUP_SQL),
    # the paper's fixed-k "cells = class labels" form, kept as the
    # small-corpus/bit-parity variant (O(n²/k) within-cell work)
    "q_semantic_dedup_smallk": (
        q_semantic_dedup_smallk,
        Q_SEMANTIC_DEDUP_SMALLK_SQL,
    ),
    "q_semantic_dedup_2level": (
        q_semantic_dedup_2level,
        Q_SEMANTIC_DEDUP_2LEVEL_SQL,
    ),
    # quality-aware representative selection (round 10, VERDICT r09 #6)
    "q_semantic_dedup_quality": (
        q_semantic_dedup_quality,
        Q_SEMANTIC_DEDUP_QUALITY_SQL,
    ),
    # batch-vs-corpus incremental SemDeDup (round 11, VERDICT r10 #4)
    "q_incremental_semdedup": (
        q_incremental_semdedup,
        Q_INCREMENTAL_SEMDEDUP_SQL,
    ),
    "q_jl_projection": (q_jl_projection, Q_JL_PROJECTION_SQL),
    "q_ann_ivf": (q_ann_ivf, Q_ANN_IVF_SQL),
    "q_ann_ivf_multiprobe": (q_ann_ivf_multiprobe, Q_ANN_IVF_MULTIPROBE_SQL),
    "q_ivf_recall": (q_ivf_recall, Q_IVF_RECALL_SQL),
    "q_knn_bruteforce": (q_knn_bruteforce, Q_KNN_SQL),
    "q_knn_batch": (q_knn_batch, Q_KNN_BATCH_SQL),
    "q_label_centroids": (q_label_centroids, Q_LABEL_CENTROIDS_SQL),
    "q_ann_lsh": (q_ann_lsh, Q_ANN_LSH_SQL),
    "q_ann_recall": (q_ann_recall, Q_ANN_RECALL_SQL),
    "q_embedding_neardup": (q_embedding_neardup, Q_EMBEDDING_NEARDUP_SQL),
    "q_embedding_norms": (q_embedding_norms, Q_EMBEDDING_NORMS_SQL),
    "q_embedding_dim_audit": (q_embedding_dim_audit, Q_EMBEDDING_DIM_AUDIT_SQL),
    "q_hard_negatives": (q_hard_negatives, Q_HARD_NEGATIVES_SQL),
    "q_kmeans_clusters": (q_kmeans_clusters, Q_KMEANS_SQL),
    "q_pq_topk": (q_pq_topk, Q_PQ_TOPK_SQL),
}
