"""Product quantization (PQ) — the compressed-vector scale path for
similarity search.

IVF (``operators.kmeans``) prunes WHICH vectors to scan; PQ shrinks WHAT
is scanned: each vector becomes ``m`` small codes (one byte-ish each), and
query-time distance is a table lookup per code (asymmetric distance
computation, ADC) instead of a ``dim``-wide float loop. At 100 TB this is
the difference between scanning 64 floats and scanning 4 ints per vector,
with the ``m x k`` distance table broadcast as a literal.

Design notes (Spark-first):

- **Training fuses all subspaces into ONE shuffle per Lloyd round.** A
  naive PQ trainer runs ``m`` independent k-means jobs; here the table is
  exploded once to ``(id, sub, svec)`` and every round is a single
  ``(sub, code, dim)``-keyed aggregation — ``m`` quantizers for the
  shuffle price of one. Rows per group shrink ``m``-fold, keys grow
  ``m``-fold: same data volume, better balance.
- **Encode and ADC are narrow maps** — codebooks and distance tables ride
  along as broadcast-size literals (``m*k*(dim/m)`` doubles), argmin via
  the lexicographic struct-min trick (ties -> lowest code id).
- Centroid means are rounded to 6 dp per round (the cross-engine
  determinism convention — see ``plans.similarity.q_kmeans_clusters``).

Prior art: Jégou et al., "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — public method, re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subspace_explode(
    vectors: DataFrame, m: int, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """``(id, sub, svec)`` — one row per (vector, subspace). The single
    up-front explode that lets all ``m`` quantizers train together."""
    dim_w = f"(size({vec_col}) div {m})"
    subs = F.expr(
        f"transform(sequence(0, {m} - 1), j -> struct("
        f" j AS sub, slice({vec_col}, j * {dim_w} + 1, {dim_w}) AS svec))"
    )
    return vectors.select(id_col, F.explode(subs).alias("_s")).select(
        id_col, "_s.sub", "_s.svec"
    )


def _codebook_literal(codebooks: list[list[list[float]]]):
    """Nested literal: codebooks[sub][code] -> centroid array."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(v)) for v in cent])
                    for cent in book
                ]
            )
            for book in codebooks
        ]
    )


_ARGMIN_CODE = (
    # over the row's own subspace codebook: struct(dist, code) array_min
    "array_min(transform(_book, s -> struct("
    " aggregate(zip_with(_sv, s.cv, (x, y) ->"
    "  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
    " s.code AS code))).code"
)


def assign_codes_exploded(sub_rows: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """``sub_rows`` (from :func:`subspace_explode`) + ``code``: nearest
    centroid of the row's subspace. Narrow map — codebooks are literals."""
    cb = _codebook_literal(codebooks)
    indexed = F.expr(
        "transform(element_at(_books, sub + 1),"
        " (cv, i) -> struct(cv AS cv, i AS code))"
    )
    return (
        sub_rows.withColumn("_books", cb)
        .withColumn("_book", indexed)
        .withColumn("_sv", F.col("svec"))
        .withColumn("code", F.expr(_ARGMIN_CODE))
        .drop("_books", "_book", "_sv")
    )


def pq_fit(
    vectors: DataFrame,
    m: int,
    k: int,
    *,
    rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train ``m`` sub-quantizers of ``k`` centroids each.

    Init is deterministic (the ``k`` lowest-id vectors' subvectors); each
    Lloyd round is ONE ``(sub, code, dim)``-keyed shuffle for all
    subspaces. Returns ``codebooks[sub][code] -> list[float]`` (6 dp
    rounded means), the artifact for :func:`pq_encode` / :func:`pq_adc_topk`.

    NULL vectors are dropped from training (round-8 NULL-payload
    contract); :func:`pq_encode` still maps them to NULL codes."""
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    init_rows = vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if not init_rows:
        raise ValueError("pq_fit requires a non-empty training set")
    dim = len(init_rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    codebooks = [
        [[float(v) for v in r[vec_col]][j * w : (j + 1) * w] for r in init_rows]
        for j in range(m)
    ]
    sub_rows = subspace_explode(vectors, m, vec_col=vec_col, id_col=id_col)
    for _ in range(rounds):
        assigned = assign_codes_exploded(sub_rows, codebooks)
        rows = (
            assigned.select("sub", "code", F.posexplode("svec").alias("dim", "v"))
            .groupBy("sub", "code", "dim")
            .agg(
                F.expr(
                    "CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)"
                    " / 1000000"
                ).alias("mean")
            )
            .groupBy("sub", "code")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, mean))), s -> s.mean)"
                ).alias("cent")
            )
            .collect()
        )
        updated = {(r.sub, r.code): list(r.cent) for r in rows}
        codebooks = [
            [updated.get((j, c), codebooks[j][c]) for c in range(k)]
            for j in range(m)
        ]
    return codebooks


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """``vectors`` + ``codes`` (array<int>, length m): per-subspace nearest
    code, NULL for a NULL vector (padding-row contract — without the
    explicit guard a NULL subspace distance sorts smallest in the struct
    argmin and every NULL vector silently encodes as code 0 everywhere).
    An all-zero vector is ordinary: each subspace takes the smallest-norm
    code. One narrow projection — no shuffle, no Python in the row path."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    cb = _codebook_literal(codebooks)
    codes = F.expr(
        f"transform(sequence(0, {m} - 1), j -> "
        "array_min(transform("
        "  transform(element_at(_books, j + 1), (cv, i) -> struct(cv AS cv, i AS code)),"
        "  s -> struct("
        f"   aggregate(zip_with(slice({vec_col}, j * {w} + 1, {w}), s.cv, (x, y) ->"
        "    (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        "    CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        "   s.code AS code))).code)"
    )
    return (
        vectors.withColumn("_books", cb)
        .withColumn(
            "codes", F.when(F.col(vec_col).isNotNull(), codes)
        )
        .drop("_books")
    )


def adc_table(
    codebooks: list[list[list[float]]], query: list[float]
) -> list[list[float]]:
    """Driver-side ``m x k`` squared-distance table for one query vector —
    rounded 6 dp (the cross-engine convention). Tiny by construction."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    table: list[list[float]] = []
    for j, book in enumerate(codebooks):
        qs = [float(v) for v in query[j * w : (j + 1) * w]]
        row = []
        for cent in book:
            d = 0.0
            for x, y in zip(qs, cent):
                d += (x - y) * (x - y)
            import math

            row.append(math.floor(d * 1000000 + 0.5) / 1000000)
        table.append(row)
    return table


def pq_adc_scores(
    encoded: DataFrame, table: list[list[float]], *, codes_col: str = "codes"
) -> DataFrame:
    """+ ``adc_dist``: sum over subspaces of the table entry for the row's
    code — the ADC lookup, a narrow map over ints + one literal."""
    tbl = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in table]
    )
    # ordered fold over subspaces (deterministic summation order), then the
    # coarser 4 dp round so engine-side summation-order ulps cannot differ
    adc = F.expr(
        f"CAST(floor(aggregate(sequence(0, size({codes_col}) - 1), CAST(0 AS DOUBLE),"
        f" (acc, j) -> acc + element_at(element_at(_tbl, j + 1),"
        f" element_at({codes_col}, j + 1) + 1)) * 10000 + 0.5) AS DOUBLE) / 10000"
    )
    return encoded.withColumn("_tbl", tbl).withColumn("adc_dist", adc).drop("_tbl")


def ivf_pq_topk(
    vectors: DataFrame,
    query: list[float],
    *,
    n_cells: int = 8,
    probes: int = 2,
    m: int = 4,
    k_codes: int = 8,
    rounds: int = 1,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The composed FAISS-style index search: IVF cells prune WHICH rows
    are scanned, PQ codes shrink WHAT is scanned per row.

    1. coarse quantizer: ``kmeans_fit`` → cells; every vector assigned once
       (at 100 TB you write the table partitioned by ``cluster`` so probes
       prune whole files);
    2. PQ codebooks trained + every vector encoded to ``m`` codes;
    3. query side (all driver-size): the ``probes`` nearest cells by exact
       centroid distance, and the ``m × k`` ADC table;
    4. scan ONLY probed cells' codes, sum table lookups, exact top-k.

    Pass pretrained ``cents``/``books`` (the plain-list artifacts
    ``kmeans_fit``/``pq_fit`` return) to skip training — a batch of Q
    queries should train ONCE, not Q times; training runs only for
    whichever artifact is absent.

    Returns (id, cluster, adc_dist) for the top-k rows by ADC distance
    (ties broken by id). Approximate by construction — recall governed by
    ``probes`` (cells scanned) and ``m``/``k_codes`` (code resolution).
    """
    from ubparquet_spark.operators.kmeans import assign_clusters, kmeans_fit

    if cents is None:
        cents = kmeans_fit(
            vectors, n_cells, rounds=rounds, vec_col=vec_col, id_col=id_col
        )
    assigned = assign_clusters(vectors, cents, vec_col)
    if books is None:
        books = pq_fit(
            vectors, m, k_codes, rounds=rounds, vec_col=vec_col, id_col=id_col
        )
    encoded = pq_encode(assigned, books, vec_col=vec_col)

    q = [float(v) for v in query]
    cell_order = sorted(
        range(len(cents)),
        key=lambda c: (
            sum((x - float(y)) ** 2 for x, y in zip(q, cents[c])),
            c,
        ),
    )[:probes]
    table = adc_table(books, q)
    return (
        pq_adc_scores(encoded.filter(F.col("cluster").isin(cell_order)), table)
        .select(id_col, "cluster", "adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(topk)
    )
