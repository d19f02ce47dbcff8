"""Sequence assembly for training-data pipelines: packing, chunking, mixing.

Three corpus-to-training-batch shapes the reference's serving path implies but
never distributes (its collate loop concatenates per-batch on the driver,
``/root/reference/larmatch2d/larmatch_dataset.py:163-192``):

- **Sequence packing** — concatenate the token stream in a canonical order and
  cut it every ``SEQ_LEN`` tokens (the standard pretraining "document packing"
  layout).  The only global state is a prefix sum of per-doc token counts; we
  compute it hierarchically: an in-block running-sum window (bounded
  ``DOC_BLOCK`` rows per task) plus a block-prefix window over ``n_blocks``
  rows (tiny).  No single task ever sees O(corpus) rows — the direct
  ``SUM() OVER (ORDER BY doc_id)`` global window would.
- **Overlapping chunking** — RAG-style sliding windows of ``CHUNK_TOKENS``
  tokens advancing by ``CHUNK_STRIDE``; pure per-row explode, no shuffle.
- **Mixture sampling** — deterministic per-source keep rates applied via an
  md5 hash threshold (no RNG: the same doc survives in every engine and
  every rerun); scan + filter + one partial-aggregatable shuffle.

All plans are JVM-built-in only (split / sequence / slice / explode / window),
so they stay inside codegen and scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.plans.tpch import hash_unit

#: tokens per packed training sequence
SEQ_LEN = 512
#: docs per prefix-sum block; bounds the per-task window at DOC_BLOCK rows
DOC_BLOCK = 65536

# ---------------------------------------------------------------------------
# Sequence packing: global token offsets -> per-sequence occupancy
# ---------------------------------------------------------------------------


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per packed sequence: docs touching it, tokens filled, carryover docs.

    The hierarchical prefix sum (in-block cumsum + block-offset broadcast
    join) replaces the global-order window: at 100 TB the naive
    ``SUM() OVER (ORDER BY doc_id)`` funnels the whole corpus through one
    task's sort, while here each window partition holds <= DOC_BLOCK rows
    and the block-prefix window sees corpus/DOC_BLOCK rows (~15k at 1e9
    docs).  A doc straddling a cut contributes its token split to both
    neighbours (``n_carryover`` counts the continuation side).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        (F.col("doc_id") / DOC_BLOCK).cast("long").alias("block"),
    )
    w_in = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("in_cum", F.sum("n_toks").over(w_in))
    # per-block totals -> exclusive prefix; n_blocks rows, single tiny task
    w_blk = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        d.groupBy("block")
        .agg(F.sum("n_toks").alias("btot"))
        .withColumn("boff", F.coalesce(F.sum("btot").over(w_blk), F.lit(0)))
        .select("block", "boff")
    )
    offs = (
        d.join(F.broadcast(boff), "block")
        .withColumn("end_off", F.col("boff") + F.col("in_cum"))
        .withColumn("start_off", F.col("end_off") - F.col("n_toks"))
    )
    spans = offs.select(
        "start_off",
        "end_off",
        F.explode(
            F.sequence(
                F.expr(f"start_off DIV {SEQ_LEN}"),
                F.expr(f"(end_off - 1) DIV {SEQ_LEN}"),
            )
        ).alias("seq_id"),
    )
    return spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.least(F.col("end_off"), (F.col("seq_id") + 1) * SEQ_LEN)
            - F.greatest(F.col("start_off"), F.col("seq_id") * SEQ_LEN)
        ).alias("n_tokens"),
        F.sum(
            (F.col("start_off") < F.col("seq_id") * SEQ_LEN).cast("long")
        ).alias("n_carryover"),
    )


Q_PACK_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), o AS (
  SELECT doc_id, n_toks,
         CAST(SUM(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS end_off
  FROM d
), s AS (
  SELECT end_off - n_toks AS start_off, end_off FROM o
), e AS (
  SELECT start_off, end_off,
         unnest(range(start_off // {SEQ_LEN},
                      (end_off - 1) // {SEQ_LEN} + 1)) AS seq_id
  FROM s
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(end_off, (seq_id + 1) * {SEQ_LEN})
                - GREATEST(start_off, seq_id * {SEQ_LEN})) AS BIGINT)
         AS n_tokens,
       CAST(SUM(CASE WHEN start_off < seq_id * {SEQ_LEN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_carryover
FROM e
GROUP BY seq_id
"""


# ---------------------------------------------------------------------------
# Overlapping chunking (RAG-style sliding windows)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token windows per doc; emits (doc, chunk, length, md5).

    Narrow per-row work: tokenize once, explode chunk starts, slice.  No
    shuffle at all — the plan is scan -> generate -> project, so it scales
    with input splits.  ``slice`` clamps at the doc end, so the final chunk
    is short rather than padded (the downstream packer pads).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn("toks", F.split("text", " "))
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(CHUNK_STRIDE)
            )
        ).alias("start"),
    )
    piece = F.slice(F.col("toks"), F.col("start"), CHUNK_TOKENS)
    return chunks.select(
        "doc_id",
        F.expr(f"(start - 1) DIV {CHUNK_STRIDE}").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("chunk_len"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


Q_CHUNK_OVERLAP_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(range(1, GREATEST(len(toks), 1) + 1, {CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(toks, start, start + {CHUNK_TOKENS} - 1)) AS BIGINT)
         AS chunk_len,
       md5(array_to_string(list_slice(toks, start, start + {CHUNK_TOKENS} - 1),
                           ' ')) AS chunk_md5
FROM c
"""


# ---------------------------------------------------------------------------
# Deterministic mixture sampling (per-source keep rates, hash threshold)
# ---------------------------------------------------------------------------

#: sources are 'src<i>'; rate = (N_SOURCES - i) / N_SOURCES -> src0 keeps all
N_SOURCES = 20
HASH_MOD = 1_000_000


def _keep_rate() -> F.Column:
    # try_cast: a source tag without the numeric suffix yields a NULL
    # rate (and a 0 keep via the coalesce below), not an ANSI cast error
    # — mirrored with TRY_CAST in the oracle (degenerate-corpus sweep)
    idx = F.substring("source", 4, 8).try_cast("int")
    return (F.lit(N_SOURCES) - idx) / float(N_SOURCES)


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source totals vs docs surviving the hash-threshold mixture gate.

    The keep decision is a pure function of (doc_id, source) — md5 of the
    doc_id mapped to [0, 1) and compared to the source's rate — so the
    sampled corpus is reproducible across engines, reruns, and cluster
    sizes, and the filter runs scan-side with no extra pass (contrast
    ``rand()``-based sampling, which is neither pushdown-safe nor stable
    under task retry).  One partial-aggregatable shuffle on ``source``.
    """
    docs = load_table(spark, sf_dir, "documents")
    # unsalted draw: concat with '' is the identity on the non-null id
    # string, so the shared helper reproduces the original md5 input
    u = hash_unit(F.col("doc_id"), "", HASH_MOD)
    flagged = docs.select(
        "source",
        # NULL rate (non-numeric source tag): keep 0, matching the SQL
        # CASE's ELSE branch — sum semantics stay engine-identical
        F.coalesce((u < _keep_rate()).cast("long"), F.lit(0)).alias("keep"),
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("keep").alias("n_kept"),
    )
    return agg.select(
        "source",
        _keep_rate().alias("rate"),
        "n_total",
        "n_kept",
        (F.col("n_kept").cast("double") / F.col("n_total")).alias("emp_rate"),
    )


Q_MIXTURE_SAMPLE_SQL = f"""
WITH flagged AS (
  SELECT source,
         CASE WHEN (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % {HASH_MOD}) / {HASH_MOD}.0
                   < ({N_SOURCES} - TRY_CAST(substr(source, 4, 8) AS INT))
                     / {N_SOURCES}.0
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source,
       ({N_SOURCES} - TRY_CAST(substr(source, 4, 8) AS INT)) / {N_SOURCES}.0 AS rate,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(keep) AS DOUBLE) / count(*) AS emp_rate
FROM flagged
GROUP BY source
"""


QUERIES: dict[str, tuple] = {
    "q_pack_sequences": (q_pack_sequences, Q_PACK_SEQUENCES_SQL),
    "q_chunk_overlap": (q_chunk_overlap, Q_CHUNK_OVERLAP_SQL),
    "q_mixture_sample": (q_mixture_sample, Q_MIXTURE_SAMPLE_SQL),
}
