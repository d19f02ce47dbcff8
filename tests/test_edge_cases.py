"""Edge cases: empty events, empty tables, degenerate groups through the
operator stack — the paths a 100 TB lake will hit somewhere every day."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubparquet_spark import codec
from ubparquet_spark.operators import voxel

KEYS = ["run", "subrun", "event"]

EMPTY_EVENT_DDL = (
    "run long, subrun long, event long, "
    "spacepoint_t array<double>, spacepoint_t_shape array<long>, "
    "truetriplet_t array<long>, truetriplet_t_shape array<long>"
)


def _df_with_empty_event(spark):
    rows = [
        # normal event
        {
            "run": 1, "subrun": 0, "event": 0,
            "spacepoint_t": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "spacepoint_t_shape": [2, 4],
            "truetriplet_t": [1, 0],
            "truetriplet_t_shape": [2],
        },
        # empty event: zero points (shape [0, 4])
        {
            "run": 1, "subrun": 0, "event": 1,
            "spacepoint_t": [],
            "spacepoint_t_shape": [0, 4],
            "truetriplet_t": [],
            "truetriplet_t_shape": [0],
        },
    ]
    return spark.createDataFrame(rows, EMPTY_EVENT_DDL)


def test_explode_skips_empty_events(spark):
    df = _df_with_empty_event(spark)
    pts = codec.explode_tensor(df, "spacepoint_t", KEYS)
    assert pts.count() == 2  # only the two real points
    assert codec.validate_tensors(df).count() == 0  # [0,4] is valid


def test_mask_filter_empty_and_all_masked(spark):
    df = _df_with_empty_event(spark)
    out = voxel.mask_filter(df, ["spacepoint_t"], "truetriplet_t", KEYS)
    rows = {r.event: r for r in out.collect()}
    # event 0 keeps exactly the masked-in point
    assert rows[0].spacepoint_t == [1.0, 2.0, 3.0, 4.0]
    assert rows[0].spacepoint_t_shape == [1, 4]
    # event 1 had no points at all -> no group emitted (reference drops
    # empty instance groups too, voxel_to_instance_data.py:61)
    assert 1 not in rows


def test_voxelize_empty_input(spark):
    empty = spark.createDataFrame(
        [], "run long, subrun long, event long, idx long, "
            "x double, y double, z double, q double"
    )
    assert voxel.voxelize(empty).count() == 0
    assert voxel.voxelize(empty, label_col=None).count() == 0


def test_quality_audit_empty_table(spark):
    from ubparquet_spark import quality

    empty = spark.createDataFrame([], EMPTY_EVENT_DDL)
    report = quality.audit(empty, KEYS)
    assert all(v == 0 for v in report.values())


def test_dedup_groups_no_edges(spark):
    from ubparquet_spark.functions.dedup_clusters import dedup_groups

    ids = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    no_edges = spark.createDataFrame([], "src long, dst long")
    out = dedup_groups(no_edges, ids, "doc_id")
    assert out.filter("is_canonical").count() == 5


def test_every_registered_query_survives_empty_tables(spark, tmp_path_factory):
    """A 100 TB lake has empty partitions somewhere every day: every
    registered query must plan and execute against a fully empty,
    schema-identical dataset — AND (round 7, upgraded from no-throw to
    full parity) every oracled query must hash-match DuckDB on it.
    Guards the sequence(1, n<=0) hazard class and the 0-rows-vs-one-NULL-
    row empty-aggregate divergence class (q_key_skew_profile, round-6
    ADVICE) for good."""
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    empty_sql = {t: "SELECT * FROM src LIMIT 0" for t in _DEGEN_SQL}
    failures = _oracle_parity_sweep(spark, dst, empty_sql)
    assert not failures, failures



# ---------------------------------------------------------------------------
# Degenerate-corpus ORACLE sweep (round 6) — the empty-table sweep's big
# sibling. Constant prices/quantities/values (zero variance), all users
# collapsed to 3, every document one of TWO texts (mass duplicates, one
# lang, one source with no numeric suffix), every embedding the same
# vector. This data hits the paths sf0.01 never does: zero-variance
# divisions (Pearson/Spearman/OLS denominators), empty regex extractions
# under ANSI casts, single-source regressions, all-ties rankings. The
# gate is FULL oracle parity, not just no-throw: every registered query
# must run AND every oracled query must hash-match DuckDB on this
# corpus. Round-6 findings fixed to get here green: q_spearman /
# q_heaps_fit NULL-on-zero-variance via identical double guard
# expressions in both engines, q_regex_source_buckets /
# q_mixture_sample try_cast instead of ANSI CAST.
# ---------------------------------------------------------------------------

_DEGEN_SQL = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": "SELECT * FROM src",
    "supplier": "SELECT * FROM src",
    "part": "SELECT * FROM src",
    "orders": (
        "SELECT o_orderkey, o_custkey % 3 AS o_custkey, o_orderstatus,"
        " CAST(100.0 AS DOUBLE) AS o_totalprice, o_orderdate,"
        " o_orderpriority FROM src"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " CAST(5.0 AS DOUBLE) AS l_quantity,"
        " CAST(100.0 AS DOUBLE) AS l_extendedprice,"
        " CAST(0.05 AS DOUBLE) AS l_discount,"
        " CAST(0.02 AS DOUBLE) AS l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM src"
    ),
    "events": (
        "SELECT event_id, ts, user_id % 3 AS user_id, event_type,"
        " CASE WHEN value IS NULL THEN NULL ELSE 5.0 END AS value,"
        " props FROM src"
    ),
    "documents": (
        "SELECT doc_id, CASE WHEN doc_id % 2 = 0"
        " THEN 'the quick brown fox jumps over the lazy dog'"
        " ELSE 'lorem ipsum dolor sit amet' END AS text,"
        " 'en' AS lang, 'web' AS source, 44 AS n_chars FROM src"
    ),
    "embeddings": (
        "SELECT vec_id, list_transform(embedding,"
        " x -> CAST(0.5 AS FLOAT)) AS embedding, 1 AS label FROM src"
    ),
}


# Extremes corpus (round 6, second sweep): NEGATIVE amounts (refunds),
# sub-cent values that round to 0 cents, near-1e6 magnitudes, boundary
# discounts (0.0 / 1.0), and EMPTY documents. First run found: Benford
# ANSI casts of '-' and log(1 + 1/0) on digit 0, the minhash sentinel
# bucket (docs with < 3 tokens collapsed into one md5('') band — every
# tiny doc a "near-dup candidate" of every other), and BPE's '' word
# hitting the sequence(1, 0) -> [1, 0] hazard. All fixed with
# engine-identical semantics; the sweep pins them.
_EXTREME_SQL = dict(
    _DEGEN_SQL,
    orders=(
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " CAST(CASE o_orderkey % 3 WHEN 0 THEN -50.25 WHEN 1 THEN 0.004"
        " ELSE 999999.99 END AS DOUBLE) AS o_totalprice,"
        " o_orderdate, o_orderpriority FROM src"
    ),
    lineitem=(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " CAST(CASE l_orderkey % 2 WHEN 0 THEN -3.0 ELSE 49.0 END"
        " AS DOUBLE) AS l_quantity,"
        " CAST(CASE l_orderkey % 3 WHEN 0 THEN -1234.56 WHEN 1 THEN 0.009"
        " ELSE 999999.99 END AS DOUBLE) AS l_extendedprice,"
        " CAST(CASE l_orderkey % 2 WHEN 0 THEN 0.0 ELSE 1.0 END"
        " AS DOUBLE) AS l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate FROM src"
    ),
    events=(
        "SELECT event_id, ts, user_id, event_type,"
        " CAST(CASE WHEN value IS NULL THEN NULL"
        " WHEN event_id % 3 = 0 THEN -123.45 WHEN event_id % 3 = 1 THEN 0.005"
        " ELSE 999999.99 END AS DOUBLE) AS value, props FROM src"
    ),
    documents=(
        "SELECT doc_id,"
        " CAST(CASE WHEN doc_id % 7 = 0 THEN '' ELSE text END AS VARCHAR)"
        " AS text, lang, source,"
        " CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE n_chars END AS BIGINT)"
        " AS n_chars FROM src"
    ),
    embeddings="SELECT * FROM src",
)


def _oracle_parity_check(spark, dst: str, duck_paths: dict) -> list[str]:
    """Require every registered query to run against ``dst`` AND every
    oracled query to hash-match DuckDB reading ``duck_paths[table]``.

    The per-query checks run from a small thread pool (round 12, VERDICT
    r11 #7 — guide §2.6 "overlap independent jobs"): each check is an
    independent Spark action over a tiny corpus whose wall time is almost
    entirely driver-synchronized planning + stage scheduling, so
    concurrent submission back-fills the idle executors and cuts the
    sweep wall ~3-4x with IDENTICAL coverage (every registered query,
    every oracle, same hashes — results are order-insensitive by
    construction). py4j releases the GIL during JVM calls and SparkSession
    is thread-safe for concurrent actions; DuckDB gets one cursor per
    task (cursors share the parent connection's catalog). Set
    UBSPARK_TEST_PAR=1 to force the old sequential behaviour."""
    import hashlib
    import os
    from concurrent.futures import ThreadPoolExecutor

    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t, p in duck_paths.items():
        # values containing "(" are verbatim table expressions (e.g.
        # read_parquet(..., union_by_name=true)); plain values are paths
        src = p if "(" in p else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    def vhash(p):
        p = p[sorted(p.columns)].sort_values(
            by=sorted(p.columns), ignore_index=True
        )
        return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]

    oracles = entry.oracle_sql()

    def check(item) -> str | None:
        name, fn = item
        try:
            pdf = fn(spark, dst).toPandas()
        except Exception as e:
            return f"{name}: THREW {str(e).splitlines()[0][:120]}"
        if name not in oracles:
            return None
        cur = con.cursor()
        try:
            if vhash(pdf) != vhash(cur.sql(oracles[name]).df()):
                return f"{name}: hash mismatch ({len(pdf)} rows)"
        finally:
            cur.close()
        return None

    workers = int(os.environ.get("UBSPARK_TEST_PAR", "6"))
    items = list(entry.queries().items())
    if workers <= 1:
        results = [check(it) for it in items]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(check, items))
    return [r for r in results if r]


def _oracle_parity_sweep(spark, dst: str, table_sql: dict) -> list[str]:
    """Build the corpus via DuckDB, then require every registered query
    to run AND every oracled query to hash-match DuckDB on it."""
    import duckdb

    src = "/root/testdata/sf0.001"
    build = duckdb.connect()
    for t, sql in table_sql.items():
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'"
        )
        build.sql(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    return _oracle_parity_check(
        spark, dst, {t: f"{dst}/{t}.parquet" for t in table_sql}
    )


def test_degenerate_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_degen"))
    failures = _oracle_parity_sweep(spark, dst, _DEGEN_SQL)
    assert not failures, failures


def test_extremes_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_extreme"))
    failures = _oracle_parity_sweep(spark, dst, _EXTREME_SQL)
    assert not failures, failures


# Unicode corpus (round 6, third sweep): CJK, emoji (incl. a ZWJ family
# sequence), combining accents, RTL Arabic, Cyrillic — pins that the
# whole text stack (split/substr/length/md5 shingles, char entropy,
# lang-id, BPE char folds) agrees across engines on multibyte input.
# Passed clean on first run; kept as a regression gate.
_UNICODE_TEXT = (
    "CASE doc_id % 5"
    " WHEN 0 THEN '中文分词 测试文本 数据管道 中文分词'"
    " WHEN 1 THEN '\U0001F600 café naïve résumé"
    " \U0001F468‍\U0001F469‍\U0001F467 \U0001F600'"
    " WHEN 2 THEN 'مرحبا بالعالم اختبار مرحبا'"
    " WHEN 3 THEN 'привет мир тест привет'"
    " ELSE 'ascii words here stay plain ascii words' END"
)

_UNICODE_SQL = dict(
    _DEGEN_SQL,
    orders="SELECT * FROM src",
    lineitem="SELECT * FROM src",
    events="SELECT * FROM src",
    embeddings="SELECT * FROM src",
    documents=(
        f"SELECT doc_id, CAST({_UNICODE_TEXT} AS VARCHAR) AS text,"
        f" lang, source, CAST(length({_UNICODE_TEXT}) AS BIGINT) AS n_chars"
        " FROM src"
    ),
)


def test_unicode_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_unicode"))
    failures = _oracle_parity_sweep(spark, dst, _UNICODE_SQL)
    assert not failures, failures


# Deep-unicode corpus (round 10, TWELFTH sweep — VERDICT r09 #4): the
# multibyte axes the round-6 unicode corpus did not reach — NFC vs NFD
# variants of the SAME word inside one document (byte-distinct tokens
# that render identically), astral-plane code points (surrogate pairs in
# UTF-16 engines), ZWJ/ZWNJ joiners inside tokens, mixed-script tokens,
# Arabic-Indic digits next to ASCII digits, UPPERCASE Cyrillic (the
# lower() path on non-Latin), and Latin ligatures. Probed primitives
# (round-10 probe): length/substr/md5/split/regex ASCII classes agree
# across engines on all of these; DuckDB levenshtein counts BYTES, which
# round 10 pinned engine-wide by moving q_editdist_pairs to byte grain.
# Case-folding special cases that GENUINELY diverge between Java and
# utf8proc (word-final Greek sigma, U+0130 İ, upper-ß) are deliberately
# excluded here and pinned by test_casefold_known_divergences below.
_UNICODE_DEEP_TEXT = (
    "CASE doc_id % 8"
    " WHEN 0 THEN 'café menu café prix café'"       # NFC vs NFD
    " WHEN 1 THEN '中文 分词 数据 管道 中文'"
    " WHEN 2 THEN '\U0001d11e music \U0001d11e\U0001d11e notes \U0001f3b6'"
    " WHEN 3 THEN '\U0001F468‍\U0001F469‍\U0001F467 family ab‌cd join ab‍cd'"
    " WHEN 4 THEN 'abc中文def λcalc αβγ test'"
    " WHEN 5 THEN '٠١٢٣ مرحبا 123 بالعالم'"
    " WHEN 6 THEN 'ПРИВЕТ МИР ﬁsh ǅungla'"
    " ELSE text END"
)

_UNICODE_DEEP_SQL = dict(
    _DEGEN_SQL,
    orders="SELECT * FROM src",
    lineitem="SELECT * FROM src",
    events="SELECT * FROM src",
    embeddings="SELECT * FROM src",
    documents=(
        f"SELECT doc_id, CAST({_UNICODE_DEEP_TEXT} AS VARCHAR) AS text,"
        f" lang, source,"
        f" CAST(length({_UNICODE_DEEP_TEXT}) AS BIGINT) AS n_chars"
        " FROM src"
    ),
)


def test_unicode_deep_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_unideep"))
    failures = _oracle_parity_sweep(spark, dst, _UNICODE_DEEP_SQL)
    assert not failures, failures


def test_casefold_known_divergences(spark):
    """Documented engine divergence (round-10 probe): Java (Spark) and
    utf8proc (DuckDB) disagree on three case-folding special cases —
    word-final Greek capital sigma (Java emits the contextual final form
    'ς'), U+0130 LATIN CAPITAL I WITH DOT (Java lowers to 'i' + combining
    dot, utf8proc to plain 'i'), and upper('ß') (Java 'SS', utf8proc
    'ẞ').  No registered query's semantics depend on these code points —
    the deep-unicode corpus excludes them BY POLICY — and this test pins
    the divergence loudly: if an engine upgrade converges any case, it
    fails, telling us to widen the sweep corpus instead."""
    import duckdb

    rows = [("ΒΙΒΛΙΟΣ",), ("İstanbul",), ("ß",)]
    sdf = spark.createDataFrame(rows, "s string")
    got_spark = [
        (r.lo, r.up)
        for r in sdf.selectExpr(
            "lower(s) AS lo", "upper(s) AS up"
        ).collect()
    ]
    got_duck = duckdb.sql(
        "SELECT lower(s), upper(s) FROM (VALUES ('ΒΙΒΛΙΟΣ'), ('İstanbul'),"
        " ('ß')) t(s)"
    ).fetchall()
    # final sigma: contextual in Java, plain in utf8proc
    assert got_spark[0][0] == "βιβλιος" and got_duck[0][0] == "βιβλιοσ"
    # dotted capital I: combining dot retained in Java, dropped by utf8proc
    assert got_spark[1][0] == "i̇stanbul" and got_duck[1][0] == "istanbul"
    # sharp s uppercases to SS in Java, to U+1E9E in utf8proc
    assert got_spark[2][1] == "SS" and got_duck[2][1] == "ẞ"


# Zero-vector corpus (round 6, fourth sweep): every 5th embedding is
# all-zero (padding rows in a real feature store). First run threw ANSI
# DIVIDE_BY_ZERO in ELEVEN queries — every inline cosine divided by
# sqrt(norm²·norm²)=0. Fixed centrally: plans/similarity._cosine yields
# NULL for zero-norm vectors (DuckDB's /0 -> NULL), which drops them
# from >= threshold joins and sorts them last in desc top-k on both
# engines; q_semantic_dedup_smallk's unrolled pair cosine carries the
# same guard.
_ZEROVEC_SQL = dict(
    _DEGEN_SQL,
    orders="SELECT * FROM src",
    lineitem="SELECT * FROM src",
    events="SELECT * FROM src",
    documents="SELECT * FROM src",
    embeddings=(
        "SELECT vec_id, CASE WHEN vec_id % 5 = 0"
        " THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))"
        " ELSE embedding END AS embedding, label FROM src"
    ),
)


def test_zero_vector_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_zerovec"))
    failures = _oracle_parity_sweep(spark, dst, _ZEROVEC_SQL)
    assert not failures, failures


# Time-axis corpus (round 7, fifth sweep — VERDICT r06 "Next round" #2):
# the one un-swept input family. Events are rewritten per user into four
# pathologies: (0) ALL events at ONE tied end-of-month timestamp — zero
# gaps, zero-duration sessions, cross-user DAU ties; (1) a single LEAP
# DAY corpus (2024-02-29, second offsets); (2) epoch-boundary
# timestamps (1970-01-01 + seconds); (3) strict REVERSE arrival — ts
# decreases as event_id increases, across a year-end boundary. The
# parquet is additionally written ORDER BY ts DESC to stress any
# implicit file-order assumption; every 17th event is NULL-ts (an
# un-timed row, where Spark windows sort NULL FIRST but DuckDB sorts
# NULL LAST — and Spark's F.window drops the row while date_trunc
# buckets it); the leap-day slice adds MICROSECOND-grain ties within
# one second. Orders/lineitem dates collapse onto leap-month-end /
# year-end / year-start / epoch so that date windows, yoy rollups,
# gaps-and-islands and recency ranks all hit massive ties and boundary
# EXTRACTs. First run (pre-NULL-ts) was clean; the NULL-ts slice found
# NINE diverging plans, fixed with one explicit engine-identical
# policy: time-ordered / time-bucketed analyses exclude NULL event
# times (q_events_hourly/sliding/sessionize, q_asof_prev_click,
# q_first_touch, q_event_transitions, q_user_state_history,
# q_cusum_changepoint, q_autocorr_daily).
_TIME_AXIS_SQL = dict(
    _DEGEN_SQL,
    documents="SELECT * FROM src",
    embeddings="SELECT * FROM src",
    events=(
        "SELECT event_id,"
        " CAST(CASE WHEN event_id % 17 = 0 THEN NULL"  # un-timed events
        "  WHEN user_id % 4 = 0 THEN TIMESTAMP '2024-06-30 23:59:59'"
        "  WHEN user_id % 4 = 1 THEN TIMESTAMP '2024-02-29 00:00:00'"
        "   + (event_id % 86400) * INTERVAL 1 SECOND"
        "   + (event_id % 7) * INTERVAL 1 MICROSECOND"  # sub-second ties
        "  WHEN user_id % 4 = 2 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "   + (event_id % 3600) * INTERVAL 1 SECOND"
        "  ELSE TIMESTAMP '2024-12-31 23:59:58'"
        "   - (event_id % 100000) * INTERVAL 1 SECOND"
        " END AS TIMESTAMP) AS ts,"
        " user_id, event_type, value, props"
        " FROM src ORDER BY ts DESC, event_id DESC"
    ),
    orders=(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        " CAST(CASE CAST(o_orderkey % 4 AS INTEGER)"
        "  WHEN 0 THEN TIMESTAMP '1996-02-29 00:00:00'"
        "  WHEN 1 THEN TIMESTAMP '1995-12-31 00:00:00'"
        "  WHEN 2 THEN TIMESTAMP '1996-01-01 00:00:00'"
        "  ELSE TIMESTAMP '1970-01-01 00:00:00'"
        " END AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM src"
    ),
    lineitem=(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus,"
        " CAST(CASE CAST(l_orderkey % 3 AS INTEGER)"
        "  WHEN 0 THEN TIMESTAMP '1996-02-29 00:00:00'"
        "  WHEN 1 THEN TIMESTAMP '1995-12-31 00:00:00'"
        "  ELSE TIMESTAMP '1996-01-01 00:00:00'"
        " END AS TIMESTAMP) AS l_shipdate FROM src"
    ),
)


def test_time_axis_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_timeaxis"))
    failures = _oracle_parity_sweep(spark, dst, _TIME_AXIS_SQL)
    assert not failures, failures


# NULL-key corpus (round 7, seventh sweep): the six sweeps cover the
# value/text/vector/time axes — this one nulls the GROUPING/JOIN keys
# themselves (user_id, o_custkey, lang, source, label). The divergence
# engine: GROUP BY and window PARTITION BY keep a NULL-key group in
# both engines, but equi joins drop it, and NULL sorts FIRST in Spark
# vs LAST in DuckDB wherever a key doubles as an ORDER tie-break.
# First run found THREE diverging plans, fixed with explicit
# engine-identical policies: as_of_join now enforces equi-join NULL-key
# semantics at the OPERATOR level (a NULL key / NULL right_ts never
# matches; NULL-key left rows keep a null payload), and the per-user
# analytics q_first_touch / q_rfm_segments exclude NULL user_id in
# both engines (the RFM NTILE tie-break key is user_id, whose NULL
# ordering is engine-dependent).
_NULL_KEY_SQL = dict(
    _DEGEN_SQL,
    documents=(
        "SELECT doc_id, text,"
        " CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,"
        " CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source,"
        " n_chars FROM src"
    ),
    embeddings=(
        "SELECT vec_id, embedding,"
        " CASE WHEN vec_id % 6 = 0 THEN NULL ELSE label END AS label"
        " FROM src"
    ),
    events=(
        "SELECT event_id, ts,"
        " CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END AS user_id,"
        " event_type, value, props FROM src"
    ),
    orders=(
        "SELECT o_orderkey,"
        " CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END"
        " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src"
    ),
    lineitem="SELECT * FROM src",
)


def test_null_key_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_nullkey"))
    failures = _oracle_parity_sweep(spark, dst, _NULL_KEY_SQL)
    assert not failures, failures


# NULL-payload corpus (round 8, eighth sweep — VERDICT r07 "Next round"
# #2): sweeps 1–7 null the keys and the time axis; this one nulls the
# PAYLOADS under fully valid keys — NULL `text` (every 7th document,
# with its n_chars metadata nulled consistently), NULL `embedding`
# (every 5th vector — the round-7 operator contracts assign_clusters /
# pq_encode are NULL-in-NULL-out, but no corpus sweep had pushed NULL
# vectors through the REGISTERED plans), NULL `props` JSON and NULL
# `value` under valid event keys/timestamps. The modulo phases differ
# (7/5/4/6) so groups mix NULL and non-NULL payloads — the divergence
# engine is aggregate-vs-scalar NULL semantics (SUM skips NULLs, `+`
# propagates them), Spark's NULL-vs-DuckDB element access on NULL
# arrays, and string functions over NULL text.
_NULL_PAYLOAD_SQL = dict(
    _DEGEN_SQL,
    orders="SELECT * FROM src",
    lineitem="SELECT * FROM src",
    documents=(
        "SELECT doc_id,"
        " CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,"
        " lang, source,"
        " CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars"
        " FROM src"
    ),
    embeddings=(
        "SELECT vec_id,"
        " CASE WHEN vec_id % 5 = 0 THEN NULL ELSE embedding END"
        " AS embedding, label FROM src"
    ),
    events=(
        "SELECT event_id, ts, user_id, event_type,"
        " CASE WHEN event_id % 4 = 0 THEN NULL ELSE value END AS value,"
        " CASE WHEN event_id % 6 = 0 THEN NULL ELSE props END AS props"
        " FROM src"
    ),
)


def test_null_payload_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_nullpayload"))
    failures = _oracle_parity_sweep(spark, dst, _NULL_PAYLOAD_SQL)
    assert not failures, failures


# Extreme-key-skew corpus (round 8, ninth sweep): sweeps 1-8 poison the
# VALUES of keys and payloads; this one poisons their DISTRIBUTION —
# the dominant failure mode of a 100 TB shuffle. One customer owns 90%
# of orders, one part/supplier pair 90% of lineitems, one user 90% of
# events (90% of those the same event_type), HALF of all events share
# ONE literal timestamp (maximal order ties through every
# row_number/sessionize/as-of path), half the documents are one
# byte-identical text (a mega duplicate cluster through every
# minhash/shingle/cluster plan — one LSH band bucket holds n/2 docs),
# 90% of docs one lang+source, and 2/3 of embeddings are one constant
# vector under one hot label (a degenerate ANN/k-means cell). The
# divergence engines this hunts: nondeterministic tie-breaks under mass
# ties (engine-dependent sort stability), per-key state that assumed
# roughly-uniform group sizes, and candidate-pair generators whose
# bucket sizes go quadratic on a hot bucket. Parity is the same FULL
# gate as the other sweeps: every registered query runs AND every
# oracled query hash-matches DuckDB on this corpus.
_SKEW_SQL = dict(
    _DEGEN_SQL,
    orders=(
        "SELECT o_orderkey,"
        " CASE WHEN o_orderkey % 10 > 0 THEN 0 ELSE o_custkey END"
        " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        " FROM src"
    ),
    lineitem=(
        "SELECT l_orderkey,"
        " CASE WHEN l_orderkey % 10 > 0 THEN 0 ELSE l_partkey END"
        " AS l_partkey,"
        " CASE WHEN l_orderkey % 10 > 0 THEN 0 ELSE l_suppkey END"
        " AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM src"
    ),
    events=(
        "SELECT event_id,"
        " CASE WHEN event_id % 2 = 0 THEN TIMESTAMP '2024-01-15 12:00:00'"
        " ELSE ts END AS ts,"
        " CASE WHEN event_id % 10 > 0 THEN 0 ELSE user_id END AS user_id,"
        " CASE WHEN event_id % 10 > 0 THEN 'click' ELSE event_type END"
        " AS event_type,"
        " value, props FROM src"
    ),
    documents=(
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        "SELECT doc_id,"
        " CASE WHEN doc_id % 2 = 0"
        " THEN 'the quick brown fox jumps over the lazy dog'"
        " ELSE text END AS text,"
        " CASE WHEN doc_id % 10 > 0 THEN 'en' ELSE lang END AS lang,"
        " CASE WHEN doc_id % 10 > 0 THEN 'src0' ELSE source END AS source"
        " FROM src)"
    ),
    embeddings=(
        "SELECT vec_id,"
        " CASE WHEN vec_id % 3 > 0"
        " THEN list_transform(embedding, x -> CAST(0.25 AS FLOAT))"
        " ELSE embedding END AS embedding,"
        " CASE WHEN vec_id % 10 > 0 THEN 0 ELSE label END AS label"
        " FROM src"
    ),
)


def test_skew_corpus_full_oracle_parity(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_skew"))
    failures = _oracle_parity_sweep(spark, dst, _SKEW_SQL)
    assert not failures, failures


def test_fragmented_layout_full_oracle_parity(spark, tmp_path_factory):
    """Tenth sweep — the FILE-LAYOUT axis. At 100 TB every table is
    thousands of part files with wildly uneven sizes, stragglers, and
    the occasional zero-row file from a failed/empty task. Rebuild the
    sf0.001 corpus with every table as a DIRECTORY of parquet shards:
    one file holding ~half the rows, one ~quarter, five tiny slivers
    (reverse-ordered rows so no file is locally sorted), plus one
    schema-only EMPTY file. Data content is byte-identical to sf0.001,
    so this hunts layout sensitivity only: implicit file-order
    assumptions, empty-file scan handling, and partition-count-dependent
    results. Full-registry oracle parity, same gate as sweeps 1-9."""
    import duckdb

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_fragmented"))
    tables = list(_DEGEN_SQL)
    build = duckdb.connect()
    # uneven row buckets by rowid: [0,5)->shard0, [5,7)->1, singles 2..6
    cuts = [(0, 5), (5, 7), (7, 8), (8, 9), (9, 10)]
    for t in tables:
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT *,"
            f" row_number() OVER () AS _rid FROM '{src}/{t}.parquet'"
        )
        d = f"{dst}/{t}.parquet"
        import os

        os.makedirs(d, exist_ok=True)
        for i, (lo, hi) in enumerate(cuts):
            build.sql(
                f"COPY (SELECT * EXCLUDE (_rid) FROM src"
                f" WHERE _rid % 10 >= {lo} AND _rid % 10 < {hi}"
                f" ORDER BY _rid DESC)"
                f" TO '{d}/part-{i:02d}.parquet' (FORMAT PARQUET)"
            )
        build.sql(
            f"COPY (SELECT * EXCLUDE (_rid) FROM src LIMIT 0)"
            f" TO '{d}/part-empty.parquet' (FORMAT PARQUET)"
        )
    failures = _oracle_parity_check(
        spark, dst, {t: f"{dst}/{t}.parquet/*.parquet" for t in tables}
    )
    assert not failures, failures


def test_schema_drift_full_oracle_parity(spark, tmp_path_factory):
    """Eleventh sweep — the SCHEMA-DRIFT axis (S7, the reference's own
    load-bearing read option: ``mergeSchema=True`` at
    ``larmatch2d/larmatch_dataset.py:93``). At 100 TB a table's part
    files were written by different pipeline versions: columns appear
    and disappear, and column order is whatever each writer emitted.
    Rebuild sf0.001 with every table as a directory of 3 shards:
    shard0 = REVERSED column order, shard1 = a payload column DROPPED
    entirely (documents.n_chars, embeddings.embedding,
    events.{value,props} — the columns whose NULL semantics the
    eighth sweep pinned; mergeSchema materializes them as NULLs),
    shard2 = original layout. Spark reads with the engine's documented
    S7 conf (``spark.sql.parquet.mergeSchema``), DuckDB with
    ``union_by_name`` — full-registry oracle parity, same gate as
    sweeps 1-10. Width drift is deliberately NOT here: Spark's merge
    rejects it loudly (no numeric promotion) — that semantic is pinned
    by test_width_drift_loud_failure_and_repair below."""
    import os

    import duckdb

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_schemadrift"))
    tables = list(_DEGEN_SQL)
    drop_cols = {
        "documents": {"n_chars"},
        "embeddings": {"embedding"},
        "events": {"value", "props"},
    }
    build = duckdb.connect()
    for t in tables:
        cols = [
            r[0]
            for r in build.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT *,"
            f" row_number() OVER () AS _rid FROM '{src}/{t}.parquet'"
        )
        d = f"{dst}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        shards = [
            ", ".join(reversed(cols)),
            ", ".join(c for c in cols if c not in drop_cols.get(t, set())),
            ", ".join(cols),
        ]
        for i, proj in enumerate(shards):
            build.sql(
                f"COPY (SELECT {proj} FROM src WHERE _rid % 3 = {i})"
                f" TO '{d}/part-{i:02d}.parquet' (FORMAT PARQUET)"
            )
    spark.conf.set("spark.sql.parquet.mergeSchema", "true")
    try:
        failures = _oracle_parity_check(
            spark,
            dst,
            {
                t: f"read_parquet('{dst}/{t}.parquet/*.parquet',"
                f" union_by_name=true)"
                for t in tables
            },
        )
    finally:
        spark.conf.unset("spark.sql.parquet.mergeSchema")
    assert not failures, failures


def test_width_drift_loud_failure_and_repair(spark, tmp_path_factory):
    """Numeric WIDTH drift (int32-vs-int64, float-vs-double across part
    files — the writer-upgrade drift) is the schema-drift case the two
    engines genuinely disagree on: DuckDB's union_by_name silently
    widens, Spark's StructType.merge has no numeric promotion and
    throws. Pin BOTH halves of the engine's contract: (1) the stock S7
    read fails LOUDLY (never silently drops or corrupts a shard), and
    (2) the explicit repair path — io.read_parquet_widened, footer-
    grouped scans unioned under the widest common type — reproduces
    DuckDB's widening bit-for-bit on full table content."""
    import hashlib
    import os

    import duckdb
    import pytest

    from ubparquet_spark import io as uio

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_widthdrift"))
    d = f"{dst}/events.parquet"
    os.makedirs(d)
    build = duckdb.connect()
    build.sql(
        f"CREATE VIEW src AS SELECT *, row_number() OVER () AS _rid"
        f" FROM '{src}/events.parquet'"
    )
    build.sql(
        f"COPY (SELECT event_id, ts, CAST(user_id AS INTEGER) AS user_id,"
        f" event_type, CAST(value AS FLOAT) AS value, props FROM src"
        f" WHERE _rid % 2 = 0 AND user_id < 2147483647)"
        f" TO '{d}/part-00.parquet' (FORMAT PARQUET)"
    )
    build.sql(
        f"COPY (SELECT event_id, ts, user_id, event_type, value, props"
        f" FROM src WHERE _rid % 2 = 1)"
        f" TO '{d}/part-01.parquet' (FORMAT PARQUET)"
    )
    # (1) stock mergeSchema: loud failure, exact error class
    with pytest.raises(Exception, match="Failed to merge incompatible"):
        spark.read.option("mergeSchema", "true").parquet(d).schema
    # (2) repair path: widest-common-type union == DuckDB union_by_name
    got = uio.read_parquet_widened(spark, d)
    dt = dict(got.dtypes)
    assert dt["user_id"] == "bigint" and dt["value"] == "double"

    def vhash(p):
        p = p[sorted(p.columns)].sort_values(
            by=sorted(p.columns), ignore_index=True
        )
        return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()

    oracle = build.sql(
        f"SELECT * FROM read_parquet('{d}/*.parquet', union_by_name=true)"
    ).df()
    assert vhash(got.toPandas()) == vhash(oracle)


def test_widen_lattice():
    """The promotion lattice itself: same-family widening, cross-family
    numeric promotion to double, loud error on unrepairable drift."""
    import pytest

    from ubparquet_spark.io import _widen

    assert _widen("int", "bigint") == "bigint"
    assert _widen("tinyint", "smallint") == "smallint"
    assert _widen("float", "double") == "double"
    assert _widen("bigint", "float") == "double"
    assert _widen("string", "string") == "string"
    assert _widen("array<float>", "array<double>") == "array<double>"
    assert _widen("array<int>", "array<bigint>") == "array<bigint>"
    assert _widen("array<int>", "array<float>") == "array<double>"
    with pytest.raises(ValueError, match="cannot widen"):
        _widen("string", "bigint")
    with pytest.raises(ValueError, match="cannot widen"):
        _widen("array<string>", "array<bigint>")
    with pytest.raises(ValueError, match="cannot widen"):
        _widen("array<int>", "int")


def test_value_sanity_on_nan_inf_corpus(spark, tmp_path_factory):
    """q_value_sanity is the documented gate for the finite-money
    contract (the exact-cents convention fails LOUDLY on NaN/Inf in
    both engines — round-7 NaN probe): on a poisoned corpus it must
    itself run, hash-match its oracle, and count the corruption."""
    import hashlib

    import duckdb

    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_naninf"))
    build = duckdb.connect()
    specs = {
        "events": (
            "SELECT event_id, ts, user_id, event_type,"
            " CASE WHEN event_id % 19 = 0 THEN CAST('nan' AS DOUBLE)"
            "  WHEN event_id % 23 = 0 THEN CAST('inf' AS DOUBLE)"
            "  WHEN event_id % 29 = 0 THEN CAST('-inf' AS DOUBLE)"
            "  ELSE value END AS value, props FROM src"
        ),
        "orders": (
            "SELECT o_orderkey, o_custkey, o_orderstatus,"
            " CASE WHEN o_orderkey % 17 = 0 THEN CAST('nan' AS DOUBLE)"
            "  ELSE o_totalprice END AS o_totalprice,"
            " o_orderdate, o_orderpriority FROM src"
        ),
        "lineitem": "SELECT * FROM src",
    }
    for t, sql in specs.items():
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'"
        )
        build.sql(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con = duckdb.connect()
    for t in specs:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet'")

    pdf = entry.queries()["q_value_sanity"](spark, dst).toPandas()
    odf = con.sql(entry.oracle_sql()["q_value_sanity"]).df()

    def vhash(p):
        p = p[sorted(p.columns)].sort_values(
            by=sorted(p.columns), ignore_index=True
        )
        return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]

    assert vhash(pdf) == vhash(odf)
    ev = pdf[pdf.column_name == "value"].iloc[0]
    assert ev.n_nan > 0 and ev.n_posinf > 0 and ev.n_neginf > 0
    ord_ = pdf[pdf.column_name == "o_totalprice"].iloc[0]
    assert ord_.n_nan > 0 and ord_.n_posinf == 0
    li = pdf[pdf.column_name == "l_quantity"].iloc[0]
    assert li.n_nan == 0 and li.n_posinf == 0


def test_ref_integrity_on_orphan_corpus(spark, tmp_path_factory):
    """q_ref_integrity is the referential-contract gate (round 8): an
    orphan FK row silently vanishes from every inner join downstream,
    so the gate must count orphans and NULL FKs exactly — and
    hash-match its oracle — on a corpus with both injected."""
    import hashlib

    import duckdb

    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_orphans"))
    build = duckdb.connect()
    specs = {
        # orphan every 13th lineitem (point its order FK far out of range)
        # and NULL every 17th
        "lineitem": (
            "SELECT CASE WHEN l_orderkey % 17 = 0 THEN NULL"
            " WHEN l_orderkey % 13 = 0 THEN l_orderkey + 900000000"
            " ELSE l_orderkey END AS l_orderkey,"
            " l_partkey, l_suppkey, l_linenumber, l_quantity,"
            " l_extendedprice, l_discount, l_tax, l_returnflag,"
            " l_linestatus, l_shipdate FROM src"
        ),
        "orders": (
            "SELECT o_orderkey,"
            " CASE WHEN o_orderkey % 19 = 0 THEN o_custkey + 900000000"
            " ELSE o_custkey END AS o_custkey,"
            " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            " FROM src"
        ),
        "customer": "SELECT * FROM src",
        "supplier": "SELECT * FROM src",
        "nation": "SELECT * FROM src",
        "region": "SELECT * FROM src",
    }
    for t, sql in specs.items():
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'"
        )
        build.sql(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con = duckdb.connect()
    for t in specs:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet'")

    pdf = entry.queries()["q_ref_integrity"](spark, dst).toPandas()
    odf = con.sql(entry.oracle_sql()["q_ref_integrity"]).df()

    def vhash(p):
        p = p[sorted(p.columns)].sort_values(
            by=sorted(p.columns), ignore_index=True
        )
        return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]

    assert vhash(pdf) == vhash(odf)
    by_e = {r.fk_column: r for _, r in pdf.iterrows()}
    li = by_e["lineitem.l_orderkey"]
    assert li.n_orphan_rows > 0 and li.n_null_fk > 0
    assert li.n_orphan_keys <= li.n_orphan_rows
    assert by_e["orders.o_custkey"].n_orphan_rows > 0
    # untouched edges stay clean
    assert by_e["nation.n_regionkey"].n_orphan_rows == 0
    assert by_e["nation.n_regionkey"].n_null_fk == 0


def test_key_integrity_on_duplicate_row_corpus(spark, tmp_path_factory):
    """q_key_integrity is the uniqueness-contract gate (round-7
    duplicate-row probe: re-delivered duplicate PK rows make
    join-then-group vs group-then-join shapes legitimately diverge in
    11 queries — out of contract by design). On a corpus with injected
    re-deliveries the gate must hash-match its oracle and count the
    duplication exactly."""
    import hashlib

    import duckdb

    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_dupkeys"))
    build = duckdb.connect()
    specs = {
        "events": "SELECT * FROM src UNION ALL"
                  " SELECT * FROM src WHERE event_id % 7 = 0",
        "orders": "SELECT * FROM src UNION ALL"
                  " SELECT * FROM src WHERE o_orderkey % 11 = 0",
        "documents": "SELECT * FROM src UNION ALL"
                     " SELECT * FROM src WHERE doc_id % 9 = 0",
        "lineitem": "SELECT * FROM src",
        "customer": "SELECT * FROM src",
        "embeddings": "SELECT * FROM src",
    }
    for t, sql in specs.items():
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'"
        )
        build.sql(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con = duckdb.connect()
    for t in specs:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet'")

    pdf = entry.queries()["q_key_integrity"](spark, dst).toPandas()
    odf = con.sql(entry.oracle_sql()["q_key_integrity"]).df()

    def vhash(p):
        p = p[sorted(p.columns)].sort_values(
            by=sorted(p.columns), ignore_index=True
        )
        return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]

    assert vhash(pdf) == vhash(odf)
    by_t = {r.table_name: r for _, r in pdf.iterrows()}
    # every 7th of 1000 events re-delivered once: ceil counts from the data
    ev = by_t["events"]
    assert ev.n_dup_keys > 0 and ev.max_multiplicity == 2
    assert ev.n_rows == ev.n_keys + ev.n_dup_keys
    assert by_t["orders"].n_dup_keys > 0
    assert by_t["documents"].n_dup_keys > 0
    assert by_t["customer"].n_dup_keys == 0
    assert by_t["embeddings"].n_dup_keys == 0

def test_array_element_width_drift_loud_failure_and_repair(spark, tmp_path_factory):
    """ARRAY element-width drift (list<float> vs list<double>, list<int>
    vs list<bigint>) — for the reference's native tables this is the MOST
    likely drift: its data model is exactly array<primitive> + ``_shape``
    columns (``root2parquet.py:72-85``) read under ``mergeSchema``
    (``larmatch_dataset.py:93``). Pin the same two-sided contract as
    scalar width drift: (1) the stock S7 read fails LOUDLY, and (2)
    io.read_parquet_widened widens the ELEMENT type through the same
    lattice and reproduces DuckDB union_by_name on full content — then a
    codec reshape round-trips through the widened read."""
    import os

    import duckdb
    import numpy as np
    import pytest

    from ubparquet_spark import codec
    from ubparquet_spark import io as uio

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_arraydrift"))
    d = f"{dst}/embeddings.parquet"
    os.makedirs(d)
    build = duckdb.connect()
    build.sql(
        f"CREATE VIEW src AS SELECT *, row_number() OVER () AS _rid"
        f" FROM '{src}/embeddings.parquet'"
    )
    # shard0: original float32 elements, INTEGER[] shape column
    build.sql(
        f"COPY (SELECT vec_id, embedding,"
        f" [CAST(len(embedding) AS INTEGER)] AS embedding_shape, label"
        f" FROM src WHERE _rid % 2 = 0)"
        f" TO '{d}/part-00.parquet' (FORMAT PARQUET)"
    )
    # shard1: writer-upgrade drift — float64 elements, BIGINT[] shape
    build.sql(
        f"COPY (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding,"
        f" [len(embedding)] AS embedding_shape, label"
        f" FROM src WHERE _rid % 2 = 1)"
        f" TO '{d}/part-01.parquet' (FORMAT PARQUET)"
    )
    # (1) stock mergeSchema: loud failure, never a silently-corrupt merge
    with pytest.raises(Exception, match="Failed to merge incompatible"):
        spark.read.option("mergeSchema", "true").parquet(d).schema
    # (2) repair path widens the ELEMENT types
    got = uio.read_parquet_widened(spark, d)
    dt = dict(got.dtypes)
    assert dt["embedding"] == "array<double>"
    assert dt["embedding_shape"] == "array<bigint>"

    def rows(pdf):
        out = []
        for r in pdf.itertuples(index=False):
            out.append(
                tuple(
                    tuple(np.round(np.asarray(v, dtype="float64"), 9))
                    if isinstance(v, (list, np.ndarray))
                    else v
                    for v in r
                )
            )
        return sorted(out)

    oracle = build.sql(
        f"SELECT * FROM read_parquet('{d}/*.parquet', union_by_name=true)"
    ).df()
    gp = got.toPandas()
    assert list(sorted(gp.columns)) == list(sorted(oracle.columns))
    assert rows(gp[sorted(gp.columns)]) == rows(oracle[sorted(oracle.columns)])
    # codec round-trip through the widened read: flat + _shape -> ndarray
    row = got.orderBy("vec_id").limit(1).collect()[0]
    arr = codec.decode_ndarray(row.embedding, row.embedding_shape)
    assert arr.shape == (len(row.embedding),)
    assert np.allclose(arr, np.asarray(row.embedding))


def test_widened_read_rejects_tz_aware_timestamp_drift(spark, tmp_path_factory):
    """A tz-aware shard must NOT silently merge as timestamp_ntz — the
    cast shifts values by session timezone, which is corruption, not
    repair. read_parquet_widened keeps its loud-failure contract."""
    import os

    import duckdb
    import pytest

    from ubparquet_spark import io as uio

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_tzdrift"))
    d = f"{dst}/events.parquet"
    os.makedirs(d)
    build = duckdb.connect()
    build.sql("SET TimeZone='UTC'")
    build.sql(
        f"CREATE VIEW src AS SELECT *, row_number() OVER () AS _rid"
        f" FROM '{src}/events.parquet'"
    )
    build.sql(
        f"COPY (SELECT event_id, ts, user_id FROM src WHERE _rid % 2 = 0)"
        f" TO '{d}/part-00.parquet' (FORMAT PARQUET)"
    )
    build.sql(
        f"COPY (SELECT event_id, CAST(ts AS TIMESTAMPTZ) AS ts, user_id"
        f" FROM src WHERE _rid % 2 = 1)"
        f" TO '{d}/part-01.parquet' (FORMAT PARQUET)"
    )
    with pytest.raises(ValueError, match="tz-aware"):
        uio.read_parquet_widened(spark, d)

def test_decimal_precision_drift_repair(spark, tmp_path_factory):
    """DECIMAL precision drift at the same scale (decimal(12,2) vs
    decimal(18,2) — a writer tightening or widening money columns)
    repairs to the larger precision; SCALE drift stays unrepairable
    (it would change the value grid) and fails loudly."""
    import os

    import duckdb
    import pytest

    from ubparquet_spark import io as uio
    from ubparquet_spark.io import _widen

    assert _widen("decimal(12,2)", "decimal(18,2)") == "decimal(18,2)"
    with pytest.raises(ValueError, match="cannot widen"):
        _widen("decimal(18,2)", "decimal(18,4)")

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_decdrift"))
    d = f"{dst}/orders.parquet"
    os.makedirs(d)
    build = duckdb.connect()
    build.sql(
        f"CREATE VIEW src AS SELECT *, row_number() OVER () AS _rid"
        f" FROM '{src}/orders.parquet'"
    )
    build.sql(
        f"COPY (SELECT o_orderkey,"
        f" CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM src"
        f" WHERE _rid % 2 = 0 AND o_totalprice < 9999999999.99)"
        f" TO '{d}/part-00.parquet' (FORMAT PARQUET)"
    )
    build.sql(
        f"COPY (SELECT o_orderkey,"
        f" CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM src"
        f" WHERE _rid % 2 = 1)"
        f" TO '{d}/part-01.parquet' (FORMAT PARQUET)"
    )
    got = uio.read_parquet_widened(spark, d)
    assert dict(got.dtypes)["price"] == "decimal(18,2)"
    oracle = build.sql(
        f"SELECT SUM(price) AS s, COUNT(*) AS n FROM"
        f" read_parquet('{d}/*.parquet', union_by_name=true)"
    ).fetchone()
    from pyspark.sql import functions as F

    row = got.agg(F.sum("price").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert float(row["s"]) == float(oracle[0]) and row["n"] == oracle[1]
