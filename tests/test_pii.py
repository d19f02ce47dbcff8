"""PII redaction: pattern coverage, ordering, counts, idempotency."""

from __future__ import annotations

import pytest

from ubparquet_spark.functions import pii

ROWS = [
    (0, "contact me at jane.doe+spam@example.co.uk for details"),
    (1, "call 555-867-5309 or 555.867.5309 tomorrow"),
    (2, "server at 192.168.1.254 timed out"),
    (3, "ssn 078-05-1120 on file"),
    (4, "card 4111111111111111 declined"),
    (5, "plain text with no identifiers at all"),
    (6, "multi: a@b.io then 10.0.0.1 then 078-05-1120"),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_each_pattern_redacts(docs):
    out = {
        r.doc_id: r.text
        for r in pii.scrub_text(docs, with_counts=False).collect()
    }
    assert out[0] == "contact me at <EMAIL> for details"
    assert out[1] == "call <PHONE> or <PHONE> tomorrow"
    assert out[2] == "server at <IP> timed out"
    assert out[3] == "ssn <SSN> on file"
    assert out[4] == "card <CARD> declined"
    assert out[5] == ROWS[5][1]
    assert out[6] == "multi: <EMAIL> then <IP> then <SSN>"
    assert out[7] == ""


def test_counts_against_original(docs):
    rows = {r.doc_id: r for r in pii.scrub_text(docs).collect()}
    assert rows[1].n_phone == 2
    assert rows[6].n_email == 1 and rows[6].n_ipv4 == 1 and rows[6].n_ssn == 1
    assert rows[5].n_email == rows[5].n_phone == rows[5].n_card == 0
    # SSN's 3-2-4 digit shape does NOT match the 3-3-4 phone pattern, and
    # the SSN rule runs first anyway — <SSN> wins regardless
    assert rows[3].n_ssn == 1 and rows[3].n_phone == 0
    assert rows[3].text == "ssn <SSN> on file"


def test_separator_tolerant_formats(spark):
    rows = [
        (0, "card 4111-1111-1111-1111 declined"),
        (1, "card 4111 1111 1111 1111 declined"),
        (2, "call 5558675309 now"),
        (3, "call (555) 867-5309 now"),
        (4, "call +1 555-867-5309 now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pii.scrub_text(df).collect()}
    # grouped cards redact as CARD, not as a phone fragment (card runs first)
    assert out[0].text == "card <CARD> declined" and out[0].n_card == 1
    assert out[1].text == "card <CARD> declined" and out[1].n_card == 1
    assert out[0].n_phone == 0 and out[1].n_phone == 0
    # bare 10-digit, parenthesized area code, +1 prefix
    assert out[2].text == "call <PHONE> now" and out[2].n_phone == 1
    assert out[3].text == "call <PHONE> now" and out[3].n_phone == 1
    assert out[4].text == "call <PHONE> now" and out[4].n_phone == 1


def test_idempotent(docs):
    once = pii.scrub_text(docs, with_counts=False)
    twice = pii.scrub_text(once, with_counts=False)
    assert [r.text for r in once.orderBy("doc_id").collect()] == [
        r.text for r in twice.orderBy("doc_id").collect()
    ]


def test_out_col_preserves_original(docs):
    out = pii.scrub_text(docs, out_col="clean", with_counts=False)
    r = {x.doc_id: x for x in out.collect()}[0]
    assert "@example.co.uk" in r.text and r.clean.count("<EMAIL>") == 1


def test_no_python_udf_in_plan(docs):
    plan = pii.scrub_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_patterns_sql_safe():
    """The generated DuckDB oracle embeds patterns in single-quoted
    literals and relies on the Java∩RE2 dialect convention; pin both so
    a future pattern can't silently break the oracle (ADVICE r8)."""
    import re

    import duckdb

    from ubparquet_spark.plans.text import _sq

    # escaping helper actually escapes
    assert _sq("O'Brien's") == "O''Brien''s"

    con = duckdb.connect()
    for name, pat, repl in pii.PII_PATTERNS:
        # quote-free today (so _sq is a no-op safety net, not load-bearing)
        assert "'" not in pat and "'" not in repl, name
        # constructs RE2 lacks must not appear (Java would accept them and
        # the DuckDB twin would silently diverge or error)
        for bad in ("(?=", "(?!", "(?<", "\\1", "(?>", "*+", "++", "?+"):
            assert bad not in pat, (name, bad)
        # compiles under Python re (Java-syntax sanity proxy) ...
        re.compile(pat)
        # ... and under DuckDB's RE2, via the same embedding _pii_sql uses
        con.execute(
            f"SELECT regexp_matches('probe 555-867-5309', '{_sq(pat)}')"
        ).fetchall()
    con.close()
