"""Packing/chunking/mixture plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import packing

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(packing.QUERIES))
def test_packing_query_matches_oracle(spark, sf_dir, name):
    fn, sql = packing.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Every token lands in exactly one sequence: sum over sequences equals
    the corpus token count, every non-final sequence is exactly full, and a
    sequence with a carried-over doc must start mid-document."""
    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table

    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(F.split("text", " ")).cast("long")).alias("t"))
        .first()["t"]
    )
    rows = packing.q_pack_sequences(spark, sf_dir).orderBy("seq_id").collect()
    assert sum(r.n_tokens for r in rows) == total
    assert all(r.n_tokens == packing.SEQ_LEN for r in rows[:-1])
    assert rows[-1].n_tokens <= packing.SEQ_LEN
    # seq_ids are dense from 0
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    # first sequence cannot carry anything over
    assert rows[0].n_carryover == 0


def test_chunk_overlap_covers_doc(spark, sf_dir):
    """Chunks tile each doc: chunk i starts at i*stride+1, its length is
    clamped at the doc end, the last chunk reaches exactly token n, and the
    chunk count matches ceil arithmetic."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table

    S, C = packing.CHUNK_STRIDE, packing.CHUNK_TOKENS
    rows = packing.q_chunk_overlap(spark, sf_dir).collect()
    n_by_doc = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))
        .collect()
    }
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    assert set(per_doc) == set(n_by_doc)
    for doc_id, chunks in per_doc.items():
        n = n_by_doc[doc_id]
        assert len(chunks) == (n - 1) // S + 1
        for r in chunks:
            start = r.chunk_id * S + 1
            assert r.chunk_len == min(C, n - start + 1), (doc_id, r, n)
        assert max(r.chunk_id * S + r.chunk_len for r in chunks) == n
