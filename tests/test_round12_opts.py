"""Round-12 optimization guards: assumptions and differentials for
this round's changes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_documents_doc_id_unique_nonnull():
    """q_doc_langid returns classify_language_scores output (one row
    per distinct non-NULL doc_id) where the DuckDB oracle emits one
    row per documents row — equivalent iff documents.doc_id is a
    unique non-NULL key. Assert that contract at the oracle-check
    scales so a future corpus change cannot silently break the
    equivalence (round-11 ADVICE)."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n, nd, nn = duckdb.sql(
            f"SELECT count(*), count(DISTINCT doc_id), count(doc_id) "
            f"FROM '{sf}/documents.parquet'"
        ).fetchone()
        assert n == nd == nn, (sf, n, nd, nn)
