"""Round-12 measurement probe (VERDICT item 8): how many candidate
pairs would PPJoin-style prefix filtering leave for doc_ngram_jaccard
(min_jaccard t) versus the current any-shared-shingle inverted index?

Prefix filter, global order = ascending sh_hash: a pair with
|A∩B| / |A∪B| ≥ t must satisfy |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, so each doc
only needs to index its first |S| − ⌈t·|S|⌉ + 1 shingles in the global
order — any qualifying pair shares at least one shingle with BOTH
occurrences inside the prefixes. The probe counts, in DuckDB (same
shingle definition as the oracle):

- current candidate DISTINCT pairs (share ≥1 shingle anywhere) and the
  pre-aggregation join rows they cost;
- prefix candidate DISTINCT pairs (share ≥1 shingle with both sides'
  copies in-prefix) and their join rows;
- true result pairs (jaccard ≥ t) — the floor any candidate set must
  contain.

Pure measurement — adopt the filter only if the reduction is large
enough to pay for the verification step (candidates need their true
intersection, i.e. an array re-attach or set re-join).
"""

from __future__ import annotations

import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_big/sf1"
T = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
con.execute(
    """
CREATE TEMP TABLE hashed AS
WITH __tok AS (
  SELECT doc_id, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks FROM documents
),
__sh AS (
  SELECT DISTINCT doc_id, sh AS shingle
  FROM __tok, UNNEST(
    list_transform(
      range(1, greatest(len(toks) - 2, 1) + 1),
      i -> array_to_string(toks[i:i+2], ' ')
    )
  ) AS t(sh)
)
SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS sh_hash FROM __sh
"""
)
con.execute(
    "CREATE TEMP TABLE sizes AS SELECT doc_id, count(*) AS n_sh FROM hashed GROUP BY doc_id"
)
con.execute(
    f"""
CREATE TEMP TABLE prefix AS
SELECT h.doc_id, h.sh_hash
FROM (SELECT doc_id, sh_hash,
             row_number() OVER (PARTITION BY doc_id ORDER BY sh_hash) AS rk
      FROM hashed) h
JOIN sizes s ON h.doc_id = s.doc_id
WHERE h.rk <= s.n_sh - ceil({T} * s.n_sh) + 1
"""
)

t0 = time.time()
cur_rows, cur_pairs = con.execute(
    """
SELECT count(*) AS join_rows, count(DISTINCT (a.doc_id, b.doc_id)) AS pairs
FROM hashed a JOIN hashed b ON a.sh_hash = b.sh_hash AND a.doc_id < b.doc_id
"""
).fetchone()
t_cur = time.time() - t0

t0 = time.time()
pre_rows, pre_pairs = con.execute(
    """
SELECT count(*) AS join_rows, count(DISTINCT (a.doc_id, b.doc_id)) AS pairs
FROM prefix a JOIN prefix b ON a.sh_hash = b.sh_hash AND a.doc_id < b.doc_id
"""
).fetchone()
t_pre = time.time() - t0

true_pairs = con.execute(
    f"""
SELECT count(*) FROM (
  SELECT a.doc_id, b.doc_id
  FROM hashed a JOIN hashed b ON a.sh_hash = b.sh_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {T} * (
    (SELECT n_sh FROM sizes WHERE doc_id = a.doc_id)
    + (SELECT n_sh FROM sizes WHERE doc_id = b.doc_id) - count(*))
)
"""
).fetchone()[0]

n_sh_rows = con.execute("SELECT count(*) FROM hashed").fetchone()[0]
n_pre_rows = con.execute("SELECT count(*) FROM prefix").fetchone()[0]
print(f"sf_dir={SF} t={T}")
print(f"shingle rows: full={n_sh_rows} prefix={n_pre_rows} ({n_pre_rows/n_sh_rows:.1%})")
print(f"current : join_rows={cur_rows} distinct_pairs={cur_pairs} ({t_cur:.1f}s)")
print(f"prefix  : join_rows={pre_rows} distinct_pairs={pre_pairs} ({t_pre:.1f}s)")
print(f"true result pairs (j>={T}): {true_pairs}")
print(f"candidate reduction: pairs {cur_pairs/max(pre_pairs,1):.2f}x, join rows {cur_rows/max(pre_rows,1):.2f}x")
