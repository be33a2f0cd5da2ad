"""Shared SQL fragments used by both query catalogs (queries / analytics).

Lives in its own module so the catalogs don't import each other at module
scope (queries.py registers analytics' EXTRA_QUERIES at its bottom)."""

# character 8-gram shingling over documents (DuckDB form); Spark twin is
# queries._shingles
_SHINGLE_DUCK = """
  SELECT d.doc_id, substr(d.text, g.i::INT, 8) AS sh
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length(d.text) - 7, 1))) AS i) g
  WHERE d.doc_id < {max_doc}
"""


# MinHash building blocks shared by queries.py (signatures, LSH pairs) and
# analytics.py (LSH-verified fuzzy dedup) — here so neither catalog module
# imports the other at module scope.
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_COEFFS = [(1, 0), (1103515245, 12345), (69069, 362437), (214013, 2531011)]

_SPARK_H = "cast(conv(substr(md5({col}),1,15),16,10) as bigint) % 2147483647"
_DUCK_H = "(('0x' || substr(md5({col}),1,15))::UBIGINT::BIGINT) % 2147483647"

_MH_COLS_DUCK = ", ".join(
    f"CAST(min(({a} * h + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{i}"
    for i, (a, b) in enumerate(MINHASH_COEFFS)
)
DOC_MINHASH_DUCK = f"""
SELECT doc_id, {_MH_COLS_DUCK}
FROM (SELECT doc_id, {_DUCK_H.format(col="sh")} AS h
      FROM ({_SHINGLE_DUCK.format(max_doc=50)}))
GROUP BY doc_id
"""

DOC_LSH_PAIRS_DUCK = f"""
WITH sig AS ({DOC_MINHASH_DUCK}),
bands AS (
  SELECT doc_id, 0 AS band, mh0 AS x FROM sig
  UNION ALL SELECT doc_id, 1 AS band, mh1 AS x FROM sig
  UNION ALL SELECT doc_id, 2 AS band, mh2 AS x FROM sig
  UNION ALL SELECT doc_id, 3 AS band, mh3 AS x FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.x = b.x AND a.doc_id < b.doc_id
"""
