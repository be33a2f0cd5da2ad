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
