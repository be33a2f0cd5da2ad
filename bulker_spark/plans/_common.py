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


# --- low-cardinality-window routing (r08) ---------------------------------
#
# Several catalog queries aggregate/rank the raw corpus inside a window
# PARTITIONED BY a single-digit-cardinality key (lang, source): correct,
# and fastest at test scale, but at corpus scale each key is 1/|keys| of
# the data sorted in ONE task. Their scale-safe twins read the same stats
# off a map-side (key, value) histogram — a few extra stages that cost
# ~0.1-0.2 s of fixed overhead locally. Route by INPUT SIZE, the same
# adaptive discipline as spark.bulker.hotkey.mode (verdict r7 #2: shape
# insurance must be free when it isn't needed):
#
#   spark.bulker.lowcard.mode  = auto | histogram | window
#   spark.bulker.lowcard.bytes = size threshold for auto (default 1 GiB)
#
# Both shapes are bit-identical (pinned by tests + the strict oracle);
# `auto` picks the naive window below the threshold and the histogram
# above it, and falls back to the histogram (the insurance) when the
# input size cannot be determined.

LOWCARD_MODE_CONF = "spark.bulker.lowcard.mode"
LOWCARD_BYTES_CONF = "spark.bulker.lowcard.bytes"


def path_bytes(spark, path: str) -> int:
    """On-storage size of a file/directory through the Hadoop FS layer
    (works for hdfs://, s3a://, local), with a pure-local fallback."""
    import os

    try:
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(p).getLength())
    except Exception:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
        return total


def _size_route(
    spark,
    path: str,
    mode_conf: str,
    bytes_conf: str,
    big_mode: str,
    small_mode: str,
) -> bool:
    """Shared size-threshold router: True → the scale-safe ("big") shape,
    False → the shape that is faster at bench scale. ``mode_conf`` forces
    either route; ``auto`` compares the input's on-storage size against
    ``bytes_conf`` (default 1 GiB) and keeps the scale-safe shape when the
    size cannot be determined (insurance)."""
    mode = (spark.conf.get(mode_conf, "auto") or "auto").lower()
    if mode == big_mode:
        return True
    if mode == small_mode:
        return False
    if mode != "auto":
        raise ValueError(
            f"{mode_conf} must be auto|{big_mode}|{small_mode}, got {mode!r}"
        )
    try:
        thresh = int(
            spark.conf.get(bytes_conf, str(1 << 30)) or (1 << 30)
        )
    except ValueError:
        thresh = 1 << 30
    try:
        return path_bytes(spark, path) >= thresh
    except Exception:
        return True  # unknown size: keep the insurance


def lowcard_histogram_route(spark, path: str) -> bool:
    """True → use the histogram shape for a low-cardinality-key window
    over the corpus at ``path``; False → the naive window."""
    return _size_route(
        spark, path, LOWCARD_MODE_CONF, LOWCARD_BYTES_CONF,
        "histogram", "window",
    )


# --- PQ scan-fuse routing (r09) --------------------------------------------
#
# The r08 PQ scan fuse (emb_pq_ivf_adc / emb_pq_ivf_residual) removes the
# corpus-scale ``codes ⋈ cand ON vec_id`` join — the term that shuffles the
# corpus by vec_id twice once the candidate set outgrows broadcast — by
# computing cell assignment and PQ codes in ONE projection of ONE scan.
# That is the 100 TB shape, but at bench scale (600 MB, candidates easily
# broadcast) the fused plan measured ~3x slower than the two-scan shape
# (driver r08: 0.686 → 2.045 s). Route by INPUT SIZE, the same discipline
# as spark.bulker.lowcard.mode: small corpora keep the join shape, big
# corpora get the fuse. Both shapes are strict-oracle-verified.
#
#   spark.bulker.pqfuse.mode  = auto | fused | join
#   spark.bulker.pqfuse.bytes = size threshold for auto (default 1 GiB)

PQFUSE_MODE_CONF = "spark.bulker.pqfuse.mode"
PQFUSE_BYTES_CONF = "spark.bulker.pqfuse.bytes"


def pq_fused_route(spark, path: str) -> bool:
    """True → the fused one-scan / zero-corpus-join IVF+PQ shape; False →
    the two-scan + broadcast ``cand ⋈ codes ON vec_id`` shape (faster at
    bench scale)."""
    return _size_route(
        spark, path, PQFUSE_MODE_CONF, PQFUSE_BYTES_CONF, "fused", "join"
    )
