"""Text-analysis operators for training-data pipelines, all pure JVM
expressions (no Python in the hot path): token counting, quality scoring,
language-ID heuristic, fingerprinting, shingling, MinHash, SimHash.

These are the reusable DataFrame forms of the oracle-checked queries in
``plans/queries.py``; parameterized for production use (more hash functions,
64-bit SimHash, configurable shingle width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_PRIME = 2147483647

# 16 deterministic (a, b) pairs for minhash permutations (LCG constants).
MINHASH_COEFFS_16 = [
    (1, 0),
    (1103515245, 12345),
    (69069, 362437),
    (214013, 2531011),
    (134775813, 1),
    (22695477, 1),
    (1664525, 1013904223),
    (48271, 0),
    (16807, 0),
    (1588635695, 12345),
    (1223106847, 362437),
    (279470273, 0),
    (1583458089, 2531011),
    (784588716, 1),
    (1004703469, 1013904223),
    (741103597, 0),
]


def hash60(col: str | Column) -> Column:
    """Deterministic 60-bit integer hash of a string (md5-derived, identical
    to the DuckDB-oracle arithmetic)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def token_count(text: str | Column = "text") -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.length(c) - F.length(F.regexp_replace(c, " ", "")) + 1


# BPE-style pre-tokenization classes: letter runs, digit runs, single
# punctuation marks (whitespace is the separator, never a token). The same
# RE2/Java-compatible pattern drives the DuckDB oracle.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(text: str | Column = "text") -> Column:
    """Token count under BPE-ish pre-tokenization — the LLM-pipeline
    budget estimator (whitespace count underestimates punctuation-heavy
    text). Pure JVM ``regexp_count``."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("long")


# PII classes for corpus scrubbing. Patterns are restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle): no
# backrefs, no lookaround.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phone": "\\+?\\d[\\d\\- ]{7,}\\d",
}


def pii_counts(text: str | Column = "text") -> Column:
    """Struct of per-class PII match counts — the audit signal a pipeline
    aggregates before deciding to redact. Codegen'd ``regexp_count``."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.struct(
        *[
            F.regexp_count(c, F.lit(p)).cast("long").alias(name)
            for name, p in PII_PATTERNS.items()
        ]
    )


def pii_redact(
    text: str | Column = "text",
    classes: list[str] | None = None,
    replacement: str = "[PII]",
) -> Column:
    """Replace every PII match with ``replacement``. Classes apply in
    PII_PATTERNS order (email before phone, so digits inside an already
    redacted email can't double-match). JVM ``regexp_replace`` only —
    safe in the 100 TB hot path."""
    c = text if isinstance(text, Column) else F.col(text)
    # apply in PII_PATTERNS order regardless of the caller's list order —
    # the declared order is the anti-double-match guarantee (a phone
    # pattern run first would eat digits inside a not-yet-redacted email)
    wanted = set(classes) if classes else set(PII_PATTERNS)
    for name in PII_PATTERNS:
        if name in wanted:
            c = F.regexp_replace(c, PII_PATTERNS[name], replacement)
    return c


def occurrence_count(text: Column, needle: str) -> Column:
    return (
        (F.length(text) - F.length(F.regexp_replace(text, needle, "")))
        / F.lit(len(needle))
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword features + a combined quality score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.regexp_replace(c, "\\.", ""), ",", "")
    )
    n_stop = occurrence_count(c, " the ")
    score = (
        F.when(n_chars.between(100, 2000), F.lit(1.0)).otherwise(0.5)
        * (1.0 - n_punct.cast("double") / n_chars)
    )
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        n_punct.alias("q_n_punct"),
        n_stop.alias("q_n_stopwords"),
        F.round(score, 4).alias("q_score"),
    )


LANG_MARKERS = [("en", " the "), ("fr", " le "), ("es", " el "), ("de", " der ")]


def lang_guess(text: str | Column = "text") -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    expr = None
    for lang, marker in LANG_MARKERS:
        cond = F.instr(c, marker) > 0
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unk"))


def fingerprint(text: str | Column = "text") -> Column:
    """Content fingerprint for exact dedup (md5 of the raw text)."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.md5(c)


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
) -> DataFrame:
    """Character n-gram shingling: one row per (id, shingle position)."""
    pos = df.select(
        id_col,
        text_col,
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(text_col) - F.lit(width - 1), F.lit(1)),
            )
        ).alias("i"),
    )
    return pos.select(
        id_col, F.expr(f"substring({text_col}, i, {width})").alias("sh")
    )


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "sh",
    n_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per id: min over shingles of (a·h+b) mod p for
    ``n_hashes`` deterministic permutations. One shuffle (the groupBy),
    map-side partial mins."""
    coeffs = MINHASH_COEFFS_16[:n_hashes]
    h = shingle_df.withColumn(
        "__h", hash60(shingle_col) % F.lit(MINHASH_PRIME)
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(coeffs)
    ]
    return h.groupBy(id_col).agg(*aggs)


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Long-form LSH banding: one (id, band_key) row per band of
    ``band_size`` consecutive signature components. The single shared
    implementation of the key construction — ``minhash_lsh_candidates``
    and the persistent ``MinHashDedupIndex`` both build on it, so an
    index probe reproduces the in-memory LSH bit-for-bit."""
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        key = F.concat_ws(
            "_",
            F.lit(b),
            *[
                F.col(f"mh{b * band_size + j}").cast("string")
                for j in range(band_size)
            ],
        )
        bands.append(
            signatures.select(F.col(id_col).alias("id"), key.alias("band_key"))
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into bands of ``band_size`` rows;
    ids sharing any full band are candidate near-dups. The band join is an
    equi-join on a single synthetic key — shuffle only the (id, band_key)
    projection, never documents."""
    all_bands = band_keys(
        signatures, id_col=id_col, n_hashes=n_hashes, band_size=band_size
    )
    a = all_bands.alias("a")
    b2 = all_bands.alias("b")
    return (
        a.join(b2, F.col("a.band_key") == F.col("b.band_key"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )


def simhash(
    token_df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "tok",
    n_bits: int = 48,
) -> DataFrame:
    """SimHash fingerprint: per-bit vote over token hashes (n_bits ≤ 60,
    the width of hash60). Single groupBy; the conditional sums are one
    aggregate pass (whole-stage codegen)."""
    if not 1 <= n_bits <= 60:
        raise ValueError("n_bits must be in [1, 60]")
    h = token_df.withColumn("__h", hash60(token_col))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(__h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"__b{j}")
        for j in range(n_bits)
    ]
    votes = h.groupBy(id_col).agg(*bit_aggs)
    sim: Column | None = None
    for j in range(n_bits):
        term = F.when(F.col(f"__b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(id_col, sim.cast("long").alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR — SimHash near-dup distance."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    n_bits: int = 48,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via **pigeonhole banding** — the scale path.

    The naive formulation is an O(n²) cross join (``a.id < b.id`` is not an
    equi-key, so Spark must Cartesian). Instead: split the fingerprint into
    ``max_hamming + 1`` disjoint bit-bands; any pair within hamming distance
    ``max_hamming`` differs in at most ``max_hamming`` bands, so by
    pigeonhole it agrees **exactly** on at least one band. Candidate pairs
    come from a shuffle-hash equi-join on ``(band_idx, band_val)`` — cost
    proportional to collisions, not n² — and the exact popcount filter then
    removes false candidates. Exact same result set as brute force.

    At 100 TB: only ``(id, simhash, band_val)`` triples shuffle (never
    text); hot bands (e.g. the all-zeros band of short docs) are the skew
    risk — pre-filter degenerate fingerprints or raise ``n_bits``.
    """
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= n_bits:
        raise ValueError("need 0 <= max_hamming < n_bits")
    base, extra = divmod(n_bits, n_bands)
    bands = []
    lo = 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        mask = ((1 << width) - 1) << lo
        bands.append(
            F.struct(
                F.lit(i).alias("band"),
                F.col(sim_col).bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
        lo += width
    exploded = sig_df.select(
        id_col, sim_col, F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, sim_col, "bk.band", "bk.val")
    a, b = exploded.alias("a"), exploded.alias("b")
    ham = hamming_distance(
        F.col(f"a.{sim_col}"), F.col(f"b.{sim_col}")
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return (
        df.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    distinct: bool = True,
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing fingerprint rows (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): one (id, fp) row per distinct selected k-gram hash. Any two
    documents sharing a substring of length ≥ k+w-1 share a fingerprint
    (property-tested in tests/test_winnow_properties.py).

    Pass ``distinct=False`` to skip the (id, fp) dedup shuffle when the
    caller aggregates per id anyway (the window's id partitioning then
    flows into the aggregate with no further exchange) — repeats of one
    fingerprint value within a document are possible in that mode.

    Shuffle/compute shape (the window needs a hash exchange on the id
    either way, so we place it where it is cheapest):

    - **Repartition the compact documents first**, then explode: the
      exchange ships one row per document instead of one row per gram
      (~300× fewer shuffle rows here), and the gram hashing fans out
      across the whole cluster even when the input is a handful of
      parquet files — without this, a small-file scan hashes every gram
      in one task while 31 cores idle.
    - **Hash row-wise after exploding positions**, not inside a
      ``transform(sequence(...), i -> …)`` lambda: higher-order-function
      lambdas are interpreted per element, while a plain projection after
      ``explode(sequence(...))`` stays in whole-stage codegen — measured
      ~3× faster on the same data. (Exploding a pre-winnowed *array*
      is worse still: the optimizer inlines the window lambda into
      Generate and recomputes the gram array per window — measured 40×
      slower.)
    - The rows-frame window min then reuses the repartitioning (no
      second exchange) and is linear in document length, so no key can
      run hot.

    ``hash_fn='md5'`` (default) matches the DuckDB-oracle arithmetic;
    ``hash_fn='xxhash64'`` is ~1.5× faster end-to-end (no cryptographic
    digest per gram) — prefer it in production where cross-engine hash
    parity is not needed.
    """
    from pyspark.sql import Window

    if hash_fn == "md5":
        gram_hash = (
            f"cast(conv(substring(md5(substring({text_col}, i, {k})), 1, 15),"
            " 16, 10) as bigint)"
        )
    elif hash_fn == "xxhash64":
        gram_hash = f"xxhash64(substring({text_col}, i, {k}))"
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    # explicit partition count: the doc-level exchange is tiny in bytes,
    # and AQE would otherwise coalesce it to one partition — serializing
    # the gram hashing, the expensive stage this shuffle exists to spread.
    # The count SCALES WITH THE CORPUS, not just the core count: the
    # per-doc window sorts each partition by (doc_id, i), so a fixed
    # partition count makes that sort grow (and eventually spill)
    # linearly with the data. Sizing comes FREE from Catalyst's plan
    # statistics (parquet footers) — no extra job; ~4 MB of source per
    # partition ≈ a few-million-row in-memory sort run.
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size_bytes = 0
    if 0 < size_bytes < 1 << 50:  # huge sentinel = stats unknown
        par = max(par, min(4096, 1 + size_bytes // (4 << 20)))
    pre = df.repartition(par, id_col)
    # gram count derives from length(text) at scan time — carrying it
    # through the explode avoids a second Window pass (count(*) over the
    # unordered partition would not fuse with the ordered rolling frame)
    hashed = (
        pre.select(
            id_col,
            text_col,
            F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(1)).alias("__m"),
        )
        .select(
            id_col,
            text_col,
            "__m",
            F.explode(F.sequence(F.lit(1), F.col("__m"))).alias("i"),
        )
        .select(id_col, "__m", "i", F.expr(gram_hash).alias("h"))
    )
    roll = Window.partitionBy(id_col).orderBy("i").rowsBetween(-(w - 1), 0)
    out = (
        hashed.withColumn("wmin", F.min("h").over(roll))
        .filter(F.col("i") >= F.least(F.lit(w), F.col("__m")))
        .select(id_col, F.col("wmin").alias("fp"))
    )
    return out.distinct() if distinct else out
