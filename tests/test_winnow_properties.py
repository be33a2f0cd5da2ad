"""Property-based tests (hypothesis) for winnowing fingerprints.

The winnowing guarantee (Schleimer/Wilkerson/Aiken §2): if two documents
share a substring of length ≥ k + w - 1, their fingerprint sets intersect.
We check the pure-Python model under hypothesis (hundreds of adversarial
examples, no Spark startup per case) and then pin the Spark query to the
model on one constructed corpus, so the guarantee transfers to the
distributed implementation.
"""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.plans.analytics import WINNOW_K, WINNOW_W

K, W = WINNOW_K, WINNOW_W


def _h(gram: str) -> int:
    # same arithmetic as the Spark expr and the DuckDB oracle:
    # first 15 hex chars of md5, read base-16
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def winnow_model(text: str) -> set[int]:
    n = max(len(text) - (K - 1), 1)
    hashes = [_h(text[i : i + K]) for i in range(n)]
    m = len(hashes)
    out = set()
    for j in range(min(W, m) - 1, m):
        lo = max(j - (W - 1), 0)
        out.add(min(hashes[lo : j + 1]))
    return out


# alphabet kept tiny so hypothesis finds collisions/overlaps quickly
texts = st.text(alphabet="ab ", min_size=0, max_size=60)


@given(texts)
@settings(max_examples=300)
def test_model_nonempty_and_bounded(t):
    fps = winnow_model(t)
    n_windows = max(max(len(t) - (K - 1), 1) - (W - 1), 1)
    assert 1 <= len(fps) <= n_windows


@given(texts, texts, st.text(alphabet="ab ", min_size=K + W - 1, max_size=30))
@settings(max_examples=300)
def test_shared_substring_shares_fingerprint(prefix_a, prefix_b, shared):
    """The winnowing guarantee: substring of length ≥ k+w-1 ⇒ common
    fingerprint — regardless of what surrounds it."""
    a = prefix_a + shared
    b = prefix_b + shared
    assert winnow_model(a) & winnow_model(b)


@given(texts)
@settings(max_examples=200)
def test_fingerprints_subset_of_gram_hashes(t):
    n = max(len(t) - (K - 1), 1)
    grams = {_h(t[i : i + K]) for i in range(n)}
    assert winnow_model(t) <= grams


def test_spark_query_matches_model(spark, tmp_path):
    """Pin the distributed implementation to the verified model."""
    import pandas as pd

    corpus = [
        "",  # degenerate: shorter than one gram
        "abab",  # shorter than one window
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "prefix // the quick brown fox jumps // suffix",  # shared substring
        "a" * 50,  # single repeated gram
        "x" * 7 + "y" * 30,
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(corpus)), "text": corpus}
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    from bulker_spark.plans.analytics import doc_winnow_fingerprint

    rows = doc_winnow_fingerprint(spark, str(tmp_path)).collect()
    assert len(rows) == len(corpus)
    for r in rows:
        fps = winnow_model(corpus[r["doc_id"]])
        assert r["n_fp"] == len(fps), corpus[r["doc_id"]]
        assert r["fp_min"] == min(fps)
        assert r["fp_max"] == max(fps)


def test_library_function_distinct_rows(spark, tmp_path):
    """winnow_fingerprints(distinct=True) returns exactly the model's
    fingerprint set as rows."""
    import pandas as pd

    from bulker_spark.functions.text import winnow_fingerprints

    corpus = ["abcabcabc", "the quick brown fox", "a" * 20]
    pdf = pd.DataFrame({"doc_id": range(len(corpus)), "text": corpus})
    df = spark.createDataFrame(pdf)
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got == {i: winnow_model(t) for i, t in enumerate(corpus)}


def test_xxhash_variant_same_structure(spark, tmp_path):
    """The xxhash64 production path selects the same *positions* (different
    hash values, but fingerprint-count within one doc of the md5 path's
    count, and identical docs still collide)."""
    import pandas as pd

    from bulker_spark.functions.text import winnow_fingerprints

    corpus = ["the quick brown fox", "the quick brown fox", "zzz unrelated"]
    pdf = pd.DataFrame({"doc_id": range(len(corpus)), "text": corpus})
    df = spark.createDataFrame(pdf)
    rows = winnow_fingerprints(df, k=K, w=W, hash_fn="xxhash64").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_id[0] == by_id[1]  # exact dups share everything
    assert not (by_id[0] & by_id[2])  # unrelated text shares nothing
