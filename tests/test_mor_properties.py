"""Model-based property test for merge-on-read tables: a random sequence
of upsert batches applied through the MoR path must leave exactly the
state a plain dict (latest value per key) predicts — across merges,
interleaved compactions, and the bucketed layout."""

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.sinks.warehouse import Warehouse

# an upsert batch: keys 1..5 → small value space (None exercises null
# payloads crossing the reconcile window)
batch_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=5),
    st.sampled_from(["a", "b", "c", None]),
    min_size=1,
    max_size=4,
)

# after each batch: optionally tombstone-delete some keys, optionally
# fold the deltas
step_strategy = st.tuples(
    batch_strategy,
    st.sets(st.integers(min_value=1, max_value=5), max_size=2),
    st.booleans(),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(step_strategy, min_size=1, max_size=5), st.booleans())
def test_mor_matches_dict_model(spark, steps, bucketed):
    root = tempfile.mkdtemp(prefix="mor_prop_")
    try:
        wh = Warehouse(spark, root)
        model: dict = {}
        created = False
        for batch, deletes, do_compact in steps:
            df = spark.createDataFrame(
                [(k, v) for k, v in batch.items()], "id long, val string"
            )
            if not created:
                wh.create_or_replace(
                    "t",
                    df,
                    pk=["id"],
                    merge_on_read=True,
                    bucket_by=(["id"], 4) if bucketed else None,
                )
                created = True
            else:
                wh.merge("t", df, pk=["id"])
            model.update(batch)
            if deletes:
                wh.delete_keys("t", sorted(deletes))
                for k in deletes:
                    model.pop(k, None)
            if do_compact:
                wh.compact("t", target_file_bytes=1 << 30)
        got = {
            r["id"]: r["val"]
            for r in wh.read("t").select("id", "val").collect()
        }
        assert got == model
    finally:
        shutil.rmtree(root, ignore_errors=True)
