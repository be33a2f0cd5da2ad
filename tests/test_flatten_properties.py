"""Property test: the pure-Python flattener vs the full JSON ingest path
on randomized nested events — both must agree on columns and values.

`flatten_event` is the reference-semantics model (key order, `_` joiner,
arrays stringified); `ingest_json` is the distributed Arrow path the
engine actually runs. Divergence between them is exactly the class of
bug a fixed fixture corpus misses.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.flatten import flatten_event
from bulker_spark.ingest import ingest_json

keys = st.sampled_from(["a", "b", "c", "d"])
leaf = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(alphabet="xyz ", max_size=6),
    st.booleans(),
)
nested = st.recursive(
    leaf, lambda inner: st.dictionaries(keys, inner, max_size=3), max_leaves=8
)
event = st.dictionaries(keys, nested, min_size=1, max_size=4)


@settings(max_examples=15, deadline=None)
@given(st.lists(event, min_size=1, max_size=4))
def test_ingest_matches_pure_flattener(spark, events):
    df, header = ingest_json(spark, [json.dumps(e) for e in events])

    # model: flatten each event in python, collect the first-seen column order
    flats = [flatten_event(e) for e in events]
    model_cols: list[str] = []
    for f in flats:
        for k in f:
            if k not in model_cols:
                model_cols.append(k)

    # the engine always appends the _unmapped_data rescue column; these
    # events are all representable, so it must be entirely null
    eng_cols = [c for c in df.columns if c != "_unmapped_data"]
    assert eng_cols == model_cols
    if "_unmapped_data" in df.columns:
        assert df.filter(df["_unmapped_data"].isNotNull()).count() == 0

    got = [r.asDict() for r in df.collect()]
    assert len(got) == len(flats)

    # model the lattice widening with the library's own pure-Python
    # converters (unit-tested against reference semantics independently):
    # unified column type = LCA over per-event inferred types, values
    # converted to it
    from bulker_spark.types_lattice import (
        common_ancestor_many,
        convert_value,
        infer_type,
    )

    target = {
        c: common_ancestor_many(
            [infer_type(f[c], c) for f in flats if c in f]
        )
        for c in model_cols
    }
    expected = [
        {
            c: (convert_value(f[c], target[c]) if c in f else None)
            for c in model_cols
        }
        for f in flats
    ]

    def norm(d):
        return tuple(sorted((k, repr(d.get(k))) for k in model_cols))

    assert sorted(norm(g) for g in got) == sorted(norm(e) for e in expected)
