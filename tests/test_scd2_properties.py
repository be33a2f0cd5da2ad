"""Model-based property test: scd2_apply vs a pure-Python SCD2 model.

Random snapshot sequences over a small key space; after the full
sequence the dimension must satisfy the SCD2 invariants and agree with
the reference model exactly.
"""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.operators.scd2 import (
    IS_CURRENT,
    VALID_FROM,
    VALID_TO,
    scd2_apply,
    scd2_current,
    scd2_init,
)

# a snapshot batch: subset of keys 1..3, each with a value from a tiny set
batch_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=3),
    st.sampled_from(["a", "b", None]),
    min_size=1,
    max_size=3,
)


def model_apply(model: dict, batch: dict, eff: dt.datetime) -> None:
    """model: key -> list of [value, valid_from, valid_to]."""
    for k, v in batch.items():
        versions = model.setdefault(k, [])
        if not versions:
            versions.append([v, eff, None])
        elif versions[-1][0] != v:
            versions[-1][2] = eff
            versions.append([v, eff, None])


@settings(max_examples=12, deadline=None)
@given(st.lists(batch_strategy, min_size=1, max_size=4))
def test_scd2_matches_model(spark, batches):
    t = dt.datetime(2024, 1, 1)
    model: dict = {}

    def to_df(batch):
        return spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "id long, val string"
        )

    dim = scd2_init(to_df(batches[0]), ["id"], t)
    model_apply(model, batches[0], t)
    for i, b in enumerate(batches[1:], start=1):
        eff = t + dt.timedelta(days=i)
        dim = scd2_apply(dim, to_df(b), ["id"], ["val"], eff)
        model_apply(model, b, eff)

    rows = dim.collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["id"], []).append(
            [r["val"], r[VALID_FROM], r[VALID_TO], r[IS_CURRENT]]
        )
    for k in got:
        got[k].sort(key=lambda x: x[1])

    assert set(got) == set(model)
    for k, versions in model.items():
        # exact agreement with the model, including interval chaining
        assert [v[:3] for v in got[k]] == versions, (k, got[k], versions)
        # exactly one current version per key, and it is the last
        flags = [v[3] for v in got[k]]
        assert flags == [False] * (len(flags) - 1) + [True]

    # current view = model's open versions
    cur = {r["id"]: r["val"] for r in scd2_current(dim).collect()}
    assert cur == {k: v[-1][0] for k, v in model.items()}
