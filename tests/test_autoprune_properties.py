"""Property test: for ANY conjunction of range/point/IN predicates over a
clustered warehouse table, the auto-pruned plan returns exactly the
unpruned plan's rows (pruning may only drop files PROVEN empty for the
predicate — never a matching row)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bulker_spark.api import Engine

N = 2_000

pred_strategy = st.lists(
    st.one_of(
        # pk range (possibly empty / inverted — SQL semantics decide)
        st.tuples(
            st.just("range"),
            st.integers(-100, N + 100),
            st.integers(-100, N + 100),
        ),
        st.tuples(st.just("point"), st.integers(-5, N + 5), st.none()),
        st.tuples(
            st.just("in"),
            st.lists(st.integers(0, N), min_size=1, max_size=5),
            st.none(),
        ),
        # secondary column: val tracks pk/2, grp is low-cardinality
        st.tuples(st.just("val_lt"), st.integers(0, N), st.none()),
        st.tuples(st.just("grp_eq"), st.integers(0, 10), st.none()),
    ),
    min_size=1,
    max_size=3,
)


@pytest.fixture(scope="module")
def prop_eng(spark, tmp_path_factory):
    eng = Engine(
        spark, str(tmp_path_factory.mktemp("wh_prop")), retain_versions=3
    )
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") / 2.0).alias("val"),
        )
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    eng.warehouse.create_or_replace("pt", df, pk=["pk"])
    return eng


def _where(preds) -> str:
    clauses = []
    for kind, a, b in preds:
        if kind == "range":
            clauses.append(f"pk between {a} and {b}")
        elif kind == "point":
            clauses.append(f"pk = {a}")
        elif kind == "in":
            clauses.append(f"pk in ({', '.join(map(str, a))})")
        elif kind == "val_lt":
            clauses.append(f"val < {a}")
        elif kind == "grp_eq":
            clauses.append(f"grp = {a}")
    return " and ".join(clauses)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred_strategy)
def test_pruned_rows_equal_unpruned(prop_eng, preds):
    q = f"select pk, grp, val from pt where {_where(preds)}"
    pruned = sorted(map(tuple, prop_eng.sql(q).collect()))
    full = sorted(map(tuple, prop_eng.sql(q, auto_prune=False).collect()))
    assert pruned == full
