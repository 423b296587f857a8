"""Property-based invariants (hypothesis) for the core edge model and the
distributed dense-id assignment — the algebraic contracts every operator
builds on, checked over randomized inputs rather than fixed examples.

Example counts are small (each example runs real Spark jobs); determinism
comes from hypothesis' own seed database plus derandomize=True.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from graphanalytics_spark import graph

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
        st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in rows],
        "src long, dst long, weight double",
    )


@given(rows=edge_lists)
@settings(**_SETTINGS)
def test_canonicalize_invariants(spark, rows):
    ec = graph.canonicalize(_df(spark, rows)).collect()
    # orientation, no self loops, no duplicate pairs
    pairs = [(r.src, r.dst) for r in ec]
    assert all(s < d for s, d in pairs)
    assert len(pairs) == len(set(pairs))
    # weight conservation: summed weight equals the non-self-loop input sum
    expect = sum(w for a, b, w in rows if a != b)
    got = sum(r.weight for r in ec)
    assert got == pytest.approx(expect, abs=1e-9)
    # idempotence
    again = sorted(
        tuple(r)
        for r in graph.canonicalize(
            _df(spark, [(r.src, r.dst, r.weight) for r in ec])
        ).collect()
    )
    assert again == sorted((r.src, r.dst, r.weight) for r in ec)


@given(rows=edge_lists)
@settings(**_SETTINGS)
def test_symmetrize_doubles_and_balances(spark, rows):
    ec = graph.canonicalize(_df(spark, rows))
    n = ec.count()
    sym = graph.symmetrize(ec).collect()
    assert len(sym) == 2 * n
    # per-vertex weighted degree is direction-independent
    out_w = {}
    in_w = {}
    for r in sym:
        out_w[r.src] = out_w.get(r.src, 0.0) + r.weight
        in_w[r.dst] = in_w.get(r.dst, 0.0) + r.weight
    assert set(out_w) == set(in_w)
    for v in out_w:
        assert out_w[v] == pytest.approx(in_w[v], abs=1e-9)


@given(
    keys=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=5),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_dense_ids_is_sorted_bijection(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.k: r.id for r in graph.dense_ids(df, "k", partitions=3).collect()}
    expect = {k: i for i, k in enumerate(sorted(set(keys)))}
    assert got == expect
