"""Random walks + sampled harmonic centrality vs brute-force oracles."""

import pytest
from pyspark.sql import functions as F

from graphanalytics_spark import graph
from graphanalytics_spark.operators import walks
from graphanalytics_spark.operators.walks import (
    _WALK_A,
    _WALK_B,
    _WALK_C,
    _WALK_M,
)


@pytest.fixture(scope="module")
def wgraph(spark):
    # two triangles joined by a bridge + a pendant — small enough to
    # replay walks by hand, irregular enough to exercise every branch
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5), (5, 6)]
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    return graph.canonicalize(df), pairs


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {v: sorted(ns) for v, ns in adj.items()}


def _replay(adj, walk_id, length, seed=1):
    vid = walk_id
    out = [(walk_id, 0, vid)]
    for t in range(1, length + 1):
        ns = adj[vid]
        mix = (
            (vid % _WALK_M) * _WALK_A
            + t * _WALK_B
            + (walk_id % _WALK_M) * _WALK_C
            + seed
        ) % _WALK_M
        vid = ns[mix % len(ns)]
        out.append((walk_id, t, vid))
    return out


def test_random_walks_match_replay(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)
    expected = sorted(
        row for v in adj for row in _replay(adj, v, 4)
    )
    got = sorted(
        (r["walk_id"], r["step"], r["vid"])
        for r in walks.random_walks(spark, ec, walk_length=4).collect()
    )
    assert got == expected


def test_random_walks_are_real_walks(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)
    rows = walks.random_walks(spark, ec, walk_length=6).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["vid"]
    for wid, steps in by_walk.items():
        assert set(steps) == set(range(7)), "no strand: every step present"
        assert steps[0] == wid
        for t in range(1, 7):
            assert steps[t] in adj[steps[t - 1]], "each hop is an edge"


def test_indexed_adjacency_contract(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)
    rows = walks.indexed_adjacency(ec).collect()
    for r in rows:
        assert r["deg"] == len(adj[r["src"]])
        assert adj[r["src"]][r["idx"]] == r["dst"]


def test_indexed_adjacency_hub_safe_identical(spark):
    """The two-pass hub-safe path must emit exactly the window path's
    rows — including on a hub whose neighbor list spans several range
    partitions."""
    hub_edges = [(0, d, 1.0) for d in range(1, 200)] + [
        (d, d + 1, 1.0) for d in range(1, 199)
    ]
    ec = graph.canonicalize(
        spark.createDataFrame(hub_edges, "src long, dst long, weight double")
    )
    default_rows = sorted(
        map(tuple, walks.indexed_adjacency(ec, hub_safe=False).collect())
    )
    safe_rows = sorted(
        map(tuple, walks.indexed_adjacency(ec, hub_safe=True).collect())
    )
    assert default_rows == safe_rows


def _replay_node2vec(adj, walk_id, length, p, q, seed=1):
    """Pure-python second-order replay with the same scaled-int weights
    (back=q, common=p*q, forward=p) and LCG pick as the engine."""
    vid = walk_id
    out = [(walk_id, 0, vid)]
    prev = None
    for t in range(1, length + 1):
        ns = adj[vid]
        mix = (
            (vid % _WALK_M) * _WALK_A
            + t * _WALK_B
            + (walk_id % _WALK_M) * _WALK_C
            + seed
        ) % _WALK_M
        if prev is None:
            nxt = ns[mix % len(ns)]
        else:
            ws = []
            for n in ns:
                if n == prev:
                    ws.append(q)
                elif n in adj[prev]:
                    ws.append(p * q)
                else:
                    ws.append(p)
            r = mix % sum(ws)
            cum = 0
            for n, w in zip(ns, ws):
                cum += w
                if r < cum:
                    nxt = n
                    break
        prev, vid = vid, nxt
        out.append((walk_id, t, vid))
    return out


def test_node2vec_walks_match_replay(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)
    expected = sorted(
        row for v in adj for row in _replay_node2vec(adj, v, 4, p=2, q=3)
    )
    got = sorted(
        (r["walk_id"], r["step"], r["vid"])
        for r in walks.node2vec_walks(
            spark, ec, walk_length=4, p=2, q=3
        ).collect()
    )
    assert got == expected


def test_node2vec_walks_are_real_walks(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)
    rows = walks.node2vec_walks(spark, ec, walk_length=5, p=1, q=4).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["vid"]
    assert set(by_walk) == set(adj)
    for wid, steps in by_walk.items():
        assert set(steps) == set(range(6)), "exactly one vid per step"
        assert steps[0] == wid
        for t in range(1, 6):
            assert steps[t] in adj[steps[t - 1]], "each hop is an edge"


def test_node2vec_rejects_nonpositive_pq(spark, wgraph):
    ec, _ = wgraph
    with pytest.raises(ValueError):
        walks.node2vec_walks(spark, ec, p=0)


def test_harmonic_matches_bruteforce(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)

    def dist_from(s):
        d, frontier = {s: 0}, [s]
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in d:
                        d[u] = d[v] + 1
                        nxt.append(u)
            frontier = nxt
        return d

    seeds = [0, 3]
    expected = {}
    for s in seeds:
        for v, dv in dist_from(s).items():
            if dv > 0:
                expected[v] = expected.get(v, 0.0) + 1.0 / dv
    got = {
        r["vid"]: r["harmonic"]
        for r in walks.harmonic_centrality(spark, ec, seeds).collect()
    }
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-8


def test_distance_histogram_matches_bfs(spark, wgraph):
    ec, pairs = wgraph
    adj = _adj(pairs)

    def dist_from(s):
        d, frontier = {s: 0}, [s]
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in d:
                        d[u] = d[v] + 1
                        nxt.append(u)
            frontier = nxt
        return d

    seeds = [0, 3]
    expected = {}
    for s in seeds:
        for v, dv in dist_from(s).items():
            if dv > 0:
                expected[dv] = expected.get(dv, 0) + 1
    got = {
        r["dist"]: r["n_pairs"]
        for r in walks.distance_histogram(spark, ec, seeds).collect()
    }
    assert got == expected
