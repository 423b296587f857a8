"""Pure-numpy reference implementations (SURVEY.md §5): the independent
oracles our distributed operators are checked against — the analog of the
reference keeping the original sequential Louvain in-tree
(/root/reference/louvainmod/tests/findcommunities/)."""

from __future__ import annotations

import numpy as np


def pagerank_np(
    edges: list[tuple[int, int, float]],
    n: int,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> np.ndarray:
    """Directed weighted PageRank with dangling-mass redistribution.
    ``edges`` are directed (src, dst, weight); vertex ids 0..n-1."""
    out = np.zeros(n)
    for s, d, w in edges:
        out[s] += w
    r = np.ones(n) / n
    base = (1 - damping) / n
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for s, d, w in edges:
            contrib[d] += r[s] * w / out[s]
        dangling = r[out == 0].sum()
        nr = base + damping * (contrib + dangling / n)
        if np.abs(nr - r).max() < tol:
            return nr
        r = nr
    return r


def components_np(edges: list[tuple[int, int]], vertices: list[int]) -> dict[int, int]:
    """Union-find; component id = min vertex id in the component."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


def label_propagation_np(
    edges: list[tuple[int, int, float]], vertices: list[int], max_iter: int = 20
) -> dict[int, int]:
    """Synchronous LPA with the engine's tie rules: per-vertex argmax of
    summed neighbor-label weight, higher weight wins, tie → smaller label."""
    labels = {v: v for v in vertices}
    adj: dict[int, list[tuple[int, float]]] = {v: [] for v in vertices}
    for a, b, w in edges:
        adj[a].append((b, w))
        adj[b].append((a, w))
    for _ in range(max_iter):
        new = {}
        changed = 0
        for v in vertices:
            if not adj[v]:
                new[v] = labels[v]
                continue
            weight: dict[int, float] = {}
            for u, w in adj[v]:
                weight[labels[u]] = weight.get(labels[u], 0.0) + w
            best = max(weight.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
            if best != labels[v]:
                changed += 1
        labels = new
        if changed == 0:
            break
    return labels


def triangles_np(edges: list[tuple[int, int]]) -> int:
    """Exact triangle count via adjacency-set intersection."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in edges:
        if a == b or a >= b:
            a, b = min(a, b), max(a, b)
        count += sum(1 for c in adj.get(a, ()) & adj.get(b, ()) if c > b)
    return count


def modularity_np(
    edges: list[tuple[int, int, float]], labels: dict[int, int]
) -> float:
    two_m = 2 * sum(w for _, _, w in edges)
    in_w = 0.0
    tot: dict[int, float] = {}
    for a, b, w in edges:
        if labels[a] == labels[b]:
            in_w += 2 * w
        tot[labels[a]] = tot.get(labels[a], 0.0) + w
        tot[labels[b]] = tot.get(labels[b], 0.0) + w
    return in_w / two_m - sum(t * t for t in tot.values()) / (two_m * two_m)
