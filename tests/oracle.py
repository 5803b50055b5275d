"""Pure-NumPy/Python serial oracles (SURVEY.md §5.2 item 1).

These are the single-process "reference implementations" the Spark engine
must match: PageRank (both dangling modes; equation from
matlab-reference-implementation/verify_pagerank.m:11-15 and
c-single-threaded/pagerank.c:219-296), connected components (union-find),
synchronous label propagation, per-vertex triangle counting, and the
canonical link extractor (shared spec, functions/extract.py).
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(
    edges: list[tuple[int, int]],
    n: int,
    d: float = 0.85,
    eps: float = 1e-8,
    max_iter: int = 10000,
    fixed_iterations: int | None = None,
    dangling_mode: str = "none",
) -> tuple[np.ndarray, int]:
    """Serial PageRank. edges are (src, dst) with ids in [0, n).
    Duplicate handling is the caller's business (engine dedupes upstream).
    Returns (ranks, iterations)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    L = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / L[src]
    dangling = L == 0
    r = np.full(n, 1.0 / n, dtype=np.float64)
    it = 0
    target = fixed_iterations if fixed_iterations is not None else max_iter
    while it < target:
        it += 1
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, r[src] * w)
        base = (1.0 - d) / n
        if dangling_mode == "redistribute":
            base = base + d * r[dangling].sum() / n
        new_r = base + d * contrib
        delta = np.sqrt(((new_r - r) ** 2).sum())
        r = new_r
        if fixed_iterations is None and delta <= eps:
            break
    return r, it


def verify_pagerank_equation(
    ranks: np.ndarray,
    edges: list[tuple[int, int]],
    d: float = 0.85,
    dangling_mode: str = "none",
    tol: float = 1e-5,
) -> bool:
    """Per-row fixed-point equation check, ported from
    matlab-reference-implementation/verify_pagerank.m:16-34: at convergence
    every vertex satisfies R[i] ≈ (1−d)/N + d·Σ_{j→i} R[j]/L[j] (+ dangling
    term)."""
    n = len(ranks)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    L = np.bincount(src, minlength=n).astype(np.float64)
    contrib = np.zeros(n)
    np.add.at(contrib, dst, ranks[src] / L[src])
    base = (1.0 - d) / n
    if dangling_mode == "redistribute":
        base = base + d * ranks[L == 0].sum() / n
    return bool(np.allclose(ranks, base + d * contrib, atol=tol))


def components_ref(edges: list[tuple[int, int]], vertex_ids: list[int]) -> dict[int, int]:
    """Union-find connected components on the undirected view; component
    label = min vertex id in the component."""
    parent: dict[int, int] = {v: v for v in vertex_ids}
    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # min-id relabel
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, r), v)
    return {v: comp_min[find(v)] for v in parent}


def label_propagation_ref(
    edges: list[tuple[int, int]], vertex_ids: list[int], iterations: int
) -> dict[int, int]:
    """Synchronous LP over the undirected view. Initial label = vertex id.
    Each round every vertex takes the most frequent neighbor label,
    ties broken by min label; isolated vertices keep their own."""
    nbrs: dict[int, list[int]] = {v: [] for v in vertex_ids}
    und = set()
    for s, d in edges:
        if s == d:
            continue
        for a, b in ((s, d), (d, s)):
            if (a, b) not in und:
                und.add((a, b))
                nbrs.setdefault(a, []).append(b)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        new = {}
        for v, ns in nbrs.items():
            if not ns:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        labels = new
    return labels


def triangles_ref(edges: list[tuple[int, int]], vertex_ids: list[int]) -> dict[int, int]:
    """Per-vertex triangle counts on the undirected simple graph (direction
    removed, self-loops and duplicates dropped)."""
    adj: dict[int, set[int]] = {v: set() for v in vertex_ids}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = {v: 0 for v in adj}
    for v in adj:
        for u in adj[v]:
            if u <= v:
                continue
            common = adj[v] & adj[u]
            for w in common:
                if w > u:
                    tri[v] += 1
                    tri[u] += 1
                    tri[w] += 1
    return tri
