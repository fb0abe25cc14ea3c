"""Pure NumPy/Python oracles implementing the reference's semantics.

Mirrors the reference's per-example CPU oracles
(examples/algorithms/*/ *_cpu.hxx): sequential, obviously-correct
implementations compared against the Spark engine's output.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(n, edges, alpha=0.85, tol=1e-6, max_iter=1000):
    """Reference PR loop (include/gunrock/algorithms/pr.hxx:106-178).

    edges: iterable of (src, dst, weight).
    """
    outw = np.zeros(n)
    for s, d, w in edges:
        outw[s] += w
    iweights = np.where(outw != 0, alpha / np.where(outw == 0, 1, outw), 0.0)
    p = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        plast = p.copy()
        dsum = alpha * plast[outw == 0].sum()
        p = np.full(n, (1.0 - alpha + dsum) / n)
        for s, d, w in edges:
            p[d] += plast[s] * iweights[s] * w
        if np.max(np.abs(p - plast)) < tol:
            break
    return p


def cc_oracle(n, undirected_edges):
    """Union-find; labels = min vid per component."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in undirected_edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return np.array([find(i) for i in range(n)])


def lp_oracle(n, undirected_edges, max_iter=20):
    """Synchronous LP, most-frequent neighbor label, min-label tiebreak."""
    adj = defaultdict(set)
    for u, v in undirected_edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not adj[v]:
                continue
            cnt = Counter(labels[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def tc_oracle(n, undirected_edges):
    """Per-vertex triangle membership counts; total = 3 x #triangles
    (reference unittests/algorithms/tc.cuh golden semantics)."""
    adj = defaultdict(set)
    for u, v in undirected_edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    counts = np.zeros(n, dtype=np.int64)
    for v in range(n):
        nbrs = sorted(adj[v])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if nbrs[j] in adj[nbrs[i]]:
                    counts[v] += 1
    return counts, int(counts.sum())


def lp_semi_oracle(n, undirected_edges, max_iter=20, parity=None):
    """Semi-synchronous LP: round t (0-based) updates only vertices
    with parity(v) == t % 2; most-frequent neighbor label, min-label
    tiebreak; stops after two consecutive no-change rounds (one round
    covers only one parity class)."""
    parity = parity or (lambda v: v % 2)
    adj = defaultdict(set)
    for u, v in undirected_edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = np.arange(n)
    zero = 0
    for t in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if parity(v) != t % 2 or not adj[v]:
                continue
            cnt = Counter(labels[u] for u in adj[v])
            new[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if np.array_equal(new, labels):
            zero += 1
            if zero >= 2:
                break
        else:
            zero = 0
        labels = new
    return labels
