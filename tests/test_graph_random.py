"""Randomized differential tests: graph_triangles / graph_similarity vs
brute-force pure-python twins on seeded Erdős–Rényi-ish graphs (the
decode-kernel randomized-differential posture). Catches orientation /
wedge-closing mistakes no handcrafted fixture would."""

from __future__ import annotations

import itertools
import random

import pytest

from transner_spark.operators.graph import graph_similarity, graph_triangles

SCHEMA = "subj_id string, pred string, obj_id string, weight long"


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    rows = []
    for _ in range(n_edges):
        s = f"n{rng.randrange(n_nodes)}"
        o = f"n{rng.randrange(n_nodes)}"
        rows.append((s, rng.choice(["p", "q"]), o, rng.randrange(1, 5)))
    return rows


def _undirected_py(rows):
    und = set()
    for s, _, o, _ in rows:
        if s != o:
            und.add((min(s, o), max(s, o)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return und, adj


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_triangles_match_bruteforce(spark, seed):
    rows = _random_edges(seed, n_nodes=14, n_edges=60)
    und, adj = _undirected_py(rows)
    tri_count = dict.fromkeys(adj, 0)
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                tri_count[x] += 1
    got = {
        r["node_id"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in graph_triangles(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert set(got) == set(adj)
    for n in adj:
        d, t = len(adj[n]), tri_count[n]
        c = round(2.0 * t / (d * (d - 1.0)), 6) if d >= 2 else 0.0
        assert got[n] == (d, t, c), n


@pytest.mark.parametrize("seed,bound", [(7, None), (23, None), (23, 3)])
def test_similarity_matches_bruteforce(spark, seed, bound):
    rows = _random_edges(seed, n_nodes=12, n_edges=50)
    _, adj = _undirected_py(rows)
    if bound is not None:
        hubs = {n for n, nbs in adj.items() if len(nbs) > bound}
        adj = {n: nbs - hubs for n, nbs in adj.items()}
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        common = len(adj[a] & adj[b])
        if common >= 2:  # SIMILARITY_MIN_COMMON default
            union = len(adj[a] | adj[b])
            want[(a, b)] = (
                common, len(adj[a]), len(adj[b]), round(common / union, 6)
            )
    got = {
        (r["node_a"], r["node_b"]): (
            r["n_common"], r["deg_a"], r["deg_b"], r["jaccard"]
        )
        for r in graph_similarity(
            spark.createDataFrame(rows, SCHEMA), max_neighbor_degree=bound
        ).collect()
    }
    assert got == want


def _lpa_py(adj, n_iter):
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n in adj:
            counts = {}
            for nb in adj[n]:
                lb = labels[nb]
                counts[lb] = counts.get(lb, 0) + 1
            new[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    return labels


@pytest.mark.parametrize("seed", [7, 41])
def test_communities_match_bruteforce(spark, seed):
    from transner_spark.operators.graph import LPA_ITERATIONS, graph_communities

    rows = _random_edges(seed, n_nodes=13, n_edges=55)
    _, adj = _undirected_py(rows)
    want_labels = _lpa_py(adj, LPA_ITERATIONS)
    sizes = {}
    for lb in want_labels.values():
        sizes[lb] = sizes.get(lb, 0) + 1
    got = {
        r["node_id"]: (r["community_id"], r["community_size"])
        for r in graph_communities(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == {n: (lb, sizes[lb]) for n, lb in want_labels.items()}
