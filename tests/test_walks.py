"""Deterministic random-walk corpus (operators/walks.py): exact python
twin (the same hash arithmetic via hashlib), randomized graphs, custom
seed sets incl. walkers with no edges, and parameter guards."""

from __future__ import annotations

import hashlib
import random

import pytest

from transner_spark.operators.walks import random_walks

EDGES = [
    ("a", "p1", "b", 3),
    ("a", "p2", "b", 2),
    ("a", "p1", "c", 1),
    ("b", "p1", "c", 5),
    ("c", "p1", "a", 1),
    ("d", "p1", "a", 4),
    ("d", "p1", "e", 1),
]

SCHEMA = "subj_id string, pred string, obj_id string, weight long"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def walks_reference(edge_pairs, seeds, n_walks, n_steps):
    """Pure-python twin: undirected distinct link set, sorted neighbor
    lists, next hop = h60('rw:'||w||':'||t||':'||seed) % deg."""
    und = {
        (min(s, o), max(s, o)) for s, o in edge_pairs if s != o
    }
    adj: dict[str, list[str]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for nbs in adj.values():
        nbs.sort()
    out = []
    for seed in seeds:
        for w in range(n_walks):
            cur = seed
            out.append((seed, w, 0, cur))
            for t in range(1, n_steps + 1):
                nbs = adj.get(cur)
                if not nbs:
                    break
                cur = nbs[_h60(f"rw:{w}:{t}:{seed}") % len(nbs)]
                out.append((seed, w, t, cur))
    return sorted(out)


def top_degree_seeds(edge_pairs, n):
    und = {(min(s, o), max(s, o)) for s, o in edge_pairs if s != o}
    deg: dict[str, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return [
        node
        for node, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
    ]


def _collect(df):
    return sorted(
        (r["seed_id"], r["walk_no"], r["step"], r["node_id"])
        for r in df.collect()
    )


def test_walks_handcrafted_exact(spark):
    df = spark.createDataFrame(EDGES, SCHEMA)
    got = _collect(random_walks(df, n_walks=2, n_steps=4, n_seeds=3))
    pairs = [(s, o) for s, _, o, _ in EDGES]
    ref = walks_reference(pairs, top_degree_seeds(pairs, 3), 2, 4)
    assert got == ref
    # full-length walks: every (seed, walk) reaches step 4
    assert sum(1 for _, _, step, _ in got if step == 4) == 3 * 2


@pytest.mark.parametrize("seed", [7, 23])
def test_walks_randomized_vs_twin(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(14)]
    pairs = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(30)
        }
    )
    rows = [(s, "p", o, 1) for s, o in pairs]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(random_walks(df, n_walks=3, n_steps=5, n_seeds=4))
    ref = walks_reference(pairs, top_degree_seeds(pairs, 4), 3, 5)
    assert got == ref


def test_walks_custom_seed_without_edges_stops_at_step0(spark):
    df = spark.createDataFrame(EDGES, SCHEMA)
    seeds = spark.createDataFrame([("zz",), ("a",)], "node_id string")
    got = _collect(random_walks(df, seeds=seeds, n_walks=1, n_steps=3))
    # the edgeless walker emits exactly its step-0 row; 'a' walks on
    assert [(s, w, t, n) for s, w, t, n in got if s == "zz"] == [
        ("zz", 0, 0, "zz")
    ]
    assert sum(1 for s, _, _, _ in got if s == "a") == 4


def test_walks_duplicate_seeds_deduped(spark):
    # duplicate rows in a caller-supplied seeds frame must NOT emit
    # byte-identical duplicated walks (walk_skipgrams would silently
    # double-count them into inflated n_pairs)
    df = spark.createDataFrame(EDGES, SCHEMA)
    dup = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("a",)], "node_id string"
    )
    uniq = spark.createDataFrame([("a",), ("b",)], "node_id string")
    got_dup = _collect(random_walks(df, seeds=dup, n_walks=2, n_steps=3))
    got_uniq = _collect(random_walks(df, seeds=uniq, n_walks=2, n_steps=3))
    assert got_dup == got_uniq
    assert len(got_dup) == len(set(got_dup))


def test_walks_param_guards(spark):
    df = spark.createDataFrame(EDGES, SCHEMA)
    with pytest.raises(ValueError):
        random_walks(df, n_walks=0)
    with pytest.raises(ValueError):
        random_walks(df, n_steps=-1)


def skipgrams_reference(edge_pairs, seeds, n_walks, n_steps, window):
    walks = walks_reference(edge_pairs, seeds, n_walks, n_steps)
    by_walk: dict[tuple, list] = {}
    for seed, w, step, node in walks:
        by_walk.setdefault((seed, w), []).append((step, node))
    pairs: dict[tuple, int] = {}
    for steps in by_walk.values():
        for sa, na in steps:
            for sb, nb in steps:
                if sa != sb and abs(sa - sb) <= window:
                    pairs[(na, nb)] = pairs.get((na, nb), 0) + 1
    return pairs


def test_skipgrams_vs_twin(spark):
    from transner_spark.operators.walks import walk_skipgrams

    df = spark.createDataFrame(EDGES, SCHEMA)
    got = {
        (r["center_id"], r["context_id"]): r["n_pairs"]
        for r in walk_skipgrams(
            df, window=2, n_walks=2, n_steps=4, n_seeds=3
        ).collect()
    }
    pairs = [(s, o) for s, _, o, _ in EDGES]
    ref = skipgrams_reference(pairs, top_degree_seeds(pairs, 3), 2, 4, 2)
    assert got == ref
    # skip-grams are symmetric in aggregate: (a,b) and (b,a) counts equal
    for (a, b), n in got.items():
        assert got[(b, a)] == n
    with pytest.raises(ValueError):
        walk_skipgrams(df, window=0)
