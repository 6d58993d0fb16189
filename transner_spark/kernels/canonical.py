"""Canonicalization: connected components over the link graph.

Nodes are entity keys and unlinked-mention surface keys; an edge joins a
mention's surface key to its linked entity key, and alias-sharing ties
entity keys together. The canonical id of a component is its
lexicographically smallest node — a total, deterministic rule that both
implementations share:

- oracle: classic union-find (this module);
- Spark: iterative large-star/small-star DataFrame joins
  (transner_spark/operators/canonicalize.py) which provably converge to the
  same min-label components.
"""

from __future__ import annotations


def connected_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find; returns node → lexicographic-min component member."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        # keep the lexicographically smaller root
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)

    return {n: find(n) for n in parent}
