"""Union-find with deterministic (lexicographic-min) representatives.

The merge structure behind entity canonicalization — the analogue of
the reference's transitive Parent-pointer chase
(reference: src/main/scala/corwur/genereader/GeneReader.scala:165-178):
following ID links until a root. Representative choice is
order-independent (min element), so canonical IDs are identical across
partitionings and cluster sizes (SURVEY.md §7.5 determinism rule).

Merges are associative+commutative (a monoid, like the reference's
GffLinesRepository ``+`` at GeneReader.scala:44-45), which is what
makes the salted / per-partition two-phase merge sound.
"""

from __future__ import annotations


class UnionFind:
    """Path-compressed union-find over arbitrary hashable keys."""

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller key becomes the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def add(self, x) -> None:
        self.find(x)

    def groups(self) -> dict:
        """root → sorted list of members (root is the min member)."""
        out: dict = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        for v in out.values():
            v.sort()
        return out

    def mapping(self) -> dict:
        """member → root for every seen key."""
        return {x: self.find(x) for x in list(self.parent)}
