"""A tiny directed-acyclic-graph container for driver-side plan bookkeeping.

The plan layer needs only O(plan)-sized graph surgery (ancestor walks,
relabeling, composition). We keep this as plain dictionaries instead of
depending on networkx for the hot path; conversion to networkx happens only
at the parity boundary (``Graph.to_networkx``).

All operations are O(nodes + edges) worst case and never touch data.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable, Mapping
from typing import Any


class Dag:
    """Mutable DAG with per-node attribute dicts.

    Semantics mirror the small subset of networkx.DiGraph the plan layer
    needs: insertion-ordered nodes, attribute merge on relabel/compose with
    "right side wins".
    """

    __slots__ = ('_attrs', '_preds', '_succs')

    def __init__(self) -> None:
        self._attrs: dict[Hashable, dict[str, Any]] = {}
        self._preds: dict[Hashable, list[Hashable]] = {}
        self._succs: dict[Hashable, list[Hashable]] = {}

    # -- construction -----------------------------------------------------
    @staticmethod
    def from_networkx(nx_graph: Any) -> Dag:
        dag = Dag()
        for node, attrs in nx_graph.nodes(data=True):
            dag.add_node(node, **attrs)
        for u, v in nx_graph.edges():
            dag.add_edge(u, v)
        return dag

    @staticmethod
    def from_edges(edges: Iterable[tuple[Hashable, Hashable]]) -> Dag:
        dag = Dag()
        for u, v in edges:
            dag.add_edge(u, v)
        return dag

    def copy(self) -> Dag:
        out = Dag()
        out._attrs = {n: dict(a) for n, a in self._attrs.items()}
        out._preds = {n: list(p) for n, p in self._preds.items()}
        out._succs = {n: list(s) for n, s in self._succs.items()}
        return out

    def add_node(self, node: Hashable, **attrs: Any) -> None:
        if node not in self._attrs:
            self._attrs[node] = {}
            self._preds[node] = []
            self._succs[node] = []
        self._attrs[node].update(attrs)

    def add_edge(self, u: Hashable, v: Hashable) -> None:
        self.add_node(u)
        self.add_node(v)
        if v not in self._succs[u]:
            self._succs[u].append(v)
            self._preds[v].append(u)

    def remove_node(self, node: Hashable) -> None:
        for p in self._preds.pop(node):
            self._succs[p].remove(node)
        for s in self._succs.pop(node):
            self._preds[s].remove(node)
        del self._attrs[node]

    def remove_in_edges(self, node: Hashable) -> None:
        for p in self._preds[node]:
            self._succs[p].remove(node)
        self._preds[node] = []

    def remove_edge(self, u: Hashable, v: Hashable) -> None:
        self._succs[u].remove(v)
        self._preds[v].remove(u)

    # -- queries ----------------------------------------------------------
    def __contains__(self, node: Hashable) -> bool:
        return node in self._attrs

    def __iter__(self):
        return iter(self._attrs)

    @property
    def nodes(self) -> list[Hashable]:
        return list(self._attrs)

    def node_attrs(self, node: Hashable) -> dict[str, Any]:
        return self._attrs[node]

    @property
    def edges(self) -> list[tuple[Hashable, Hashable]]:
        return [(u, v) for u, ss in self._succs.items() for v in ss]

    def predecessors(self, node: Hashable) -> list[Hashable]:
        return list(self._preds[node])

    def successors(self, node: Hashable) -> list[Hashable]:
        return list(self._succs[node])

    def in_degree(self, node: Hashable) -> int:
        return len(self._preds[node])

    def out_degree(self, node: Hashable) -> int:
        return len(self._succs[node])

    def sinks(self) -> list[Hashable]:
        return [n for n in self._attrs if not self._succs[n]]

    def ancestors(self, node: Hashable) -> set[Hashable]:
        return self._reach(node, self._preds)

    def descendants(self, node: Hashable) -> set[Hashable]:
        return self._reach(node, self._succs)

    def _reach(
        self, node: Hashable, nbrs: Mapping[Hashable, list[Hashable]]
    ) -> set[Hashable]:
        seen: set[Hashable] = set()
        stack = list(nbrs[node])
        while stack:
            n = stack.pop()
            if n not in seen:
                seen.add(n)
                stack.extend(nbrs[n])
        return seen

    # -- transforms -------------------------------------------------------
    def relabel(self, mapping: Mapping[Hashable, Hashable]) -> Dag:
        """Return a copy with nodes renamed; attrs merge (new name wins)."""

        def key(n: Hashable) -> Hashable:
            return mapping.get(n, n)

        out = Dag()
        for node, attrs in self._attrs.items():
            out.add_node(key(node), **attrs)
        for u, v in self.edges:
            out.add_edge(key(u), key(v))
        return out

    def compose(self, other: Dag) -> Dag:
        """Union of nodes/edges; attrs from ``other`` win on conflicts."""
        out = self.copy()
        for node, attrs in other._attrs.items():
            out.add_node(node, **attrs)
        for u, v in other.edges:
            out.add_edge(u, v)
        return out

    def subgraph(self, keep: Iterable[Hashable]) -> Dag:
        keep_set = set(keep)
        out = Dag()
        for node in self._attrs:
            if node in keep_set:
                out.add_node(node, **self._attrs[node])
        for u, v in self.edges:
            if u in keep_set and v in keep_set:
                out.add_edge(u, v)
        return out

    def to_networkx(self):
        import networkx as nx

        g = nx.DiGraph()
        for node, attrs in self._attrs.items():
            g.add_node(node, **attrs)
        g.add_edges_from(self.edges)
        return g
