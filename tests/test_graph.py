"""Distributed connected components (stages/graph.py): brute-force
parity on a graph mixing chains, cliques, parallel/self edges and
isolated vertices, in one call (per-round Ray fixed costs make many
tiny calls expensive)."""

import collections

import numpy as np
import pyarrow as pa


def _brute(edges, verts):
    g = collections.defaultdict(set)
    for a, b in edges:
        g[a].add(b)
        g[b].add(a)
    out = {}
    for v in sorted(set(verts) | set(g)):
        if v in out:
            continue
        vis, stack = set(), [v]
        while stack:
            x = stack.pop()
            if x in vis:
                continue
            vis.add(x)
            stack.extend(g[x] - vis)
        m = min(vis)
        for x in vis:
            out[x] = m
    return out


class TestConnectedComponents:
    def test_mixed_graph_matches_brute_force(self, ray_session):
        import ray

        from karta_ray.stages.graph import connected_components

        edges = [(i, i + 1) for i in range(8)]          # chain, diam 8
        edges += [(20 + a, 20 + b) for a in range(4)
                  for b in range(a + 1, 4)]             # clique
        edges += [(30, 31), (31, 30), (30, 31)]         # parallel edges
        edges += [(40, 41), (41, 42), (40, 42)]         # triangle
        verts = list(range(0, 50))                      # + isolated
        e = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                      "b": pa.array([b for _, b in edges], pa.int64())})
        v = pa.table({"v": pa.array(verts, pa.int64())})
        # both plans: the small-input single-task path (default) and
        # the distributed multi-round path (forced)
        for small in (500_000, 0):
            out = connected_components(
                ray.data.from_arrow(e).repartition(5),
                vertices=ray.data.from_arrow(v).repartition(2),
                small_input_rows=small)
            got = {r["v"]: r["cluster_id"] for r in out.take_all()}
            assert got == _brute(edges, verts), small

    def test_edges_only_no_vertices(self, ray_session):
        import ray

        from karta_ray.stages.graph import connected_components

        edges = [(5, 3), (3, 9), (100, 7)]
        e = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                      "b": pa.array([b for _, b in edges], pa.int64())})
        out = connected_components(ray.data.from_arrow(e))
        got = {r["v"]: r["cluster_id"] for r in out.take_all()}
        assert got == _brute(edges, [])
