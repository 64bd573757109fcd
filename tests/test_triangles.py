"""triangle_counts (degree-ordered distributed triangle counting):
equality against a Python brute force over all 3-subsets, plus named
fixtures — clique, path, triangle-with-tail, duplicate/reversed/self
edges, isolated nodes — and the clustering-coefficient contract.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from amonaly_detection_in_time_series_data_spark.operators.graph import (
    triangle_counts,
)


def _brute(edge_list):
    und = {
        (min(a, b), max(a, b))
        for a, b in edge_list
        if a is not None and b is not None and a != b
    }
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    out = {}
    for n in adj:
        d = len(adj[n])
        c = 2.0 * tri[n] / (d * (d - 1)) if d >= 2 else 0.0
        out[n] = (d, tri[n], c)
    return out


def _run(spark, edge_list, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], ["id_a", "id_b"]
    )
    return {
        r["node"]: (r["deg"], r["triangles"], r["clustering"])
        for r in triangle_counts(df, **kw).collect()
    }


class TestTriangleCounts:
    def test_k4_clique(self, spark):
        edges = list(itertools.combinations(range(4), 2))
        got = _run(spark, edges)
        # every node of K4 is in C(3,2)=3 triangles, coefficient 1.0
        assert got == {n: (3, 3, 1.0) for n in range(4)}

    def test_path_has_no_triangles(self, spark):
        got = _run(spark, [(i, i + 1) for i in range(5)])
        assert all(t == 0 and c == 0.0 for _, t, c in got.values())

    def test_triangle_with_tail(self, spark):
        got = _run(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        assert got[0] == (2, 1, 1.0)
        assert got[1] == (2, 1, 1.0)
        assert got[2] == (3, 1, 2.0 * 1 / (3 * 2))
        assert got[3] == (1, 0, 0.0)

    def test_duplicate_reversed_and_self_edges_canonicalized(self, spark):
        messy = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (2, 2)]
        assert _run(spark, messy) == _brute(messy)

    def test_isolated_nodes_included_via_nodes_frame(self, spark):
        nodes = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
        got = _run(
            spark, [(0, 1), (1, 2), (0, 2)], nodes=nodes, node_col="doc_id"
        )
        assert got[3] == (0, 0, 0.0) and got[4] == (0, 0, 0.0)
        assert got[0] == (2, 1, 1.0)

    @settings(max_examples=20, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=11),
                st.integers(min_value=0, max_value=11),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_property_equals_brute_force(self, spark, edges):
        clean = [(a, b) for a, b in edges if a != b]
        if not clean:
            return
        assert _run(spark, clean) == _brute(clean)


class TestTrianglesLarger:
    def test_dense_random_graph_matches_brute(self, spark):
        """60-node seeded random graph (~270 edges, triangle-rich):
        the degree-orientation plan against the all-3-subsets brute
        force at a size where orientation mistakes could not hide."""
        import numpy as np

        rng = np.random.RandomState(42)
        edges = [
            (int(a), int(b))
            for a, b in rng.randint(0, 60, size=(300, 2))
            if a != b
        ]
        assert _run(spark, edges) == _brute(edges)
