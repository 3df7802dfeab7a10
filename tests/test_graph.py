"""Graph analytics: PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest

from character_identification_spark.operators.graph import pagerank


def test_pagerank_star_graph(spark):
    """Hub-and-spoke: all spokes point at the hub — after any number of
    rounds the hub holds the maximum rank, and total mass equals
    N·base + damped in-flow (no creation of mass beyond the formula)."""
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=3).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0] == max(out.values())
    # spokes have no in-edges: rank = base + 0 after round 1 → all equal
    assert len({out[i] for i in range(1, 5)}) == 1
    # hand value: N=5, base=0.03; spokes stay 0.03 from round 1 on;
    # hub r3 = 0.03 + 0.85*4*0.03 = 0.132
    assert out[1] == pytest.approx(0.03, abs=1e-6)
    assert out[0] == pytest.approx(0.132, abs=1e-6)


def test_pagerank_cycle_uniform(spark):
    """A directed cycle is rank-symmetric: uniform 1/N is the fixpoint,
    so every round must preserve it exactly."""
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    out = [r["rank"] for r in pagerank(edges, n_iters=4).collect()]
    assert all(r == pytest.approx(1.0 / n, abs=1e-6) for r in out)


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: nodes {0,1,2,3}, edges all pairs except (0,3).
    Triangles: (0,1,2) and (1,2,3) → nodes 1,2 in two each, 0,3 in one.
    Input is directed + duplicated to exercise canonicalization."""
    from character_identification_spark.operators.graph import triangle_counts

    pairs = [(0, 1), (1, 0), (0, 2), (1, 2), (2, 1), (1, 3), (2, 3), (3, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangle_counts_triangle_free(spark):
    from character_identification_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0}


def test_triangle_degree_orientation_caps_hub_wedges(spark):
    """Skewed star (round-5 audit fix): hub id 0 joined to 50 leaves,
    two leaf-leaf chords. Under ID orientation the low-id hub would
    enumerate C(50,2)=1225 wedges; degree orientation points every
    spoke AT the hub, so the hub enumerates none and total wedge volume
    stays linear in the leaf count. Counts must still be exact."""
    from pyspark.sql import functions as F

    from character_identification_spark.operators.graph import (
        oriented_edges,
        triangle_counts,
    )

    m = 50
    pairs = [(0, i) for i in range(1, m + 1)] + [(1, 2), (3, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    # triangles: (0,1,2) and (0,3,4)
    assert out[0] == 2 and out[1] == out[2] == out[3] == out[4] == 1
    assert all(out[i] == 0 for i in range(5, m + 1))

    # wedge-volume bound: replay the operator's own wedge join on the
    # oriented edges — the hub (max degree) must contribute 0 wedges
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    o = oriented_edges(und)
    wedges = (
        o.select(F.col("lo").alias("u"), F.col("hi").alias("v"),
                 F.col("deg_hi").alias("dv"))
        .join(
            o.select(F.col("lo").alias("u"), F.col("hi").alias("w"),
                     F.col("deg_hi").alias("dw")),
            "u",
        )
        .filter(F.struct("dv", "v") < F.struct("dw", "w"))
    )
    per_u = {r["u"]: r["n"] for r in
             wedges.groupBy("u").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0 not in per_u  # hub enumerates no wedges
    assert sum(per_u.values()) <= 2 * m  # linear, not C(m,2)


def test_label_propagation_two_cliques(spark):
    from character_identification_spark.operators.graph import label_propagation

    # Two 4-cliques joined by one bridge edge: LPA must collapse each
    # clique to its minimum node id and keep the cliques apart.
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], "src long, dst long")
    out = {r["node"]: r["community"] for r in label_propagation(edges, n_iters=4).collect()}
    assert {out[i] for i in range(4)} == {0}
    assert {out[i] for i in range(10, 14)} == {10}


def test_label_propagation_min_label_tiebreak(spark):
    from character_identification_spark.operators.graph import label_propagation

    # Path 0-1-2: after one round every vote set ties at n=1 → each node
    # takes its smallest neighbor label.
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {r["node"]: r["community"] for r in label_propagation(edges, n_iters=1).collect()}
    assert out == {0: 1, 1: 0, 2: 1}


def test_bfs_distances_path_graph(spark):
    """Path 0-1-2-3-4-5 with seed {0}: dist = node index, truncated at
    n_rounds; node 6 is disconnected and must be absent."""
    from character_identification_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(6, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, seeds, n_rounds=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_distances_multi_source_min(spark):
    """Seeds {0, 5} on the path 0-1-2-3-4-5: every node takes the hop
    distance to its NEAREST seed (the min), and direction is ignored."""
    from character_identification_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, seeds, n_rounds=4).collect()}
    assert out == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2, 3: 2}


def test_bfs_distances_exhausted_frontier_deterministic(spark):
    """Rounds past graph exhaustion change nothing, and repeated runs
    are identical."""
    from character_identification_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    a = sorted(map(tuple, bfs_distances(edges, seeds, n_rounds=2).collect()))
    b = sorted(map(tuple, bfs_distances(edges, seeds, n_rounds=6).collect()))
    assert a == b == [(0, 0), (1, 1), (2, 2)]
