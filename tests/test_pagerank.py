"""PageRank (operators/pagerank.py): closed-form graphs, a numpy
power-iteration differential on random graphs with dangling nodes,
mass conservation, parallel-edge collapse, tol early-stop, and
argument validation."""

from __future__ import annotations

import numpy as np
import pytest

from data_governance_spark.operators.pagerank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, **kw)
    return {r["id"]: r["rank"] for r in out.collect()}


def _numpy_pr(n, edges, damping=0.85, iterations=20):
    """The same update rule, dense: uniform start, distinct edges,
    dangling mass redistributed uniformly."""
    edges = sorted(set(edges))
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[deg == 0].sum()
        nxt = np.full(n, (1 - damping) / n + damping * dangling / n)
        for s, d in edges:
            nxt[d] += damping * r[s] / deg[s]
        r = nxt
    return r


class TestClosedForm:
    def test_cycle_is_uniform(self, spark):
        n = 6
        edges = [(i, (i + 1) % n) for i in range(n)]
        got = _ranks(spark, edges, iterations=30)
        for v in got.values():
            assert abs(v - 1.0 / n) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_star_fixed_point(self, spark):
        # center 0 <-> leaves 1..m: solve the 2-variable fixed point
        m = 4
        n = m + 1
        d = 0.85
        edges = [(0, i) for i in range(1, n)] + [
            (i, 0) for i in range(1, n)
        ]
        got = _ranks(spark, edges, iterations=60)
        # r_c = (1-d)/n + d*m*r_l ; r_l = (1-d)/n + d*r_c/m
        q = (1 - d) / n
        r_c = (q + d * m * q) / (1 - d * d)
        r_l = q + d * r_c / m
        # convergence is geometric at rate d: 0.85^60 ~ 6e-5
        assert abs(got[0] - r_c) < 1e-4
        for i in range(1, n):
            assert abs(got[i] - r_l) < 1e-4

    def test_dangling_and_isolated_nodes(self, spark):
        # 0 -> 1, node 1 dangles, node 2 isolated (via nodes=)
        df_nodes = None
        edges = [(0, 1)]
        got = _ranks(spark, edges, iterations=25)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        assert got[1] > got[0]  # 1 receives, 0 only redistributes

    def test_nodes_param_includes_isolated(self, spark):
        nodes = spark.createDataFrame([(0,), (1,), (9,)], "id long")
        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        got = {r["id"]: r["rank"]
               for r in pagerank(df, nodes=nodes, iterations=10).collect()}
        assert set(got) == {0, 1, 9}
        assert abs(sum(got.values()) - 1.0) < 1e-9


class TestDifferential:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_graph_matches_numpy(self, spark, seed):
        rng = np.random.default_rng(seed)
        n = 30
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(90)
        ]
        # ensure some dangling nodes exist
        edges = [(s, d) for s, d in edges if s % 7 != 0]
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["id"]: r["rank"]
               for r in pagerank(df, nodes=nodes, iterations=12).collect()}
        want = _numpy_pr(n, edges, iterations=12)
        for i in range(n):
            assert abs(got[i] - want[i]) < 1e-9, i
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_parallel_edges_collapse(self, spark):
        a = _ranks(spark, [(0, 1), (0, 1), (1, 0)], iterations=15)
        b = _ranks(spark, [(0, 1), (1, 0)], iterations=15)
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12


class TestKnobs:
    def test_tol_early_stop_matches_long_run(self, spark):
        edges = [(i, (i * 3) % 11) for i in range(11) if i % 5 != 0]
        long = _ranks(spark, edges, iterations=200)
        tol = _ranks(spark, edges, iterations=200, tol=1e-12)
        for k in long:
            assert abs(long[k] - tol[k]) < 1e-9

    def test_info_reports_iterations_and_delta(self, spark):
        edges = [(i, (i * 3) % 11) for i in range(11) if i % 5 != 0]
        df = spark.createDataFrame(edges, "src long, dst long")
        info: dict = {}
        r = pagerank(df, iterations=200, tol=1e-10, info=info)
        r.unpersist()
        # a tiny graph converges long before the 200-iteration budget
        assert 1 <= info["iterations"] < 200
        assert info["final_delta"] is not None
        assert info["final_delta"] < 1e-10
        # fixed-iteration mode: iterations echoed, delta not measured
        info2: dict = {}
        pagerank(df, iterations=3, info=info2).unpersist()
        assert info2 == {"iterations": 3, "final_delta": None}

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.5)
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
