"""PageRank over link graphs — operators/graph.py."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from html_parser_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _np_pagerank(n, pairs, n_iter, d=0.85):
    """Dense reference: same full update incl. dangling mass."""
    out_deg = np.zeros(n)
    for s, _ in pairs:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        mass = np.zeros(n)
        for s, t in pairs:
            mass[t] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (mass + dangling / n)
    return r


class TestPagerank:
    def test_matches_dense_reference_with_dangling(self, spark):
        # node 3 has no out-links (dangling); 0 is a hub
        pairs = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 3), (4, 0), (4, 3)]
        ref = _np_pagerank(5, pairs, n_iter=12)
        got = {r["node"]: r["rank"]
               for r in pagerank(_edges(spark, pairs), n_iter=12).collect()}
        assert set(got) == set(range(5))
        for i in range(5):
            assert abs(got[i] - ref[i]) < 1e-12
        # hub node 0 outranks everyone else
        assert got[0] == max(got.values())

    def test_ranks_sum_to_one(self, spark):
        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 2)]  # 4 dangles? no: 4->2
        got = pagerank(_edges(spark, pairs), n_iter=7).collect()
        assert abs(sum(r["rank"] for r in got) - 1.0) < 1e-12

    def test_cycle_converges_uniform(self, spark):
        n = 6
        pairs = [(i, (i + 1) % n) for i in range(n)]
        got = pagerank(_edges(spark, pairs), n_iter=20).collect()
        for r in got:
            assert abs(r["rank"] - 1.0 / n) < 1e-9

    def test_parallel_edges_double_mass(self, spark):
        """A page linking twice passes twice the share — the
        multigraph semantics the link miner needs."""
        single = [(0, 1), (0, 2)]
        double = [(0, 1), (0, 1), (0, 2), (0, 2)]  # same shares
        a = {r["node"]: r["rank"] for r in
             pagerank(_edges(spark, single), n_iter=5).collect()}
        b = {r["node"]: r["rank"] for r in
             pagerank(_edges(spark, double), n_iter=5).collect()}
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12
        skew = [(0, 1), (0, 1), (0, 1), (0, 2)]   # 3:1 split
        c = {r["node"]: r["rank"] for r in
             pagerank(_edges(spark, skew), n_iter=1,
                      checkpoint_every=0).collect()}
        assert c[1] > c[2]

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="n_iter"):
            pagerank(_edges(spark, [(0, 1)]), n_iter=-1)

    def test_zero_iterations_uniform(self, spark):
        got = pagerank(_edges(spark, [(0, 1), (1, 2)]), n_iter=0).collect()
        for r in got:
            assert abs(r["rank"] - 1 / 3) < 1e-15
