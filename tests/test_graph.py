"""PageRank: closed-form small graphs, numpy power-iteration parity,
mass conservation with dangling nodes, and guards."""

from __future__ import annotations

import numpy as np
import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.graph import (
    pagerank,
)

SCHEMA = "src long, dst long"


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, SCHEMA)
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def _numpy_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[out == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_symmetric_cycle_is_uniform(spark):
    # 3-cycle: perfect symmetry -> uniform 1/3 at every iteration
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _ranks(spark, edges, iters=5)
    for v in got.values():
        assert abs(v - 1 / 3) < 1e-12


def test_matches_numpy_power_iteration(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 3)]
    got = _ranks(spark, edges, iters=10)
    ref = _numpy_pagerank(edges, iters=10)
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12, (k, got[k], ref[k])
    # the ranking order agrees with the reference end to end
    assert sorted(got, key=got.get) == sorted(ref, key=ref.get)


def test_dangling_mass_is_conserved(spark):
    # node 2 has NO out-edges: without redistribution total mass decays
    edges = [(0, 1), (1, 2)]
    got = _ranks(spark, edges, iters=7)
    assert abs(sum(got.values()) - 1.0) < 1e-12
    ref = _numpy_pagerank(edges, iters=7)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12


def test_parallel_edges_double_the_link(spark):
    # 0 links twice to 1, once to 2: 1 gets 2/3 of 0's mass
    edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    got = _ranks(spark, edges, iters=10)
    ref = _numpy_pagerank_parallel(edges)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12
    assert got[1] > got[2]


def _numpy_pagerank_parallel(edges, iters=10, d=0.85):
    # same as _numpy_pagerank; parallel edges already handled by looping
    return _numpy_pagerank(edges, iters=iters, d=d)


def test_guards(spark):
    df = spark.createDataFrame([(0, 1)], SCHEMA)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
