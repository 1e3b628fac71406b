"""Connected-components / dedup-cluster tests: exactness vs a union-find
oracle on random graphs (hypothesis), O(log n) convergence on the
diameter-pathological path graph, isolated-node handling, and the
composed dedup_clusters contract."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.operators import components


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n_nodes)}


edges_strategy = st.lists(
    st.tuples(st.integers(0, 39), st.integers(0, 39)),
    min_size=0,
    max_size=60,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_components_match_union_find(spark, edges):
    oracle = _uf_components(40, edges)
    nodes = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    ) if edges else spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in components.connected_components(
            pairs, nodes=nodes, node_col="doc_id"
        ).collect()
    }
    assert got == oracle


def test_components_path_graph_log_convergence(spark):
    """A 256-node path is the diameter worst case: naive label propagation
    needs 255 rounds; the alternating star algorithm must finish inside
    the default max_iter=25 (O(log n)) and still contract to ONE
    component rooted at 0."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "id_a long, id_b long"
    )
    out = components.connected_components(pairs).collect()
    assert len(out) == 256
    assert {r["component"] for r in out} == {0}


def test_components_scratch_dir_equivalence(spark, tmp_path):
    """Parquet-staged iteration (the scale path) returns the identical
    mapping as the localCheckpoint path."""
    edges = [(1, 7), (7, 3), (10, 11), (20, 20), (5, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {
        (r["node"], r["component"])
        for r in components.connected_components(pairs).collect()
    }
    b = {
        (r["node"], r["component"])
        for r in components.connected_components(
            pairs, scratch_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert a == b
    # self-loops dropped: 20 and 5 never touched an edge -> absent
    assert a == {(1, 1), (7, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_clusters_contract(spark):
    """dedup_clusters: every doc appears once, component = min of its
    near-dup cluster, exactly one canonical survivor per component, and
    singletons are their own canonical component."""
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 5), (5, 7), (1, 4)], "id_a long, id_b long"
    )
    rows = components.dedup_clusters(docs, pairs).collect()
    assert len(rows) == 8
    comp = {r["doc_id"]: r["component_id"] for r in rows}
    assert comp == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 2, 6: 6, 7: 2}
    canon = {r["doc_id"] for r in rows if r["is_canonical"]}
    assert canon == {0, 1, 2, 3, 6}
    # survivors = one per distinct component
    assert sorted(canon) == sorted(set(comp.values()))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_components_oriented_fast_path_matches_generic(spark, edges):
    """Round-6 fast paths (edges_distinct skip + oriented round-1 large
    star) must return the identical mapping as the generic path. Edges
    are oriented/deduped first to satisfy the caller contract the flags
    assert (the minhash pair generator guarantees both)."""
    oriented = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    oracle = _uf_components(40, oriented)
    pairs = spark.createDataFrame(
        oriented, "id_a long, id_b long"
    ) if oriented else spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    got = {
        r["node"]: r["component"]
        for r in components.connected_components(
            pairs, nodes=nodes, node_col="doc_id",
            edges_distinct=True, edges_oriented=True,
        ).collect()
    }
    assert got == oracle


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_components_pre_contract_matches_generic(spark, edges):
    """pre_contract (per-partition union-find spanning forest before the
    star rounds) must return the identical mapping as the generic path —
    on raw UNORIENTED, possibly-duplicated edges (the kernel subsumes
    both the distinct and the orientation contract)."""
    oracle = _uf_components(40, edges)
    nodes = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    ) if edges else spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in components.connected_components(
            pairs, nodes=nodes, node_col="doc_id", pre_contract=True
        ).collect()
    }
    assert got == oracle


def test_components_pre_contract_cross_partition(spark, tmp_path):
    """A 300-node path split over many partitions: every local forest is
    partial, so the star rounds must still merge across partition
    boundaries; scratch staging composes with pre_contract."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    ).repartition(16)
    out = components.connected_components(
        pairs, pre_contract=True, scratch_dir=str(tmp_path / "cc")
    ).collect()
    assert len(out) == 300
    assert {r["component"] for r in out} == {0}


def test_components_oriented_path_graph(spark):
    """The oriented fast path on the diameter-pathological path graph:
    same O(log n) convergence and single root as the generic path."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "id_a long, id_b long"
    )
    out = components.connected_components(
        pairs, edges_distinct=True, edges_oriented=True
    ).collect()
    assert len(out) == 256
    assert {r["component"] for r in out} == {0}
