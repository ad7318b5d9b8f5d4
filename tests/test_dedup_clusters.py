"""Connected components + dedup clustering vs a driver-side union-find."""

from pyspark.sql import functions as F

from artigraph_spark.operators.dedup import connected_components, dedup_clusters
from artigraph_spark.sources import load

SF = "/root/testdata/sf0.001"


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (5, 3), (100, 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want
    # components labeled by their min member
    assert got[100] == 1 and got[5] == 1 and got[12] == 10 and got[21] == 20


def test_connected_components_long_chain(spark):
    """A path graph is the worst case for label propagation — converges
    within the iteration cap and still labels by min."""
    n = 40
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0}


def test_dedup_clusters_pipeline(spark):
    d = load(spark, SF, "documents")
    out = dedup_clusters(d, "doc_id", "text", jaccard_threshold=0.7)
    rows = out.collect()
    assert len(rows) == d.count()  # every doc assigned
    by_id = {r["doc_id"]: r for r in rows}
    # keepers are exactly the cluster representatives (min id)
    for r in rows:
        assert r["is_keeper"] == (r["doc_id"] == r["cluster_id"])
        assert r["cluster_id"] <= r["doc_id"]
    # every cluster id is itself a keeper
    cluster_ids = {r["cluster_id"] for r in rows}
    assert all(by_id[c]["is_keeper"] for c in cluster_ids)


def test_connected_components_bounded_pinned_storage(spark):
    """Iterative rounds release the previous round's localCheckpoint once
    the next materializes: pinned executor storage stays bounded at the
    final round's blocks (+0 or +1 RDD), never one copy per round."""
    jsc = spark.sparkContext._jsc.sc()
    pinned_before = jsc.getPersistentRDDs().size()
    n = 40  # path graph: many propagation rounds
    df = spark.createDataFrame([(i, i + 1) for i in range(n)], "a long, b long")
    out = connected_components(df)
    assert out.count() == n + 1
    assert jsc.getPersistentRDDs().size() <= pinned_before + 1
