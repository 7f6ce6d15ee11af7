"""Union-find / cluster label tests (no Ray)."""

from clonehunter_ray.state.unionfind import UnionFind, cluster_labels


def test_unionfind_components():
    uf = UnionFind()
    uf.union("a", "b")
    uf.union("b", "c")
    uf.union("x", "y")
    assert uf.find("a") == uf.find("c")
    assert uf.find("a") != uf.find("x")
    comps = uf.components()
    sizes = sorted(len(v) for v in comps.values())
    assert sizes == [2, 3]


def test_cluster_labels_deterministic_by_min_member():
    # edge order must not matter (order-free canonical form)
    e1 = [("b", "c"), ("a", "b"), ("x", "y")]
    e2 = [("x", "y"), ("a", "b"), ("b", "c")]
    l1 = cluster_labels(e1)
    l2 = cluster_labels(e2)
    assert l1 == l2
    # cluster containing "a" gets id 1 (min member id "a" < "x")
    assert l1["a"] == l1["b"] == l1["c"] == 1
    assert l1["x"] == l1["y"] == 2


def test_cluster_labels_transitive():
    labels = cluster_labels([("a", "b"), ("c", "d"), ("b", "c")])
    assert len(set(labels.values())) == 1
