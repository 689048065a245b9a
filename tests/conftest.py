import pytest

from parconnect_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="parconnect_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture()
def chain_1000(spark):
    """Reference fixture: 1000-node chain, shuffled rows, both directions
    (/root/reference/test/test_ccl_coloring.cpp:42-68)."""
    from parconnect_spark.sources.generators import chain_edges
    import pyspark.sql.functions as F

    return chain_edges(spark, 1000).orderBy(F.rand(seed=7))


@pytest.fixture()
def three_components_small(spark):
    """{2,3,4,11}, {5,6,8,10}, {50,51,52} — 3 components
    (/root/reference/test/test_ccl_coloring.cpp:75-138)."""
    und = [
        (2, 3), (3, 4), (4, 11), (2, 11),
        (5, 6), (6, 8), (8, 10), (5, 10),
        (50, 51), (51, 52),
    ]
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long").orderBy("dst")


def expected_membership(pairs):
    """Ground-truth components via union-find (same oracle role as the
    reference's sequential REM union-find,
    /root/reference/test/benchmark_sequential.cpp:234-268 — implementation
    here is the textbook path-compression union-find, not a copy)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}
