import os

import pyspark.sql.functions as F

from parconnect_spark.operators.graph import check_bidirectional
from parconnect_spark.sources.edgelist import (
    read_edgelist_text,
    write_edgelist_binary,
    write_edgelist_text,
    write_dot,
)
from parconnect_spark.sources.generators import chain_edges, kronecker_edges


def test_chain_edges(spark):
    e = chain_edges(spark, 5)
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {(0, 1), (1, 2), (2, 3), (3, 4), (1, 0), (2, 1), (3, 2), (4, 3)}


def test_kronecker_deterministic_and_sized(spark):
    e1 = kronecker_edges(spark, scale=7, edgefactor=8, both_directions=False)
    e2 = kronecker_edges(spark, scale=7, edgefactor=8, both_directions=False).repartition(11)
    assert e1.exceptAll(e2).count() == 0 and e2.exceptAll(e1).count() == 0
    n = e1.count()
    assert n <= 8 * 2**7  # self-loops dropped
    assert n > 0.8 * 8 * 2**7
    mx = e1.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
    assert mx < 2**7
    sym = kronecker_edges(spark, scale=6, edgefactor=8)
    assert check_bidirectional(sym)


def test_edgelist_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "graph.txt")
    with open(path, "w") as f:
        f.write("% a chain graph like test/data/graphDirChain.txt\n")
        f.write("% comment line two\n")
        for i in range(1, 1201):
            f.write(f"{i} {i+1}\n")
    df = read_edgelist_text(spark, path, add_reverse_edges=True)
    # reference expectation: 2400 rows, every forward+reverse pair
    # (/root/reference/test/test_graphgen.cpp:54-107)
    assert df.count() == 2400
    assert check_bidirectional(df)

    out = str(tmp_path / "out_text")
    write_edgelist_text(df, out)
    back = read_edgelist_text(spark, out + "/part-*", add_reverse_edges=False, comment="%")
    assert back.count() == 2400


def test_binary_sink_canonical(spark, tmp_path):
    e = spark.createDataFrame([(1, 2), (2, 1), (3, 4)], "src long, dst long")
    out = str(tmp_path / "bin")
    write_edgelist_binary(e, out)
    back = spark.read.parquet(out)
    assert {(r["src"], r["dst"]) for r in back.collect()} == {(1, 2), (3, 4)}


def test_dot_sink(spark, tmp_path):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = str(tmp_path / "dot")
    write_dot(e, out, "G")
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    text = "".join(open(os.path.join(out, f)).read() for f in sorted(files))
    assert "graph G {" in text and "1 -- 2;" in text and text.strip().endswith("}")
