import pyspark.sql.functions as F
import pytest

from parconnect_spark.operators.layout import zorder_key, zorder_layout, zorder_sql


def _interleave(x, y, bits):
    v = 0
    for i in range(bits):
        v |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return v


def grid(spark, side=64):
    return spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


def test_zorder_key_matches_pure_python(spark):
    rows = zorder_key(
        grid(spark), ["x", "y"], bits=6, bounds=[(0, 63), (0, 63)]
    ).collect()
    assert rows and all(
        r["zval"] == _interleave(r["x"], r["y"], 6) for r in rows
    )


def test_zorder_layout_tiles_both_dims(spark):
    # 64x64 grid into 16 range-partitions: every file covers a 16x16 tile
    # (span 15 on BOTH dims, 256 rows each) — a row-major layout's
    # partitions would span the full 63 on y. This is the file-pruning
    # win the operator exists for.
    lay = zorder_layout(
        grid(spark), ["x", "y"], 16, bits=6, bounds=[(0, 63), (0, 63)]
    )
    spans = (
        lay.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(spans) == 16
    assert max(r["sx"] for r in spans) == 15
    assert max(r["sy"] for r in spans) == 15
    assert all(r["n"] == 256 for r in spans)


def test_zorder_auto_bounds_equals_explicit(spark):
    g = grid(spark, 32)
    auto = sorted(
        r["zval"] for r in zorder_key(g, ["x", "y"], bits=5).collect()
    )
    expl = sorted(
        r["zval"]
        for r in zorder_key(
            g, ["x", "y"], bits=5, bounds=[(0, 31), (0, 31)]
        ).collect()
    )
    assert auto == expl


def test_zorder_out_of_bounds_clamps(spark):
    d = spark.createDataFrame([(-5, 100), (3, 3)], "x long, y long")
    rows = {
        (r["x"], r["y"]): r["zval"]
        for r in zorder_key(
            d, ["x", "y"], bits=3, bounds=[(0, 7), (0, 7)]
        ).collect()
    }
    assert rows[(-5, 100)] == _interleave(0, 7, 3)
    assert rows[(3, 3)] == _interleave(3, 3, 3)


def test_zorder_guards(spark):
    d = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError, match="signed-64"):
        zorder_key(d, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="inverted"):
        zorder_key(d, ["x", "y"], bits=4, bounds=[(5, 1), (0, 7)])
    with pytest.raises(ValueError, match="overflow"):
        zorder_key(d, ["x", "y"], bits=16, bounds=[(0, 1 << 50), (0, 7)])


def test_zorder_sql_matches_spark(spark):
    # the oracle-side SQL replica (DuckDB dialect: // int division)
    import duckdb

    rows = zorder_key(
        grid(spark, 16), ["x", "y"], bits=4, bounds=[(0, 15), (0, 15)]
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE g (x BIGINT, y BIGINT)")
    con.executemany(
        "INSERT INTO g VALUES (?, ?)", [(r["x"], r["y"]) for r in rows]
    )
    expr = zorder_sql(["x", "y"], [(0, 15), (0, 15)], bits=4)
    got = {
        (x, y): z
        for x, y, z in con.execute(f"SELECT x, y, {expr} FROM g").fetchall()
    }
    assert all(got[(r["x"], r["y"])] == r["zval"] for r in rows)
