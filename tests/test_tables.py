"""sources/tables contract tests: BOTH format branches of read_table /
write_table execute. The parquet branch runs for real; the Iceberg branch
cannot (no runtime jar in this image — sources/tables.py probes and falls
back), so it is exercised against a mocked DSv2 call chain asserting the
exact reader/writer protocol a real Iceberg runtime would receive."""

import parconnect_spark.sources.tables as tables


def test_parquet_branch_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(tables, "_ICEBERG_AVAILABLE", False)
    df = spark.range(5).selectExpr("id AS v")
    path = str(tmp_path / "t")
    tables.write_table(df, path)
    got = sorted(r["v"] for r in tables.read_table(spark, path).collect())
    assert got == [0, 1, 2, 3, 4]


class _CallChain:
    """Records the fluent reader/writer calls the Iceberg branch makes."""

    def __init__(self):
        self.calls = []

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def mode(self, m):
        self.calls.append(("mode", m))
        return self

    def load(self, path):
        self.calls.append(("load", path))
        return "LOADED"

    def save(self, path):
        self.calls.append(("save", path))


class _FakeSpark:
    def __init__(self, chain):
        self.read = chain


class _FakeDF:
    def __init__(self, chain, spark):
        self.write = chain
        self.sparkSession = spark


def test_iceberg_read_branch_call_shape(monkeypatch):
    monkeypatch.setattr(tables, "_ICEBERG_AVAILABLE", True)
    chain = _CallChain()
    out = tables.read_table(_FakeSpark(chain), "db.transcripts")
    assert out == "LOADED"
    assert chain.calls == [("format", "iceberg"), ("load", "db.transcripts")]


def test_iceberg_write_branch_call_shape(monkeypatch):
    monkeypatch.setattr(tables, "_ICEBERG_AVAILABLE", True)
    chain = _CallChain()
    fake_spark = _FakeSpark(chain)
    tables.write_table(_FakeDF(chain, fake_spark), "db.labels", mode="append")
    assert chain.calls == [
        ("format", "iceberg"),
        ("mode", "append"),
        ("save", "db.labels"),
    ]


def test_read_table_evolved_merges_additive_schema(spark, tmp_path):
    from parconnect_spark.sources.tables import read_table_evolved

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    ).write.mode("append").parquet(p)
    got = {r["k"]: (r["v"], r["score"]) for r in read_table_evolved(spark, p).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_table_stats_exact(spark):
    from parconnect_spark.sources.tables import table_stats

    d = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, v string"
    )
    got = {r["column"]: tuple(r)[1:] for r in table_stats(d).collect()}
    assert got["*"][0] == 3
    assert got["k"] == (0, 2, "1", "2")
    assert got["v"] == (1, 2, "x", "y")


def test_read_transcripts_jsonl_clean_and_corrupt(spark, tmp_path):
    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.sources.jsonl import read_transcripts_jsonl

    t = synth_transcripts(spark, n_convs=10)
    p = str(tmp_path / "jl")
    t.write.json(p)
    # inject garbage: unparseable JSON, missing required key, valid row
    # with a missing OPTIONAL column (stays clean)
    extra = tmp_path / "jl" / "part-garbage.json"
    extra.write_text(
        "this is not json\n"
        '{"role": "user", "text": "no conv id"}\n'
        '{"conv_id": "cX", "turn_idx": 0, '
        '"ts": "2024-01-01T00:00:00.000"}\n'
    )
    clean, corrupt = read_transcripts_jsonl(spark, p)
    n_expected = t.count() + 1  # the cX row joins the clean set
    assert clean.count() == n_expected
    assert corrupt.count() == 2
    cx = clean.where("conv_id = 'cX'").collect()[0]
    assert cx["role"] is None and cx["turn_idx"] == 0
    # full-fidelity roundtrip of the original rows
    orig = {tuple(r) for r in t.collect()}
    back = {
        tuple(r) for r in clean.where("conv_id <> 'cX'").collect()
    }
    assert back == orig


def test_publish_with_audit_promotes_on_green(spark, tmp_path):
    from parconnect_spark.sources.tables import publish_with_audit

    d = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    p = str(tmp_path / "t")
    rep = publish_with_audit(
        d, p, [("t", "unique", "k"), ("t", "not_null", "v")]
    )
    assert all(r["published"] for r in rep.collect())
    back = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert back == [(1, "a"), (2, "b")]
    import os

    assert not os.path.exists(p + ".staging")


def test_publish_with_audit_blocks_and_keeps_staging(spark, tmp_path):
    import os

    import pytest

    from parconnect_spark.sources.tables import PublishBlocked, publish_with_audit

    d = spark.createDataFrame([(1,), (1,)], "k long")
    p = str(tmp_path / "t2")
    with pytest.raises(PublishBlocked, match=r"unique\(k\)=1"):
        publish_with_audit(d, p, [("t", "unique", "k")])
    assert not os.path.exists(p)           # nothing served
    assert os.path.exists(p + ".staging")  # evidence kept


def test_publish_with_audit_overwrites_previous(spark, tmp_path):
    from parconnect_spark.sources.tables import publish_with_audit

    p = str(tmp_path / "t3")
    publish_with_audit(
        spark.createDataFrame([(1,)], "k long"), p, [("t", "not_null", "k")]
    )
    publish_with_audit(
        spark.createDataFrame([(2,)], "k long"), p, [("t", "not_null", "k")]
    )
    assert [r["k"] for r in spark.read.parquet(p).collect()] == [2]
