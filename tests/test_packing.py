"""Sequence packing (functions/packing): the concatenate-then-chunk map
is replayed in pure Python and must agree row-for-row, including the
boundary cases an off-by-one would flip (doc ending exactly on a chunk
boundary, doc longer than a chunk, empty doc carrying only its
separator)."""

import pyspark.sql.functions as F
import pytest

from parconnect_spark.functions.packing import (
    global_exscan,
    packing_stats,
    sequence_pack,
)


def _replay(docs, seq_len, sep):
    """Pure-Python oracle: lay docs out in id order, chunk every seq_len."""
    out = {}
    pos = 0
    for doc_id, n in sorted(docs):
        eff = n + sep
        out[doc_id] = {
            "n_tokens": n,
            "start_tok": pos,
            "seq_first": pos // seq_len,
            "seq_last": (pos + eff - 1) // seq_len,
            "head_offset": pos % seq_len,
        }
        out[doc_id]["n_seqs"] = (
            out[doc_id]["seq_last"] - out[doc_id]["seq_first"] + 1
        )
        pos += eff
    return out


def test_global_exscan_matches_python(spark):
    rows = [(i, (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    got = {
        r["id"]: r["offset"]
        for r in global_exscan(df, ["id"], "v").collect()
    }
    acc = 0
    for i, v in rows:
        assert got[i] == acc
        acc += v


def test_sequence_pack_matches_replay(spark):
    # 0-token doc, a doc exactly filling a chunk (15+1 sep = 16), a doc
    # spanning three chunks, and filler — shuffled input order.
    docs = [(0, 5), (1, 15), (2, 40), (3, 0), (4, 7), (5, 16), (6, 1)]
    df = (
        spark.createDataFrame(docs, "doc_id long, n_tokens long")
        .orderBy(F.rand(seed=3))
        .repartition(5)
    )
    packed = sequence_pack(df, seq_len=16, sep_tokens=1)
    want = _replay(docs, 16, 1)
    got = {r["doc_id"]: r.asDict() for r in packed.collect()}
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        for k, v in w.items():
            assert g[k] == v, (doc_id, k, g[k], v)


def test_sequence_pack_boundary_doc_single_chunk(spark):
    # a doc whose payload+sep ends exactly at a boundary stays in ONE chunk
    df = spark.createDataFrame([(0, 15), (1, 3)], "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r.asDict()
        for r in sequence_pack(df, seq_len=16, sep_tokens=1).collect()
    }
    assert got[0]["seq_first"] == got[0]["seq_last"] == 0
    assert got[1]["seq_first"] == 1 and got[1]["head_offset"] == 0


def test_packing_stats(spark):
    docs = [(i, 10) for i in range(10)]  # 10 docs * 11 eff = 110 tokens
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    packed = sequence_pack(df, seq_len=16, sep_tokens=1)
    row = packing_stats(packed, 16).collect()[0]
    assert row["n_docs"] == 10
    assert row["n_tokens"] == 100
    assert row["n_seqs"] == (110 - 1) // 16 + 1
    # replay the spanning count
    want = _replay(docs, 16, 1)
    assert row["n_spanning"] == sum(
        1 for w in want.values() if w["n_seqs"] > 1
    )


def test_sequence_pack_validates_args(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        sequence_pack(df, seq_len=0)
    with pytest.raises(ValueError):
        sequence_pack(df, seq_len=8, sep_tokens=0)
