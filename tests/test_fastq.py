"""FASTQ → de Bruijn source (deBruijnGraphGen.hpp parity: canonical k-mers,
adjacent-overlap edges, both directions, alphabet restriction)."""

import pytest

from parconnect_spark.plans.connectivity import connected_components
from parconnect_spark.sources.fastq import (
    debruijn_edges,
    debruijn_edges_from_fastq,
    read_fastq_sequences,
)

FASTQ = """@read1
ACGTACGTAC
+
IIIIIIIIII
@read2
TTTTGGGGCCCC
+
IIIIIIIIIIII
"""


def _revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def _canon_id(kmer):
    enc = lambda s: int(s.translate(str.maketrans("ACGT", "0123")), 4)
    return min(enc(kmer), enc(_revcomp(kmer)))


def _expected_edges(seq, k):
    out = set()
    for i in range(len(seq) - k):
        a, b = seq[i : i + k], seq[i + 1 : i + 1 + k]
        if set(a + b) <= set("ACGT"):
            out.add((_canon_id(a), _canon_id(b)))
            out.add((_canon_id(b), _canon_id(a)))
    return out


def test_fastq_parsing(spark, tmp_path):
    p = tmp_path / "r.fastq"
    p.write_text(FASTQ)
    seqs = {r["seq_id"]: r["seq"] for r in read_fastq_sequences(spark, str(p)).collect()}
    assert seqs == {0: "ACGTACGTAC", 1: "TTTTGGGGCCCC"}


def test_debruijn_edges_exact(spark):
    df = spark.createDataFrame([(0, "ACGTACGTAC")], "seq_id long, seq string")
    got = {(r["src"], r["dst"]) for r in debruijn_edges(df, k=5).collect()}
    assert got == _expected_edges("ACGTACGTAC", 5)


def test_strand_canonicalization(spark):
    """A read and its reverse complement produce the SAME edge set — the
    lex_less canonical-kmer property the reference relies on."""
    fwd = "ACGTTGCAAGGT"
    df1 = spark.createDataFrame([(0, fwd)], "seq_id long, seq string")
    df2 = spark.createDataFrame([(0, _revcomp(fwd))], "seq_id long, seq string")
    e1 = {(r["src"], r["dst"]) for r in debruijn_edges(df1, k=5).collect()}
    e2 = {(r["src"], r["dst"]) for r in debruijn_edges(df2, k=5).collect()}
    assert e1 == e2 and e1


def test_non_acgt_breaks_chain(spark):
    df = spark.createDataFrame([(0, "ACGTNACGT")], "seq_id long, seq string")
    got = {(r["src"], r["dst"]) for r in debruijn_edges(df, k=3).collect()}
    # only k-mer pairs fully inside the two clean runs survive
    assert got == _expected_edges("ACGTNACGT", 3)
    assert got  # the ACGT runs still contribute


def test_fastq_to_cc_single_contig(spark, tmp_path):
    """End-to-end: one clean read ⇒ its de Bruijn graph is one component
    (the reference's genome-assembly connectivity use case)."""
    p = tmp_path / "g.fastq"
    p.write_text(FASTQ)
    edges = debruijn_edges_from_fastq(spark, str(p), k=5)
    res = connected_components(edges)
    labels = {r["v"]: r["label"] for r in res.labels.collect()}
    # read1 has 10-5 = 5 adjacent pairs → a path → 1 component;
    # read2 likewise; they share no k-mer → 2 components
    assert len(set(labels.values())) == 2


def test_fastq_parsing_multi_partition(spark, tmp_path):
    """Record framing must survive the file being read as multiple splits
    (the offset-exscan path): force tiny splits and check every read lands
    on its exact (seq_id, sequence)."""
    n = 200
    reads = {i: ("ACGT" * 8) + "ACGT"[i % 4] * 12 for i in range(n)}
    text = "".join(
        f"@read{i}\n{reads[i]}\n+\n{'I' * len(reads[i])}\n" for i in range(n)
    )
    p = tmp_path / "big.fastq"
    p.write_text(text)
    saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        parts = spark.read.text(str(p)).rdd.getNumPartitions()
        assert parts > 1  # the split forcing actually happened
        got = {
            r["seq_id"]: r["seq"]
            for r in read_fastq_sequences(spark, str(p)).collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
    assert got == reads


def test_k_bounds():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError):
        debruijn_edges(None, k=32)
