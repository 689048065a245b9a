"""FASTQ → de Bruijn edge list — the reference's genome-assembly source.

parconnect builds its de Bruijn graph from FASTQ via BLISS
(/root/reference/src/graphGen/deBruijn/deBruijnGraphGen.hpp:52-142): 31-mers
over DNA {A,C,G,T}, each k-mer canonicalized by lex_less (min of the k-mer
and its reverse complement), vertex id = the packed 2-bit word
(getData()[0]; 4^31 = 2^62 fits signed-64), and an edge for every pair of
adjacent k-mers in a read (in- and out-neighbors both emitted).

Spark-first re-expression, all built-in expressions (no Python row path):

* FASTQ parsing — reads are 4-line records; sequence lines are recovered by
  global line index ≡ BLISS's FASTQParser record framing. The index is
  computed columnar in one shape: partition-local ordinal (from
  monotonically_increasing_id's pid/local decomposition) + exclusive prefix
  sum of partition sizes — the same offset-exscan trick as
  operators/relabel.dense_rank_relabel, all JVM-side (the earlier
  rdd.zipWithIndex needed two Python-serialized RDD passes).
* k-mer extraction — the shingle transform over the sequence string;
  k-mers containing non-ACGT characters are dropped (the reference
  restricts the alphabet, deBruijnGraphGen.hpp:49).
* packing — conv(translate(kmer, 'ACGT', '0123'), 4, 10): base-4 value of
  the 2-bit code with the first base most significant, so numeric order ==
  lexicographic order and lex_less is a numeric least().
* reverse complement — translate(reverse(kmer), 'ACGT', 'TGCA').

Note on id parity: BLISS packs k-mers into machine words with its own
memory layout; any injective k-mer↔id map yields an isomorphic graph, so
component counts/sizes match the reference even though raw vertex ids are
not byte-identical (asserted by the palindromic-strand test: a read and
its reverse complement produce the same edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_fastq_sequences(spark: SparkSession, path: str) -> DataFrame:
    """[seq_id: long, seq: string] — one row per FASTQ read.

    Global line index = partition-local ordinal + offset exscan: one tiny
    aggregate (one row per split) collects partition sizes, broadcast back
    as offsets. Line order within a split follows file order (same
    assumption zipWithIndex made); deterministic across the two scans
    because both jobs read identical splits."""
    from pyspark.sql import Window

    lines = (
        spark.read.text(path)
        .select("value", F.monotonically_increasing_id().alias("_mid"))
        # mid = partition_id << 33 | row-ordinal-within-partition (the
        # layout documented on monotonically_increasing_id since Spark 1.6
        # and load-bearing here: the offset exscan joins on the decomposed
        # _pid, and the sizes job + this job must plan identical file
        # splits — true within one session's deterministic FileScan. If a
        # future Spark changes the bit layout, the pmod(idx,4) framing
        # check below starts dropping/misframing records loudly (parse
        # failures in downstream k-mer tests), not silently.
        .select(
            "value",
            F.shiftrightunsigned("_mid", 33).alias("_pid"),
            F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("_local"),
        )
    )
    sizes = lines.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = sizes.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    idx = F.col("_offset") + F.col("_local")
    return (
        lines.join(F.broadcast(offsets), "_pid")
        .where(F.pmod(idx, F.lit(4)) == 1)
        .select(
            (idx / 4).cast("long").alias("seq_id"),
            F.upper(F.col("value")).alias("seq"),
        )
    )


def _kmer_id(col: F.Column) -> F.Column:
    """Packed 2-bit id of a k-mer string (A=0 C=1 G=2 T=3, first base most
    significant — numeric == lexicographic, k ≤ 31 fits signed-64)."""
    return F.conv(F.translate(col, "ACGT", "0123"), 4, 10).cast("long")


def _revcomp(col: F.Column) -> F.Column:
    return F.translate(F.reverse(col), "ACGT", "TGCA")


def debruijn_edges(
    sequences: DataFrame, k: int = 31, seq_col: str = "seq"
) -> DataFrame:
    """DataFrame[src: long, dst: long] — edges between canonical adjacent
    k-mers, both directions emitted (populateEdgeList parity:
    deBruijnGraphGen.hpp:125-139). k defaults to the reference's 31."""
    if not 1 <= k <= 31:
        raise ValueError("k must be in [1, 31] to fit a packed signed-64 id")
    # adjacent k-mer pairs in ONE array expression — no self-join: pair i
    # starts at positions (i, i+1), so each read contributes len-k pairs
    pairs = F.expr(
        f"transform(sequence(1, greatest(length({seq_col}) - {k}, 0)),"
        f" i -> struct(substring({seq_col}, i, {k}) AS a,"
        f"             substring({seq_col}, i + 1, {k}) AS b))"
    )
    adj = (
        sequences.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        # restrict alphabet: drop pairs touching any non-ACGT character
        .where(F.col("a").rlike("^[ACGT]+$") & F.col("b").rlike("^[ACGT]+$"))
        .select(
            F.least(_kmer_id(F.col("a")), _kmer_id(_revcomp(F.col("a"))))
            .alias("src"),
            F.least(_kmer_id(F.col("b")), _kmer_id(_revcomp(F.col("b"))))
            .alias("dst"),
        )
    )
    rev = adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return adj.unionByName(rev)


def debruijn_edges_from_fastq(
    spark: SparkSession, path: str, k: int = 31
) -> DataFrame:
    """FASTQ file → de Bruijn edge list (the reference source end-to-end)."""
    return debruijn_edges(read_fastq_sequences(spark, path), k=k)
