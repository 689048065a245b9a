"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data pipeline extensions (no reference analogue; SURVEY.md scope
extension). Everything is built-in Catalyst expressions; the only shuffles
are the groupBys/joins inherent to the algorithms.

Scale notes:
* exact dedup — one hash aggregate on a fingerprint column.
* n-gram Jaccard — exact pairwise similarity *restricted to candidate pairs
  that share a shingle*: for realistic corpora shingle-sharing is sparse, so
  the self-join stays near-linear. Hot shingles (boilerplate) are the skew
  risk → ``max_shingle_df`` drops shingles appearing in more than that many
  docs (standard stop-shingle trick), bounding any key's fan-out.
* MinHash+LSH — signatures via k independent affine permutations of the
  shingle hash (all JVM-side: xxhash64 + modular arithmetic + groupBy mins),
  banded into buckets; candidate pairs only within buckets.
* SimHash — 64 per-bit weighted sums over token hashes (explode + 64
  conditional sums — one aggregate pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.cache import scoped_persist
from parconnect_spark.functions.text import tokens_col

_M31 = (1 << 31) - 1
# MinHash permutation modulus: h, a, b all < 2^31 makes a·h wrap ~2^31 times
# mod p — a well-mixed universal hash family (a·h mod a LARGER prime like
# 2^61-1 would wrap at most twice and stay near-monotone in h, collapsing
# all "permutations" onto the same argmin shingle).
_PERM_P = _M31


def md5int(col: F.Column, offset: int = 1, chars: int = 8) -> F.Column:
    """Deterministic integer hash from md5 hex digits [offset, offset+chars).

    All JVM-side (md5 + conv base-16), and — the point — bit-for-bit
    replicable in any ANSI engine (the DuckDB oracle recomputes it as a
    positional hex fold), unlike xxhash64/murmur whose seeds and mixing are
    Spark-internal. chars ≤ 15 keeps the value inside signed-64."""
    return F.conv(F.substring(F.md5(col), offset, chars), 16, 10).cast("long")


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Distinct (id, shingle) pairs; shingle = n consecutive whitespace
    tokens joined by single spaces."""
    toks = tokens_col(F.col(text_col))
    sh = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)),"
        f" i -> array_join(slice(_toks, i, {n}), ' '))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_dup_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int | None = None,
) -> DataFrame:
    """(id, fp, group_size): docs sharing an md5 fingerprint of the FULL
    normalized (lower-cased, whitespace-collapsed) text — genuinely exact
    duplicates; md5 is one pass regardless of length. Pass ``prefix`` to
    fingerprint only the first N normalized chars instead (an opt-in
    *blocking* key for cheap candidate grouping, NOT exact dedup)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    if prefix is not None:
        norm = norm.substr(1, prefix)
    fps = docs.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("group_size"))
    return fps.join(sizes, "fp").select("id", "fp", "group_size")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold).

    Candidate generation by shared shingle; ``max_shingle_df`` (default 1000
    — a hot shingle shared by >1000 docs means >10^6 candidate pairs from
    that key alone) drops ubiquitous shingles to bound join fan-out on
    boilerplate-heavy corpora. Jaccard is computed over the SAME filtered
    shingle universe in numerator and denominator, so the reported value is
    the exact Jaccard of the post-filter shingle sets (pass None for the
    unfiltered exact Jaccard — quadratic risk at scale)."""
    sh = shingles(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        # The census stays a groupBy (map-side combined — a boilerplate
        # shingle in a billion docs is ≤1 partial row per input partition;
        # a window-df formulation would serialize that key into one task).
        # What IS cached is the FILTERED table: its three consumers (sizes,
        # both join sides) then reuse one anti-join evaluation instead of
        # re-filtering per consumer — measured 25-35% off the query at
        # sf0.1 vs caching the raw shingle table.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh_used = scoped_persist(sh.join(hot, "shingle", "left_anti"))
    else:
        sh_used = scoped_persist(sh)
    sizes = sh_used.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_used.select(F.col("id").alias("id_a"), "shingle")
    b = sh_used.select(F.col("id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("_nb"))
    out = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_shared")
                / (F.col("_na") + F.col("_nb") - F.col("_shared")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def prefix_filter_pairs(
    docs: DataFrame,
    threshold: tuple[int, int] = (3, 5),
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via PPJoin-style PREFIX
    FILTERING (Bayardo et al. WWW'07 / Xiao et al. WWW'08) — the
    lossless alternative to ``ngram_jaccard_pairs``'s stop-shingle cap.

    ``threshold`` is a RATIONAL (num, den) so every filter is integer
    arithmetic: a pair qualifies iff den·|a∩b| ≥ num·|a∪b| — no float
    boundary anywhere, hence bit-stable against any ANSI oracle.

    Why this scales where shared-shingle joins don't: order the shingle
    universe globally by (document frequency ASC, shingle) — rarest first —
    and take from each doc only its first p = |s| − ceil(τ·|s|) + 1
    shingles under that order. The prefix lemma guarantees two sets with
    Jaccard ≥ τ share a token in BOTH prefixes (if all |a∩b| ≥ ceil(τ·|a|)
    shared elements sat past a's prefix, the suffix — only ceil(τ·|a|) − 1
    slots — couldn't hold them). So the candidate join runs on prefix
    tokens only: at τ=0.6 that is ~40% of each doc's shingles, and they are
    by construction the RAREST ones, so boilerplate shingles (the skew
    keys that force ``max_shingle_df``'s lossy cap) fall out of the join
    key distribution instead of out of the answer. A paired length filter
    (den·min(|a|,|b|) ≥ num·max — Jaccard ≥ τ forces min ≥ τ·max) prunes
    cross-size candidates before the distinct. Verification then computes
    the exact intersection over candidates only. Result = the UNFILTERED
    exact Jaccard join (``ngram_jaccard_pairs(max_shingle_df=None)``),
    at bounded candidate volume.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ num/den,
    computed over the full shingle universe."""
    from pyspark.sql import Window

    num, den = threshold
    sh = scoped_persist(shingles(docs, id_col, text_col, n))
    # global rarity order: df census is one map-side-combined aggregate
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # per-doc rank under (df, shingle); window partitions by DOC id —
    # bounded by shingles-per-doc, no hot-key risk (contrast: a window
    # over shingle would serialize boilerplate keys)
    w = Window.partitionBy("id").orderBy("_df", "shingle")
    ranked = (
        sh.join(dfc, "shingle")
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("id")))
    )
    # p = n - ceil(num*n/den) + 1, all integer (`div` = floor division on
    # longs; num*n + den - 1 stays far inside signed-64)
    pre = ranked.where(
        F.col("_rk")
        <= F.col("_n") - F.expr(f"({num}*_n + {den} - 1) div {den}") + 1
    ).select("id", "shingle", "_n")
    pa = pre.select(
        F.col("id").alias("id_a"), "shingle", F.col("_n").alias("_na")
    )
    pb = pre.select(
        F.col("id").alias("id_b"), "shingle", F.col("_n").alias("_nb")
    )
    cand = (
        pa.join(pb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            den * F.least("_na", "_nb") >= num * F.greatest("_na", "_nb")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify over candidates only: fan candidates out by a's
    # shingles, keep rows present in b — |a∩b| per pair
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            den * F.col("_c")
            >= num * (F.col("_na") + F.col("_nb") - F.col("_c"))
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6
            ).alias("jaccard"),
        )
    )


def _minhash_perm_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a·x + b) mod _PERM_P,
    a ∈ [1, p), b ∈ [0, p)."""
    coeffs = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_PERM_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _PERM_P
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(
    docs: DataFrame,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """(id, sig: array<long>) — k-permutation MinHash over shingle hashes.

    Shingle hash = md5-derived integer (JVM-side md5 + base-16 conv; chosen
    over xxhash64 so the DuckDB oracle replicates signatures bit-for-bit);
    permutations are affine maps mod the Mersenne prime 2^31-1 (_PERM_P),
    computed as column arithmetic on the positive remainder. The modulus is
    deliberately 2^31-1, not 2^61-1: with h, a, b < 2^31 the product a·h
    wraps ~2^31 times mod p (a well-mixed universal family), whereas mod a
    prime ≫ h the map stays near-monotone in h and every "permutation"
    collapses onto the same argmin shingle."""
    sh = shingles(docs, id_col, text_col, n)
    # h < 2^31 keeps a·h + b well inside signed-64 (no overflow even under
    # ANSI mode)
    hashed = sh.select("id", F.pmod(md5int(F.col("shingle")), F.lit(_M31)).alias("h"))
    mins = [
        F.min(
            F.pmod(
                F.col("h") * F.lit(a) + F.lit(b),
                F.lit(_PERM_P),
            )
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(_minhash_perm_coeffs(k))
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"_m{i}" for i in range(k)]).alias("sig"))


def _band_keys(signatures: DataFrame, bands: int, k: int) -> DataFrame:
    """(id, band, bh) — one row per band; bh = the band's signature values
    joined as a string (portable — any engine reproduces it; equality
    semantics identical to hashing it)."""
    rows = k // bands
    return signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[bnd * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ).alias("bh"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, k: int | None = None
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from MinHash signatures.

    ``k`` = signature length; pass it when known (internal callers do) —
    the fallback probes one row, which costs an extra Spark job."""
    if k is None:
        k = len(signatures.select("sig").first()["sig"])
    banded = _band_keys(signatures, bands, k)
    a = banded.select(F.col("id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    k: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact shingle Jaccard — the
    scale path for near-dedup: candidates from banding, exactness from the
    verification join (only over candidates, not all pairs)."""
    sigs = minhash_signatures(docs, k, id_col, text_col, n)
    cands = lsh_candidate_pairs(sigs, bands, k=k)
    sh = scoped_persist(shingles(docs, id_col, text_col, n))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    shared = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("_nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 60  # 15 md5 hex digits — non-negative in signed-64, portable


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: long) — 60-bit SimHash over whitespace tokens.

    Token hash = md5-derived 60-bit integer (always ≥ 0, so shifts/band
    tests agree across engines and the DuckDB oracle replicates exactly);
    per bit position the signed vote sum is a conditional aggregate — 60
    sums in a single groupBy pass, all codegen."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("id", md5int(F.col("tok"), 1, 15).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"_b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("id").agg(*votes)
    acc = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        acc = acc + F.when(
            F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("id", acc.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, candidate-
    generated by 4-way band equality (any identical 15-bit quarter ⇒
    candidate — exact for max_hamming ≤ 3 by pigeonhole)."""
    sh = scoped_persist(simhash(docs, **kw))
    quarters = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned(F.col("simhash"), q * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.q").alias("q"), F.col("bb.qh").alias("qh"))
    a = quarters.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("_ha"), "q", "qh"
    )
    b = quarters.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("_hb"), "q", "qh"
    )
    cand = (
        a.join(b, ["q", "qh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def near_dup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-cluster canonicalization: the step a training-data pipeline
    runs AFTER near-dup pair generation — connected components over the
    pair graph (transitively closing A~B~C into one cluster), then every
    document maps to the minimum id of its cluster (itself when unique).
    "Keep one per cluster" is then ``WHERE doc_id = canonical_id``.

    ``pairs``: DataFrame[id_a, id_b] from any of the near-dup generators
    (minhash/simhash/ngram/embedding — they compose). Runs on the same
    two_phase CC plan as the graph queries (hub-split window round), so a
    pathological duplicate cluster (e.g. one boilerplate page duplicated
    millions of times) is exactly the hub case the CC engine already
    handles. Returns DataFrame[<id_col>, canonical_id]."""
    from parconnect_spark.plans.connectivity import connected_components

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges).labels
    return (
        docs.select(id_col)
        .join(labels, docs[id_col] == labels["v"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("canonical_id"),
        )
    )


def _bloom_positions(fp: F.Column, n_bits: int, n_hashes: int) -> list[F.Column]:
    """k bit positions from an md5-hex fingerprint: disjoint 8-hex-digit
    (32-bit) windows of the digest, each reduced mod n_bits — JVM-side,
    and byte-replicable by the Python prefilter (int(fp[o:o+8], 16))."""
    if n_hashes > 4:
        raise ValueError("md5 hex has 32 digits: at most 4 disjoint 32-bit windows")
    return [
        F.conv(F.substring(fp, 1 + 8 * i, 8), 16, 10).cast("long") % n_bits
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    blocklist: DataFrame,
    fp_col: str = "fp",
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> bytes:
    """Distributed Bloom-filter build: per-Arrow-batch packed bitmaps
    (mapInPandas), OR-reduced on the driver. The collect moves
    n_batches × n_bits/8 bytes — never the keys themselves — which is the
    treeAggregate shape a 10^9-row blocklist needs (the naive
    collect-all-positions moves k rows per key)."""
    import numpy as np

    nb = n_bits
    pos = blocklist.select(
        *[
            p.alias(f"_p{i}")
            for i, p in enumerate(
                _bloom_positions(F.col(fp_col), nb, n_hashes)
            )
        ]
    )

    def to_bitmaps(batches):
        for pdf in batches:
            bm = np.zeros(nb // 8, dtype=np.uint8)
            for c in pdf.columns:
                p = pdf[c].to_numpy(dtype=np.int64)
                np.bitwise_or.at(bm, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
            import pandas as pd

            yield pd.DataFrame({"bm": [bm.tobytes()]})

    out = np.zeros(nb // 8, dtype=np.uint8)
    for row in pos.mapInPandas(to_bitmaps, schema="bm binary").collect():
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_might_contain(
    df: DataFrame,
    bitmap: bytes,
    fp_col: str = "fp",
    n_hashes: int = 3,
    out_col: str = "_might",
) -> DataFrame:
    """Adds a boolean ``out_col``: Bloom membership test of ``fp_col``
    against ``bitmap`` (torch-free, one Arrow-vectorized pandas UDF over
    the k JVM-computed positions; the bitmap ships once per executor via
    SparkContext.broadcast, not per task in the closure)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_bits = len(bitmap) * 8
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bitmap)

    @pandas_udf("boolean")
    def _test(*cols):
        import pandas as pd

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        ok = None
        for c in cols:
            p = c.to_numpy(dtype=np.int64)
            bit = (bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1
            ok = bit.astype(bool) if ok is None else (ok & bit.astype(bool))
        return pd.Series(ok)

    return df.withColumn(
        out_col, _test(*_bloom_positions(F.col(fp_col), n_bits, n_hashes))
    )


def bloom_blocklist_filter(
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT blocklist anti-join with a Bloom prefilter — the 100-TB shape
    for "drop every corpus doc whose fingerprint is on a list too big to
    broadcast raw": a plain anti-join shuffles the FULL corpus on fp; here
    the blocklist's Bloom bitmap (n_bits/8 bytes — ~10 bits/key for ~1% FP
    rate, so a 10^9-key list fits in ~1.2 GB, broadcastable where the raw
    keys are not) classifies every corpus row map-side. Bloom "no" has NO
    false negatives ⇒ those rows are provably clean and never shuffle;
    only the "maybe" sliver (true hits + FP-rate stragglers) pays the
    exact anti-join that kills false positives. Output is therefore EXACT
    — the bitmap sizes the shuffle, never the answer.

    Returns (id, fp) of surviving docs; fp = md5 of the lower-cased,
    whitespace-collapsed text (``exact_dup_groups``'s fingerprint), so
    blocklisting is by CONTENT: any exact duplicate of a listed text is
    dropped too. ``blocklist`` must carry md5-hex strings in ``fp_col``."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    fps = corpus.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))
    bl = blocklist.select(F.col(fp_col).alias("fp"))
    bm = bloom_bitmap(bl, "fp", n_bits, n_hashes)
    marked = bloom_might_contain(fps, bm, "fp", n_hashes)
    clean = marked.where(~F.col("_might")).drop("_might")
    maybe = marked.where(F.col("_might")).drop("_might")
    rescued = maybe.join(bl, "fp", "left_anti")
    return clean.unionByName(rescued).select("id", "fp")


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_overlap_frac: float = 0.5,
    max_shingle_df: int | None = 1000,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination detection: for each (train doc, benchmark
    doc) pair sharing n-gram shingles, the fraction of the BENCHMARK doc's
    shingles that also appear in the train doc — the standard direction
    for eval-set leakage ("how much of this eval item is in my training
    corpus"). Returns DataFrame[train_id, bench_id, shared, overlap_frac]
    for pairs with overlap_frac >= ``min_overlap_frac``.

    Scale shape (the 100-TB case is a huge train corpus vs a small, fixed
    benchmark suite): the train shingle table is never shuffled by doc —
    candidates come from the shingle-key join against the benchmark side,
    which ``broadcast_benchmark=True`` (default) ships map-side, so the
    whole check is one scan of the train shingles plus a partial-agg on
    (train_id, bench_id). ``max_shingle_df`` drops shingles shared by more
    than that many TRAIN docs (boilerplate) from BOTH sides, so numerator
    and denominator count over the same filtered universe and the ratio
    stays an exact set-overlap of the post-filter shingle sets.
    """
    tr = shingles(train, id_col, text_col, n)
    be = shingles(benchmark, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = (
            tr.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        hot = scoped_persist(hot)
        tr = tr.join(hot, "shingle", "left_anti")
        be = be.join(hot, "shingle", "left_anti")
    be = scoped_persist(be)
    bench_sizes = be.groupBy("id").agg(F.count(F.lit(1)).alias("_nb"))
    be_side = be.select(F.col("id").alias("bench_id"), "shingle")
    if broadcast_benchmark:
        be_side = F.broadcast(be_side)
        bench_sizes = F.broadcast(bench_sizes)
    shared = (
        tr.select(F.col("id").alias("train_id"), "shingle")
        .join(be_side, "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(bench_sizes, shared["bench_id"] == bench_sizes["id"])
        .select(
            "train_id",
            "bench_id",
            "shared",
            F.round(F.col("shared") / F.col("_nb"), 6).alias("overlap_frac"),
        )
        .where(F.col("overlap_frac") >= min_overlap_frac)
    )


def boilerplate_dedup(
    rows: DataFrame,
    text_col: str = "text",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    max_groups: int = 8,
) -> DataFrame:
    """Corpus-level boilerplate removal — the paragraph/turn analogue of
    CCNet-style line dedup for transcript corpora: an exact text that
    appears in MORE than ``max_groups`` distinct groups (conversations) is
    boilerplate (canned system prompts, templated assistant replies); every
    occurrence is dropped except ONE canonical keeper — the
    lexicographically smallest (group, order) pair — so each distinct text
    survives exactly once for downstream statistics. Texts at or under the
    threshold pass through untouched.

    Plan (skew-safe by construction): one hash aggregate keyed on the
    text's xxhash64 fingerprint (distinct-group count + min (group, order)
    struct — both partially aggregated map-side, so a boilerplate string
    with 10^9 occurrences contributes <= one row per input partition) and
    one fingerprint equi-join back; NO windows — a row_number() over the
    text partition would serialize exactly the viral keys this operator
    exists to handle (AQE splits the join's skewed key instead). The
    fingerprint is a join key only; the canonical keeper is decided on the
    real (group, order) values, so a hash collision can at worst merge two
    texts' frequency counts, never pick a nondeterministic keeper.

    Returns the surviving rows: (group, order, text, n_groups) sorted
    keys upstream. ``n_groups`` is the corpus-wide distinct-group
    frequency — kept so downstream filters can re-threshold without a
    second census."""
    h = F.xxhash64(F.col(text_col))
    stats = (
        rows.select(
            h.alias("_h"),
            F.col(group_col).alias("_g"),
            F.col(order_col).alias("_o"),
        )
        .groupBy("_h")
        .agg(
            F.countDistinct("_g").alias("n_groups"),
            F.min(F.struct(F.col("_g"), F.col("_o"))).alias("_keep"),
        )
    )
    return (
        rows.join(stats, h == stats["_h"])
        .where(
            (F.col("n_groups") <= max_groups)
            | (
                (F.col(group_col) == F.col("_keep._g"))
                & (F.col(order_col) == F.col("_keep._o"))
            )
        )
        .select(group_col, order_col, text_col, "n_groups")
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span statistics at token n-gram
    granularity — the substring-level dedup signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") that
    document-level MinHash/SimHash misses: a boilerplate paragraph pasted
    into otherwise-distinct documents.

    A token n-gram is DUPLICATED when it occurs in ≥ ``min_docs`` distinct
    documents. Per document (with ≥ n tokens) this returns

        DataFrame[id_col, n_tokens, n_grams, n_dup_grams, n_dup_tokens,
                  dup_gram_ratio, dup_token_ratio]

    where ``n_dup_grams`` counts the document's duplicated n-gram
    OCCURRENCES (with multiplicity) and ``n_dup_tokens`` the distinct
    token positions covered by at least one duplicated gram (the
    interval-union coverage a span-removal pass would excise). Counts are
    exact int64; the two ratios are the only doubles (rounded 6dp).

    Scale shape: grams are derived per document with a narrow
    transform+slice projection (no self-join, no window); the corpus
    document-frequency table is ONE distinct + ONE map-side-combined
    aggregate on the gram's md5 (64-hex-truncated) key; everything joins
    back on that hash equi-key. A viral boilerplate gram is an
    AQE-splittable join key — never a window partition. Coverage is one
    bounded explode (n rows per duplicated gram occurrence) + a distinct.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    toked = docs.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("_ts"),
    ).select(
        id_col,
        F.size("_ts").alias("n_tokens"),
        # guard: Spark's sequence(1, k) DESCENDS for k < 1, so short docs
        # must take the empty branch explicitly
        F.expr(
            f"CASE WHEN size(_ts) >= {n} THEN "
            f"transform(sequence(1, size(_ts) - {n} + 1), "
            f"i -> struct(i AS pos, md5(concat_ws(' ', slice(_ts, i, {n}))) AS g)) "
            f"ELSE array() END"
        ).alias("_grams"),
    )
    grams = scoped_persist(
        toked.where(F.size("_grams") > 0).select(
            id_col,
            "n_tokens",
            F.explode("_grams").alias("_e"),
        ).select(id_col, "n_tokens", F.col("_e.pos").alias("pos"), F.col("_e.g").alias("g"))
    )
    dup = (
        grams.select(id_col, "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("g")
    )
    dgrams = grams.join(dup, "g", "left_semi")
    per_gram = dgrams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_grams")
    )
    covered = (
        dgrams.select(
            id_col, F.explode(F.expr(f"sequence(pos, pos + {n} - 1)")).alias("_i")
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    )
    base = grams.groupBy(id_col).agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    return (
        base.join(per_gram, id_col, "left")
        .join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.round(
                F.coalesce("n_dup_grams", F.lit(0)) / F.col("n_grams"), 6
            ).alias("dup_gram_ratio"),
            F.round(
                F.coalesce("n_dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_token_ratio"),
        )
    )


def source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    n: int = 4,
    text_col: str = "text",
    max_groups_per_shingle: int | None = 1000,
) -> DataFrame:
    """Pairwise corpus overlap between groups (sources / domains /
    snapshots): for every group pair that shares at least one distinct
    n-token shingle, the exact intersection size and Jaccard — the
    cross-source contamination/redundancy matrix a corpus-mixing pass
    reads before setting sampling weights.

    All set sizes are exact integers over DISTINCT (group, shingle) pairs;
    ``jaccard_pm`` is the integer per-mille ``n_common·1000 div
    (n_a + n_b − n_common)`` so no engine ever compares a float. Scale
    shape: candidate pairs come from the shared-shingle equi-join (the
    ngram_jaccard_pairs discipline) — a shingle present in g groups fans
    out g², so ``max_groups_per_shingle`` drops ubiquitous boilerplate
    shingles first (for a 10⁶-domain web corpus this is the load-bearing
    skew guard; the filter is a near-free map-side-combined aggregate).
    Dropped shingles leave numerator AND denominator, so the reported
    value is the exact Jaccard of the post-filter shingle sets."""
    sh = shingles(docs, id_col=group_col, text_col=text_col, n=n).select(
        F.col("id").alias("g"), "shingle"
    )
    if max_groups_per_shingle is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_gf"))
            .where(F.col("_gf") > max_groups_per_shingle)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    # consumed three ways (two join sides + per-group sizes)
    sh = scoped_persist(sh)
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("g").alias("group_a"), "shingle")
    b = sh.select(F.col("g").alias("group_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.withColumnRenamed("g", "group_a")), "group_a"
        )
        .withColumnRenamed("n_sh", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("g", "group_b")), "group_b"
        )
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "group_a",
            "group_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "CAST(n_common * 1000 AS BIGINT) div "
                "CAST(n_a + n_b - n_common AS BIGINT)"
            ).alias("jaccard_pm"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.6,
    k: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Delta-vs-corpus dedup check — the PRODUCTION dedup shape: a new
    batch arrives and each new doc is checked against the EXISTING corpus
    without re-clustering it (at 100 TB you never re-run all-pairs on the
    full corpus; you probe it with the delta).

    Per new doc:
      exact_dup  its full-text fingerprint (exact_dup_groups' md5) exists
                 in the corpus;
      near_dup   some corpus doc reaches n-gram Jaccard >= ``threshold``
                 among MinHash band-bucket candidates (the same k/bands
                 signature scheme as minhash_near_dup_pairs, so recall
                 characteristics are shared — a pair missed by every band
                 is missed here too, the declared LSH contract);
      match_id / jaccard   the best verified corpus match (highest
                 Jaccard, ties to the smallest corpus id), NULL when none.

    Scale shape: the corpus side contributes one signature/banding pass
    (amortizable — persist or precompute the corpus bands as an index);
    candidates are band-bucket equi-joins against the (small) delta side,
    and exact verification touches candidate pairs only. The per-new-doc
    best-match window is bounded by that doc's candidate count.

    Returns (id, exact_dup, near_dup, match_id, jaccard) — one row per
    new doc, ids from ``new_docs``."""
    from pyspark.sql import Window

    nd = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    cp = corpus.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    fp_new = nd.select("id", F.md5(norm).alias("fp"))
    fp_corp = cp.select(F.md5(norm).alias("fp")).distinct()
    exact = fp_new.join(fp_corp, "fp", "left_semi").select(
        "id", F.lit(True).alias("exact_dup")
    )

    sig_new = minhash_signatures(nd, k=k, id_col="id", n=n)
    sig_corp = minhash_signatures(cp, k=k, id_col="id", n=n)
    bn = _band_keys(sig_new, bands, k).select(
        F.col("id").alias("new_id"), "band", "bh"
    )
    bc = _band_keys(sig_corp, bands, k).select(
        F.col("id").alias("corp_id"), "band", "bh"
    )
    cands = bn.join(bc, ["band", "bh"]).select("new_id", "corp_id").distinct()

    sh_new = scoped_persist(shingles(nd, "id", "text", n))
    sh_corp = scoped_persist(shingles(cp, "id", "text", n))
    sz_new = sh_new.groupBy("id").agg(F.count(F.lit(1)).alias("_na"))
    sz_corp = sh_corp.groupBy("id").agg(F.count(F.lit(1)).alias("_nb"))
    inter = (
        cands.join(sh_new.select(F.col("id").alias("new_id"), "shingle"), "new_id")
        .join(
            sh_corp.select(F.col("id").alias("corp_id"), "shingle"),
            ["corp_id", "shingle"],
        )
        .groupBy("new_id", "corp_id")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    verified = (
        inter.join(sz_new.withColumnRenamed("id", "new_id"), "new_id")
        .join(sz_corp.withColumnRenamed("id", "corp_id"), "corp_id")
        .select(
            "new_id",
            "corp_id",
            F.round(
                F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.desc("jaccard"), F.asc("corp_id")
    )
    best = (
        verified.withColumn("_rk", F.row_number().over(w))
        .where("_rk = 1")
        .select(
            F.col("new_id").alias("id"),
            F.col("corp_id").alias("match_id"),
            "jaccard",
        )
    )
    return (
        nd.select("id")
        .join(exact, "id", "left")
        .join(best, "id", "left")
        .select(
            "id",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.col("match_id").isNotNull().alias("near_dup"),
            "match_id",
            "jaccard",
        )
    )
