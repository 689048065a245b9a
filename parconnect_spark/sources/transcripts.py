"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int, role: string, text: string,
    tool: string, ts: timestamp

Fully Spark-native generation: ``spark.range`` + column arithmetic — no
driver-side data, no RNG state, so the table is identical at any
parallelism level (the determinism the reference gets from fixed Kronecker
seeds, /root/reference/src/graphGen/graph500/graph500Gen.hpp:74).

Skew: conversation lengths follow a truncated power-ish tail (the first
``n_hubs`` conversations are ``hub_factor``× longer) and tool usage is
Zipf-flavored (low tool ids picked far more often) — hub conversations and
hot tools create exactly the degree skew BASELINE.json requires the engine
to handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROLES = ["user", "assistant", "system"]
_MIX_A = 1_000_003
_MIX_B = 7_919
_MIX_C = 2_654_435_761  # Knuth multiplicative constant


def _mix(c: F.Column, t: F.Column, salt: int) -> F.Column:
    """Deterministic 31-bit mixer over (conv, turn, salt) — plain long
    arithmetic, reproducible anywhere (incl. ANSI SQL). Reduced mod 2^31-1
    before the Knuth multiply so no intermediate exceeds signed-64 even at
    billions of conversations (ANSI overflow-safe)."""
    m31 = F.lit(2_147_483_647)
    base = F.pmod(c * _MIX_A + t * _MIX_B + F.lit(salt), m31)
    return F.pmod(base * _MIX_C, m31)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    base_turns: int = 6,
    n_hubs: int = 4,
    hub_factor: int = 25,
    n_tools: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Build the transcripts DataFrame. ~n_convs·base_turns rows plus hub tails."""
    convs = spark.range(n_convs).select(F.col("id").alias("c"))
    sized = convs.withColumn(
        "n_turns",
        F.when(
            F.col("c") < n_hubs, F.lit(base_turns * hub_factor)
        ).otherwise(
            (F.lit(2) + F.pmod(_mix(F.col("c"), F.lit(0), seed), F.lit(base_turns * 2 - 1))).cast("int")
        ),
    )
    turns = sized.select(
        "c", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("t")
    )
    m1 = _mix(F.col("c"), F.col("t"), seed + 1)
    m2 = _mix(F.col("c"), F.col("t"), seed + 2)
    m3 = _mix(F.col("c"), F.col("t"), seed + 3)
    role = (
        F.when(F.pmod(F.col("t"), F.lit(2)) == 0, F.lit("user"))
        .when(F.pmod(m1, F.lit(11)) == 0, F.lit("system"))
        .otherwise(F.lit("assistant"))
    )
    # Zipf-flavored tool choice: squaring a uniform skews toward low ids.
    tool_id = F.pmod((m2 * m2), F.lit(n_tools * n_tools))
    tool = F.when(
        (role == "assistant") & (F.pmod(m3, F.lit(3)) == 0),
        F.concat(F.lit("tool_"), F.floor(F.sqrt(tool_id)).cast("string")),
    ).otherwise(F.lit(None).cast("string"))
    text = F.concat(
        F.lit("conv "),
        F.col("c").cast("string"),
        F.lit(" turn "),
        F.col("t").cast("string"),
        F.lit(" token "),
        F.pmod(m1, F.lit(997)).cast("string"),
    )
    ts = F.timestamp_seconds(
        F.lit(1_704_067_200)  # 2024-01-01T00:00:00Z
        + F.col("c") * 86_400
        + F.col("t") * 37
    )
    return turns.select(
        F.concat(F.lit("conv_"), F.col("c").cast("string")).alias("conv_id"),
        F.col("t").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
