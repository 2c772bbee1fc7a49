"""Deterministic synthetic multi-turn transcript generator.

Input-table shape per BASELINE.json ``input_hint``:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp

Everything is generated Spark-side from ``spark.range`` + column
expressions (no driver loops, no RNG objects) so the same call is
reproducible at any parallelism/cluster size — determinism comes from
``xxhash64(conv_id, turn_idx, seed)``, not from partition-dependent
random streams.

Skew: conversation lengths are Zipf-ish, plus ``n_hot`` designated hot
conversations ``hot_factor``x the median length to exercise the salted
window / skew-join paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("search", "bash", "edit", "read", "browse")

BASE_TS = "2025-01-01 00:00:00"


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    avg_turns: int = 20,
    n_hot: int = 2,
    hot_factor: int = 50,
    seed: int = 42,
    session_gap_s: int = 1800,
    partitions: int | None = None,
) -> DataFrame:
    """Return a deterministic transcripts DataFrame (see module doc)."""
    conv = spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    # Zipf-ish lengths in [4, 4*avg): u ~ U(0,1) deterministic, len ~ 4/(u+eps)
    u = (F.pmod(F.xxhash64("conv_id", F.lit(seed)), F.lit(100000)) / 100000.0)
    n_turns = F.least(
        F.lit(4 * avg_turns), (F.lit(avg_turns) / (u * 1.8 + 0.25)).cast("int") + 4
    )
    n_turns = F.when(F.col("conv_no") < n_hot, F.lit(avg_turns * hot_factor)).otherwise(
        n_turns
    )
    conv = conv.withColumn("n_turns", n_turns)
    if partitions:
        conv = conv.repartition(partitions, "conv_id")

    turns = conv.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64("conv_id", "turn_idx", F.lit(seed))
    # role: mostly alternating user/assistant; ~1/6 tool, rare system
    role = (
        F.when(F.pmod(h, 17) == 0, F.lit("system"))
        .when(F.pmod(h, 6) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), 2) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    turns = turns.withColumn("role", role)
    turns = turns.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.element_at(
                F.array(*[F.lit(t) for t in TOOLS]),
                (F.pmod(h, len(TOOLS)) + 1).cast("int"),
            ),
        ),
    )
    # deterministic pseudo-text: content is a pure function of (conv_id, turn_idx)
    # so the per-turn text-equality invariant holds under any ordering.
    turns = turns.withColumn(
        "text",
        F.concat(
            F.lit("turn "),
            F.col("turn_idx").cast("string"),
            F.lit(" of "),
            F.col("conv_id"),
            F.lit(" :: "),
            F.repeat(
                F.concat(F.hex(h), F.lit(" ")), (F.pmod(h, 7) + 1).cast("int")
            ),
        ),
    )
    # per-turn gap seconds: 1..240 normally; every ~9th turn jumps past the
    # session gap so sessionization has real boundaries.
    gap = (F.pmod(h, 240) + 1).cast("long") + F.when(
        F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 1)), 9) == 0,
        F.lit(int(session_gap_s * 2)),
    ).otherwise(F.lit(0))
    # duplicate-second bursts: zero gap every ~11th turn (tie-break on turn_idx)
    gap = F.when(
        F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 2)), 11) == 0, F.lit(0)
    ).otherwise(gap)
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    conv_start = F.pmod(F.xxhash64("conv_id", F.lit(seed + 3)), 86400 * 30).cast("long")
    turns = turns.withColumn(
        "ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(BASE_TS).cast("timestamp"))
            + conv_start
            + F.sum(gap).over(w)
        ),
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )
