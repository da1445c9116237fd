"""Engine schemas (FIXTURES.md §1/§2, SURVEY.md §1.2).

Fixed StructTypes upfront — the reference's dynamic/defensive pandas columns
become declared schemas at every DataFrame boundary (SURVEY §1.1 'Schema
system'); repair happens via coalesce, never by column existence checks.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint: Iceberg table of multi-turn conversation / agent transcripts
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

# FIXTURES.md §2 expected output
EXTRACTED_TURNS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("family", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("rule_hits", T.MapType(T.StringType(), T.IntegerType()), False),
        T.StructField("n_records", T.IntegerType(), False),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("problem_reason", T.StringType(), True),
    ]
)

# lineage/checkpoint rows (SURVEY §2.10 ST1-ST4 generalized)
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("partition_range", T.StringType(), True),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("valid_count", T.LongType(), False),
        T.StructField("rule_hit_metrics", T.MapType(T.StringType(), T.LongType()), False),
        T.StructField("status", T.StringType(), False),
    ]
)
