"""Custom stateful streaming operator (streaming/stateful.py):
state evolves across micro-batches and resumes from the checkpoint."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.schema import TRANSCRIPTS
from pdf_extractor_spark.streaming.stateful import latest_state, run_running_state


def _turns(conv_id: str, idxs: list[int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pd.array(idxs, dtype="int32"),
            "role": "user",
            "text": [f"text for turn {i}" for i in idxs],
            "tool": None,
            "ts": pd.Timestamp("2024-01-01"),
        }
    )


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    input_dir = str(base / "input")
    first = pd.concat([_turns("conv_a", [0, 1, 2]), _turns("conv_b", [0, 2])])
    spark.createDataFrame(first, schema=TRANSCRIPTS).coalesce(1).write.parquet(input_dir)
    return {
        "input": input_dir,
        "ckpt": str(base / "ckpt"),
        "out": str(base / "out"),
    }


def test_first_drain_builds_state(spark, dirs):
    run_running_state(spark, dirs["input"], dirs["ckpt"], dirs["out"])
    got = {r.conv_id: r for r in latest_state(spark, dirs["out"]).collect()}
    a, b = got["conv_a"], got["conv_b"]
    assert (a.turns_seen, a.max_turn_idx, a.contiguous) == (3, 2, True)
    assert (b.turns_seen, b.max_turn_idx, b.contiguous) == (2, 2, False)  # gap at 1
    assert a.chars_seen == sum(len(f"text for turn {i}") for i in (0, 1, 2))


def test_state_resumes_from_checkpoint(spark, dirs):
    # new files arrive; SAME checkpoint -> only they are processed, and the
    # per-conversation state accumulates on top of the first drain's
    more = pd.concat([_turns("conv_a", [3]), _turns("conv_b", [1])])
    spark.createDataFrame(more, schema=TRANSCRIPTS).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["input"])
    run_running_state(spark, dirs["input"], dirs["ckpt"], dirs["out"])
    got = {r.conv_id: r for r in latest_state(spark, dirs["out"]).collect()}
    a, b = got["conv_a"], got["conv_b"]
    assert (a.turns_seen, a.max_turn_idx, a.contiguous) == (4, 3, True)
    # conv_b's gap at turn 1 is now filled: the DERIVED contiguity flag
    # (count == max_idx + 1) recovers — it must not depend on which
    # micro-batch the late turn arrived in
    assert (b.turns_seen, b.max_turn_idx, b.contiguous) == (3, 2, True)
