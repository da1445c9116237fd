#!/usr/bin/env python
"""Scaling decomposition probe (BENCH/BASELINE.md methodology #3): the same
corpus at two core counts through three nested pipelines —

  scan        parquet scan + count (JVM only)
  arrow       scan + PASS-THROUGH mapInArrow (Arrow roundtrip, no rule work)
  full        scan + the real extraction mapInArrow

Separates Spark plumbing loss from rule-compute loss from host loss. Each
level runs in a fresh JVM (same protocol as bench.py --scaling children),
warmup pass then best-of-3. Prints one JSON line; store the output under
BENCH/artifacts/.

Usage: python scripts/decompose_probe.py [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _passthrough(batches):
    yield from batches


def child(cores: int) -> dict:
    from bench import SCALING_CONVS, SF_DIR, _bench_transcripts, _force
    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(
        f"probe{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = _bench_transcripts(spark, SF_DIR, SCALING_CONVS)
    n = t.count()
    cols = t.select("conv_id", "turn_idx", "text")
    levels = {
        "scan": lambda: cols.count(),
        "arrow": lambda: _force(cols.mapInArrow(_passthrough, schema=cols.schema)),
        "full": lambda: _force(extract_turns(t)),
    }
    out = {"cores": cores, "turns": n}
    for name, run in levels.items():
        run()  # warmup
        secs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            secs.append(time.perf_counter() - t0)
        out[name] = {"sec": round(min(secs), 3), "all_secs": [round(s, 3) for s in secs]}
    spark.stop()
    return out


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else lo * 4
    results = []
    for cores in (lo, hi):
        r = subprocess.run(
            [sys.executable, __file__, "--child", str(cores)],
            capture_output=True,
            text=True,
            check=True,
            cwd=str(_REPO),
        )
        results.append(json.loads(r.stdout.strip().splitlines()[-1]))
    lo_r, hi_r = results
    effs = {
        k: round((lo_r[k]["sec"] / hi_r[k]["sec"]) / (hi / lo), 3)
        for k in ("scan", "arrow", "full")
    }
    print(
        json.dumps(
            {
                "metric": "scaling_decomposition",
                "lo_cores": lo,
                "hi_cores": hi,
                "runs": results,
                "efficiency": effs,
                "rule_compute_share_hi": round(
                    1 - hi_r["arrow"]["sec"] / hi_r["full"]["sec"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        print(json.dumps(child(int(sys.argv[2]))))
    else:
        main()
