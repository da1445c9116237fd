#!/usr/bin/env python
"""Single-core extraction harness (the number BENCH/BASELINE.md quotes as
"single-core N turns/s"): pure-Python ``extract_turn_batch`` over the same
deterministic family-generator corpus the bench's text control uses — no
Spark, no Arrow, one thread. This is the per-core rule-compute ceiling that
the decomposition probe shows is >90% of extraction wall, so improving it is
improving the pipeline (r3 VERDICT "what's wrong" #1).

Protocol: warmup pass (regex compilation + caches), then best-of-3 timed
passes in Arrow-sized chunks (2048, matching the executor batch shape).
Prints one JSON line and self-archives it under BENCH/artifacts/.

Usage: python scripts/single_core.py [n_texts]
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main(n_texts: int = 100_000) -> None:
    from bench import _emit, _loadavg, _window_health
    from pdf_extractor_spark.rules.oracle import extract_turn_batch
    from pdf_extractor_spark.sources.synth import FAMILY_GENERATORS

    load_start = _loadavg()
    gens = [g for _, g in FAMILY_GENERATORS]
    texts = [gens[i % len(gens)](random.Random(i)) for i in range(n_texts)]
    chunks = [texts[i : i + 2048] for i in range(0, n_texts, 2048)]

    # warmup: compile every family's regexes, fill caches
    extract_turn_batch(texts[:4096])

    secs = []
    n_records = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_records = sum(
            r.n_records for chunk in chunks for r in extract_turn_batch(chunk)
        )
        secs.append(time.perf_counter() - t0)
    best = min(secs)
    _emit(
        {
            "metric": "single_core_extraction_turns_per_sec",
            "value": round(n_texts / best, 1),
            "unit": "turns_per_sec",
            "n_texts": n_texts,
            "n_records": n_records,
            "all_secs": [round(s, 3) for s in secs],
            "window": _window_health(load_start),
        }
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
