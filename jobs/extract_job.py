#!/usr/bin/env python
"""Production entry point: incremental transcript extraction under
spark-submit (north-rule packaging requirement).

Usage:
    python scripts/make_pyfiles.py dist/pdf_extractor_spark.zip
    spark-submit --master local[32] \
        --py-files dist/pdf_extractor_spark.zip \
        jobs/extract_job.py \
        --input /path/to/transcripts --output /path/out \
        --lineage /path/lineage [--snapshot-id s1] [--run-id r1]

On a cluster the same invocation works with --master yarn/k8s; the package
zip ships every rule/operator module to the executors. The job is resumable:
re-running after a crash processes only files whose lineage commit is absent
(operators/lineage.py).

Prints one JSON summary line on success.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--snapshot-id", default="local")
    p.add_argument("--run-id", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--salt-partitions",
        default="auto",
        help="skew defense: 'auto' (salt only when the input is under-split "
        "— the whale-file pathology), an integer to force that many salted "
        "partitions, or 'off' (pre-r5 behavior). Values are unchanged "
        "either way; only task balance and file layout differ.",
    )
    args = p.parse_args()
    salt: int | None | str
    if args.salt_partitions == "auto":
        salt = "auto"
    elif args.salt_partitions in ("off", "none", "0"):
        salt = None
    else:
        try:
            salt = int(args.salt_partitions)
        except ValueError:
            salt = 0
        if salt <= 0:
            p.error("--salt-partitions must be a positive integer, 'auto', or 'off'")

    # imports AFTER spark-submit has placed the --py-files zip on sys.path
    from pdf_extractor_spark.operators.lineage import run_incremental, run_key
    from pdf_extractor_spark.session import get_spark

    spark = get_spark("extract_job", shuffle_partitions=args.shuffle_partitions)
    run_id = args.run_id or run_key(args.input, args.snapshot_id)
    summary = run_incremental(
        spark,
        input_dir=args.input,
        output_dir=args.output,
        lineage_dir=args.lineage,
        run_id=run_id,
        snapshot_id=args.snapshot_id,
        salt_partitions=salt,
    )
    print(json.dumps({"run_id": run_id, **summary}))
    spark.stop()


if __name__ == "__main__":
    main()
