#!/usr/bin/env python
"""Ingest job: land transcript dumps in any supported container (parquet /
json / csv) onto the CANONICAL parquet transcript table, with corrupt input
lines written to a quarantine sidecar instead of vanishing.

Usage:
    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/ingest_job.py \
        --input /dumps/day1 --format json --output /tables/transcripts \
        [--quarantine /tables/transcripts_corrupt]

Pipeline shape: ingest (this job: any container -> canonical schema-enforced
table) then extract (jobs/extract_job.py: incremental over the canonical
table). Keeping the containers at the edge means the resumable extraction
path stays a single-format, schema-stable scan.

Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="json", choices=("parquet", "json", "csv"))
    p.add_argument("--output", required=True)
    p.add_argument("--quarantine", default=None)
    args = p.parse_args()

    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.readers import read_transcripts

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = get_spark("ingest_job")
    good, quarantine = read_transcripts(spark, args.input, args.format)
    # this run's ingested rows ride the append itself via observe() (the
    # split_extracted pattern): no second end-to-end parse of the input.
    # table_rows below is the cumulative post-append table size — both are
    # reported so repeated runs stay unambiguous; the post-append count is a
    # parquet-metadata read, not a data scan.
    obs = Observation("ingest")
    good.observe(obs, F.count(F.lit(1)).alias("rows_ingested")).write.mode(
        "append"
    ).parquet(args.output)
    rows_ingested = obs.get["rows_ingested"]
    n_table = spark.read.parquet(args.output).count()
    n_bad = quarantine.count()
    dropped = False
    if n_bad and args.quarantine:
        quarantine.write.mode("append").parquet(args.quarantine)
    elif n_bad:
        # the module contract says corrupt lines never vanish silently: with
        # no --quarantine sink they ARE dropped, so say so loudly in both
        # streams rather than bury it in a count
        dropped = True
        print(
            f"WARNING: {n_bad} corrupt lines DROPPED (no --quarantine path "
            "given); re-run with --quarantine to keep them",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "format": args.format,
                "rows_ingested": rows_ingested,
                "table_rows": n_table,
                "corrupt_lines": n_bad,
                "corrupt_lines_dropped": dropped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
