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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="json", choices=("parquet", "json", "csv"))
    p.add_argument("--output", required=True)
    p.add_argument("--quarantine", default=None)
    args = p.parse_args()

    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.readers import read_transcripts

    spark = get_spark("ingest_job")
    good, quarantine = read_transcripts(spark, args.input, args.format)
    good.write.mode("append").parquet(args.output)
    n_good = spark.read.parquet(args.output).count()
    n_bad = quarantine.count()
    if n_bad and args.quarantine:
        quarantine.write.mode("append").parquet(args.quarantine)
    print(
        json.dumps(
            {"format": args.format, "table_rows": n_good, "corrupt_lines": n_bad}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
