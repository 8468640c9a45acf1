"""spark-submit entrypoint for streaming incremental indexing.

    spark-submit --py-files se_spark.zip jobs/ingest_job.py \
        --pages <watched dir of page parquet deliveries> \
        --work  <merge-tree work dir> \
        [--lang en] [--no-stem] [--from-html] [--max-files 4]

Drains all pending deliveries exactly-once (Structured Streaming file
source + checkpoint under <work>/_ckpt), folds each micro-batch into the
log-structured merge tree (streaming/indexing.py), collapses to a serving
index, and prints one JSON line with the serving dir + stats. Re-submit
after new deliveries land — only the new files are processed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--from-html", action="store_true")
    ap.add_argument("--max-files", type=int, default=4,
                    help="max delivery files per micro-batch")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_spark.streaming.indexing import run_ingest

    spark = SparkSession.builder.appName("se-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    serving = run_ingest(
        spark, args.pages, args.work,
        lang=args.lang, stem=not args.no_stem, from_html=args.from_html,
        max_files_per_trigger=args.max_files,
    )
    if serving is None:
        print(json.dumps({"serving": None, "note": "no data ingested yet"}))
        return
    with open(os.path.join(serving, "stats.json")) as fh:
        stats = json.load(fh)
    print(json.dumps({"serving": serving,
                      "n_docs": stats["n_docs"],
                      "avgdl": stats["avgdl"]}))


if __name__ == "__main__":
    main()
