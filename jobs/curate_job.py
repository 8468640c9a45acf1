"""spark-submit entrypoint for training-data curation + dataset release.

    spark-submit --py-files se_spark.zip jobs/curate_job.py \
        --input  <documents parquet (doc_id, text, lang[, url])> \
        --output <release dir> \
        [--lang en] [--q-min 0.35] [--rep-max 0.2] \
        [--train 0.9 --val 0.05 --test 0.05] \
        [--domain-cap N] [--length-weight CHARS] [--no-url]

Runs the full curation chain (operators/curation.py: language filter →
quality floor → repetition ceiling → canonical-URL dedup → exact text
dedup → optional per-domain quota → optional length-weighted
downsampling → split assignment), then writes the release:
split-partitioned parquet shards under <output>/data plus
<output>/_MANIFEST.json (per-split doc/char counts + order-independent
content checksum — manifest presence is the commit marker).

Prints ONE JSON line: the manifest plus input/kept counts. Local smoke:

    python jobs/curate_job.py --cores 8 \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/release --no-url
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--docid", default="doc_id")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--q-min", type=float, default=0.35)
    ap.add_argument("--rep-max", type=float, default=0.2)
    ap.add_argument("--train", type=float, default=0.9)
    ap.add_argument("--val", type=float, default=0.05)
    ap.add_argument("--test", type=float, default=0.05)
    ap.add_argument("--domain-cap", type=int, default=None)
    ap.add_argument("--length-weight", type=int, default=None,
                    help="keep prob = min(len(text), N)/N")
    ap.add_argument("--no-url", action="store_true",
                    help="corpus has no url column; skip URL stages")
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode only; under spark-submit leave unset")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    if args.cores:
        from search_engine_spark.session import get_spark

        spark = get_spark(app_name="curate", cores=args.cores,
                          shuffle_partitions=args.cores * 2)
    else:
        spark = SparkSession.builder.appName("curate").getOrCreate()

    from search_engine_spark.operators.curation import curate, write_release

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    weight = None
    if args.length_weight:
        n = args.length_weight
        weight = F.least(F.length("text"), F.lit(n)) / F.lit(float(n))
    keep = curate(
        docs,
        weights={"train": args.train, "val": args.val, "test": args.test},
        lang=args.lang,
        q_min=args.q_min,
        rep_max=args.rep_max,
        url=None if args.no_url else "url",
        domain_cap_n=args.domain_cap,
        weight_col=weight,
        docid=args.docid,
    )
    manifest = write_release(docs, keep, args.output, docid=args.docid)
    out = {
        "job": "curate",
        "input_docs": n_in,
        "kept_docs": sum(m["n_docs"] for m in manifest.values()),
        "splits": manifest,
        "wall_s": round(time.time() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
