"""spark-submit entrypoint for the LLM training-data tokenizer pipeline.

    spark-submit --py-files se_spark.zip jobs/tokenize_job.py \
        --input  <documents parquet path (docid + text columns)> \
        --output <tokenizer warehouse dir> \
        [--docid doc_id] [--text text] \
        [--merges 4096] [--min-freq 2] [--budget 2048] [--partitions N]

Three stages, each written under --output so a failed re-submit resumes
from the artifacts (re-runs overwrite):

  1. merges.parquet   — BPE merge table learned from the corpus
                        (operators/bpe.py: one corpus-sized word-count
                        pass, then the driver-guarded merge loop).
  2. encoded.parquet  — per-doc subword stats (docid, n_words,
                        n_bpe_tokens, n_chars) via one Arrow-batched
                        mapInPandas pass.
  3. packed.parquet   — GPT-style concat-then-chunk layout: each doc's
                        (seq_id, seq_offset, straddles) for a --budget
                        token context window (operators/packing.py,
                        two-phase distributed prefix sum).

Prints ONE JSON line with corpus/vocab/layout stats. Local smoke run:

    python jobs/tokenize_job.py --cores 8 \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/tok
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
    ap.add_argument("--text", default="text")
    ap.add_argument("--merges", type=int, default=4096)
    ap.add_argument("--min-freq", type=int, default=2)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode only; under spark-submit leave unset")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    if args.cores:
        from search_engine_spark.session import get_spark

        spark = get_spark(app_name="tokenize", cores=args.cores,
                          shuffle_partitions=args.cores * 2)
    else:
        spark = SparkSession.builder.appName("tokenize").getOrCreate()

    from search_engine_spark.operators import bpe as BPE
    from search_engine_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(args.input)
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    merges = BPE.bpe_train(
        spark, docs, num_merges=args.merges, min_freq=args.min_freq,
        text=args.text,
    )
    merges.write.mode("overwrite").parquet(
        os.path.join(args.output, "merges.parquet")
    )
    merges = spark.read.parquet(os.path.join(args.output, "merges.parquet"))
    n_merges = merges.count()
    train_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    enc_path = os.path.join(args.output, "encoded.parquet")
    BPE.bpe_encode(
        docs, merges, docid=args.docid, text=args.text
    ).write.mode("overwrite").parquet(enc_path)
    enc = spark.read.parquet(enc_path)
    agg = enc.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_bpe_tokens").alias("toks"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    encode_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    packed_path = os.path.join(args.output, "packed.parquet")
    pack_sequences(
        enc.select("docid", F.col("n_bpe_tokens").alias("n_tokens")),
        budget=args.budget,
        partitions=args.partitions,
        scratch_dir=os.path.join(args.output, "_psum_scratch"),
    ).write.mode("overwrite").parquet(packed_path)
    packed = spark.read.parquet(packed_path)
    pagg = packed.agg(
        F.max("seq_id").alias("max_seq"),
        F.sum("straddles").alias("straddling"),
    ).collect()[0]
    pack_s = time.perf_counter() - t0

    dt = time.perf_counter() - t_all
    print(json.dumps({
        "n_docs": int(agg["docs"]),
        "n_words": int(agg["words"]),
        "n_bpe_tokens": int(agg["toks"]),
        "n_merges": int(n_merges),
        "budget": args.budget,
        "n_sequences": int(pagg["max_seq"]) + 1,
        "straddling_docs": int(pagg["straddling"]),
        "train_s": round(train_s, 2),
        "encode_s": round(encode_s, 2),
        "pack_s": round(pack_s, 2),
        "wall_s": round(dt, 2),
        "tokens_per_sec": round(int(agg["toks"]) / dt, 1),
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
