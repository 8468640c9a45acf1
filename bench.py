"""Benchmark harness: headline queries + index-build throughput.

Prints ONE JSON line:
  {"metric": "e2e_bench_sec", "value": <total query sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "index_build": {"docs": N, "wall_s": s, "docs_per_sec": r}}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    cores for local[N] (default 32)
  BENCH_INDEX_DOCS    synthetic corpus size for the build-throughput leg
                      (default 60000 — a ~45 s leg; at 20k the measure is
                      stage-barrier/startup-dominated and noisy)

The build-throughput leg measures the engine's own pipeline (corpus
generation excluded from the timed region; steady-state, session startup
excluded) — the authoritative metric per BASELINE.json. Scaling runs
(local-cluster 1x2 vs 4x2 executors) are produced by tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "bm25_multi",
    "boosted_topk",
    "bm25_index_all",
    "bm25_batch",
    "topk_urls",
    "term_frequencies",
    "document_frequencies",
    "phrase",
    "phrase_index",
    "minhash_sigs",
    "simhash",
    "jaccard_pairs",
    "cosine_topk",
    "knn_join",
    "lang_id",
    "quality",
    "tpch_pricing",
    "join_agg",
    "window_top_order",
    "sessionize",
    "pagerank",
    "curation_pipeline",
    "frontier",
    "lm_score",
    "dedup_spans",  # r5: substring-level exact dedup
    "hits",  # r5: hubs/authorities link signal
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_index_docs = int(os.environ.get("BENCH_INDEX_DOCS", "60000"))

    from search_engine_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    qs = {**E.queries(), **E.extra_queries()}
    # Keep cross-round comparability: the r3 gate entry `bm25_multi` folds
    # the former bm25_rare in as a second tagged query (driver-slot
    # economics, not an engine change) — time the original single
    # multi-term top-k here.
    from search_engine_spark.operators import text_ops as _T

    qs["bm25_multi"] = lambda spark, sf: _T.bm25_topk(
        E._docs(spark, sf), "spark table join", k=20
    )
    # same economics for the r4 merged driver rows: time the ORIGINAL
    # single-variant queries (the merged rows do 2x the work by design)
    qs["jaccard_pairs"] = E.q_jaccard_pairs
    qs["frontier"] = E.q_frontier

    # Warm-up (excluded from timings): run every bench query once at the
    # tiny sf so JVM/codegen/shuffle machinery and the Python worker pool
    # are steady-state before measurement — per-query numbers then reflect
    # execution cost, not first-call compilation. A query whose warm-up
    # RAISES is reported (its timed number below then includes first-call
    # compilation — don't let that stay invisible).
    spark.range(1000).count()
    warm_failed: list[str] = []
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        for name in BENCH_QUERIES:
            try:
                qs[name](spark, warm_sf).count()
            except Exception as ex:
                warm_failed.append(name)
                print(f"WARN bench warm-up failed for {name}: "
                      f"{str(ex)[:200]}", file=sys.stderr)

    per_query: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    # ANN quality telemetry (untimed): recall@10 of each approximate
    # index family vs the exact cosine top-k on the same query vector —
    # a tuning regression (plane count, nprobe, pivot quality) shows up
    # here before it ever breaks a gate row.
    ann_recall: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F
        from search_engine_spark.operators import similarity as S

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        rows = sorted(
            emb.filter(F.col("vec_id") < 8).collect(),
            key=lambda r: r["vec_id"],
        )
        pivots = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in rows
        ]
        qv = pivots[0][1]
        # no exclude_self: the approximate paths keep the query vector,
        # so the exact reference set must too
        exact = {
            r["vec_id"] for r in S.cosine_topk(emb, qv, k=10).collect()
        }
        approx = {
            "lsh": S.lsh_topk_multiprobe(emb, qv, k=10),  # DEFAULT settings
            "ivf": S.ivf_topk(emb, pivots, qv, k=10, nprobe=3),
        }
        for method, df in approx.items():
            got = {r["vec_id"] for r in df.collect()}
            ann_recall[method] = round(len(got & exact) / len(exact), 3)
        # declared floor (similarity.py): a tuning regression that drops
        # the default-config lsh recall below it must fail LOUDLY here
        # and in tests/test_pipeline_ops.py, not ship silently
        ann_recall["lsh_floor"] = S.LSH_MULTIPROBE_RECALL_FLOOR
        if ann_recall["lsh"] < S.LSH_MULTIPROBE_RECALL_FLOOR:
            print(
                f"FAIL lsh recall {ann_recall['lsh']} below declared floor "
                f"{S.LSH_MULTIPROBE_RECALL_FLOOR}", file=sys.stderr,
            )
            raise SystemExit(3)
    except Exception as ex:  # telemetry must never sink the bench
        print(f"WARN ann recall telemetry failed: {str(ex)[:200]}",
              file=sys.stderr)

    # Spell-serve telemetry (untimed region of the headline total): brute
    # length-window vocab scan vs SymSpell deletes-join. The sf corpus's
    # synthetic vocabulary is tiny (~31 terms), so this leg uses a
    # deterministic 1M-term vocabulary (BENCH_SPELL_VOCAB) where the
    # length window genuinely covers most of the vocab — the web-scale
    # shape the deletes index exists for. Vocab AND index are
    # pre-materialized to parquet (the precompute-once contract — serving
    # cost is what scales per query); both paths serve the same query and
    # must agree on rows.
    spell_serve: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811
        from search_engine_spark.operators import textstats as TS

        n_vocab = int(os.environ.get("BENCH_SPELL_VOCAB", "1000000"))
        sp_tmp = tempfile.mkdtemp(prefix="se_bench_spell_")
        vocab_path = os.path.join(sp_tmp, "vocab")
        idx_path = os.path.join(sp_tmp, "deletes")
        (
            spark.range(n_vocab)
            .select(
                F.substring(
                    F.md5(F.col("id").cast("string")),
                    1,
                    (3 + F.pmod(F.col("id"), F.lit(8))).cast("int"),
                ).alias("term"),
                F.pmod(F.col("id"), F.lit(997)).alias("df"),
            )
            .groupBy("term").agg(F.max("df").alias("df"))
            .write.parquet(vocab_path)
        )
        vocab = spark.read.parquet(vocab_path)
        spell_serve["vocab_terms"] = vocab.count()
        n_buckets = 512
        t0 = time.perf_counter()
        (
            TS.spell_deletes_index(vocab, max_dist=2, buckets=n_buckets)
            .repartition(n_buckets, "bucket")  # ONE file per bucket dir
            .write.partitionBy("bucket").parquet(idx_path)
        )
        spell_serve["index_build_s"] = round(time.perf_counter() - t0, 3)
        deletes = spark.read.parquet(idx_path)
        # batch serving shape (the realistic one — query VOLUME is what
        # scales): 64 misspellings of real vocab terms in one call. The
        # brute path's length-window join grows as qterms x vocab
        # levenshteins; the deletes-join candidate set stays O(variants).
        terms = [r["term"] for r in vocab.orderBy("term").limit(64).collect()]
        sq = " ".join(
            (t[:-1] + "zq") if len(t) > 3 else t + "z" for t in terms
        )
        for _warm in range(1):  # steady-state: time the second serve
            TS.spell_suggest(vocab, sq, k=5, max_dist=2).count()
            TS.spell_suggest_symspell(
                deletes, sq, k=5, max_dist=2, buckets=n_buckets
            ).count()
        t0 = time.perf_counter()
        n_brute = TS.spell_suggest(vocab, sq, k=5, max_dist=2).count()
        spell_serve["brute_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_sym = TS.spell_suggest_symspell(
            deletes, sq, k=5, max_dist=2, buckets=n_buckets
        ).count()
        spell_serve["symspell_s"] = round(time.perf_counter() - t0, 3)
        if n_brute != n_sym:
            print(f"FAIL spell paths disagree: brute {n_brute} rows vs "
                  f"symspell {n_sym}", file=sys.stderr)
            raise SystemExit(3)
        shutil.rmtree(sp_tmp, ignore_errors=True)
    except SystemExit:
        raise
    except Exception as ex:  # telemetry must never sink the bench
        print(f"WARN spell serve telemetry failed: {str(ex)[:200]}",
              file=sys.stderr)

    # Tokenizer-pipeline telemetry (untimed region of the headline
    # total, r5): the LLM training-data tail — BPE vocabulary training
    # (guarded driver loop over the pruned word dict), corpus re-encode
    # (one Arrow mapInPandas pass), and sequence packing (two-phase
    # distributed prefix sum). Measured so a regression in any of the
    # three stages is visible per round without disturbing the
    # cross-round 24-query e2e set.
    tokenizer: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811
        from search_engine_spark.operators import bpe as BPE
        from search_engine_spark.operators.packing import pack_sequences

        docs = E._docs(spark, sf_dir)
        t0 = time.perf_counter()
        merges = BPE.bpe_train(spark, docs, num_merges=64)
        tokenizer["train_merges"] = merges.count()
        tokenizer["train_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        enc = BPE.bpe_encode(docs, merges).localCheckpoint()
        agg = enc.agg(
            F.sum("n_bpe_tokens").alias("toks"),
            F.count(F.lit(1)).alias("docs"),
        ).collect()[0]
        tokenizer["encode_s"] = round(time.perf_counter() - t0, 3)
        tokenizer["bpe_tokens_total"] = int(agg["toks"])
        t0 = time.perf_counter()
        packed = pack_sequences(
            enc.select("docid", F.col("n_bpe_tokens").alias("n_tokens")),
            budget=2048,
        )
        n_seq = packed.agg(F.max("seq_id")).collect()[0][0]
        tokenizer["pack_s"] = round(time.perf_counter() - t0, 3)
        tokenizer["n_sequences"] = int(n_seq) + 1
    except Exception as ex:  # telemetry must never sink the bench
        print(f"WARN tokenizer telemetry failed: {str(ex)[:200]}",
              file=sys.stderr)

    # Serving-tier telemetry (untimed region of the headline total, r5):
    # per-op wall seconds for the result-page re-rankers — each consumes
    # a top-50 BM25 pool, so their cost should stay flat as sf grows
    # (pool-sized, not corpus-sized). A serving op drifting toward the
    # corpus-sized queries above is a plan regression.
    serving: dict[str, float] = {}
    try:
        SERVING_QUERIES = [
            "snippets", "recency_topk", "host_collapse", "facets",
            "page_after", "proximity_topk", "cooccur_pmi",
            "weighted_sample",
        ]
        for name in SERVING_QUERIES:
            qs[name](spark, warm_sf).count()  # steady-state
        for name in SERVING_QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            serving[name] = round(time.perf_counter() - t0, 3)
    except Exception as ex:  # telemetry must never sink the bench
        print(f"WARN serving telemetry failed: {str(ex)[:200]}",
              file=sys.stderr)

    # index-build throughput over the deterministic synthetic web corpus
    from search_engine_spark.corpus import gen_pages_df
    from search_engine_spark.operators.indexer import build_index

    tmp = tempfile.mkdtemp(prefix="se_bench_idx_")
    pages_path = os.path.join(tmp, "pages")
    gen_pages_df(spark, n_index_docs, partitions=cpus * 2).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    t0 = time.perf_counter()
    stats = build_index(
        pages, os.path.join(tmp, "idx"), lang="en", partitions=cpus * 2
    )
    build_s = time.perf_counter() - t0
    shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "e2e_bench_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        "index_build": {
            "docs": stats["n_docs"],
            "wall_s": round(build_s, 3),
            "docs_per_sec": round(stats["n_docs"] / build_s, 1),
        },
    }
    if ann_recall:
        out["ann_recall@10"] = ann_recall
    if spell_serve:
        out["spell_serve"] = spell_serve
    if serving:
        out["serving"] = serving
    if tokenizer:
        out["tokenizer_pipeline"] = tokenizer
    if warm_failed:
        out["warm_up_failed"] = warm_failed
    print(json.dumps(out))


if __name__ == "__main__":
    main()
