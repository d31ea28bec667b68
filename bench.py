"""Benchmark entry point (driver contract).

Runs the headline queries on ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``local[$SPARK_GRAFT_CPUS]`` (default 32)
and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "turns": N, "turns_per_sec": ...}

The flagship tokenize+extract stage is the throughput metric from
BASELINE.md (turns/sec). ``SPARK_GRAFT_REPLICATE`` (default 20)
fans each source document out to that many turns (distinct payloads —
turn_idx is appended inside the text) so the run is long enough to
time; the factor is identical across cpu counts, so scaling-efficiency
comparisons (scripts/scaling_bench.py) are apples-to-apples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"html_parser_spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def bench_input(spark, sf_dir: str, replicate: int, cpus: int):
    """Transcripts table: each document becomes ``replicate`` turns
    with distinct payloads. Repartitioned so every core has work."""
    from pyspark.sql import functions as F

    from html_parser_spark.sources.transcripts import wrap_documents

    tr = wrap_documents(spark, sf_dir)
    out = (
        tr.select(
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            .alias("turn_idx"),
            "text",
        )
        .withColumn("text", F.concat("text", F.lit(" <i>t"),
                                     F.col("turn_idx"), F.lit("</i>")))
    )
    return out.repartition(cpus * 2).cache()


def main() -> None:
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from html_parser_spark.config import EXTRACT_CONFIG, ParserConfig
    from html_parser_spark.operators import dedup, similarity, textstats
    from html_parser_spark.operators.extract import events, extract_text

    tr = bench_input(spark, sf_dir, replicate, cpus)
    n_turns = tr.count()  # also materializes the cache
    # single-file parquet -> 1 scan partition; spread over the cores
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus).cache())
    docs.count()
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .repartition(cpus).cache())
    emb.count()

    # Warm the Python workers (process fork + pandas/pyarrow/package
    # imports) so timings measure steady-state throughput — at corpus
    # scale worker startup amortizes to zero.
    warm = tr.limit(2000)
    for _ in range(2):
        (warm.mapInPandas(lambda it: (pdf for pdf in it), warm.schema)
         .agg(F.count("*")).collect())

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        best = float("inf")
        for _ in range(2):  # best-of-2: shared-host noise is real
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    timed("extract_text", lambda: extract_text(tr, EXTRACT_CONFIG)
          .agg(F.count("*"), F.sum(F.length("extracted_text"))).collect())
    timed("events", lambda: events(tr, ParserConfig(),
                                   fields=("event",))
          .groupBy("event").count().collect())
    timed("events_full", lambda: events(tr, ParserConfig())
          .groupBy("event").agg(F.sum("length")).collect())
    timed("token_stats", lambda: textstats.token_stats(
        tr.withColumnRenamed("text", "t"), ["conv_id"], "t")
        .agg(F.sum("n_tokens")).collect())
    def run_minhash_lsh():
        sigs = dedup.minhash_signatures(docs).cache()
        try:
            dedup.lsh_candidate_pairs(sigs).count()
        finally:
            sigs.unpersist()

    timed("minhash_lsh", run_minhash_lsh)
    # bit_count: forces the full signature computation without the
    # long-overflow a plain sum of signed 64-bit signatures hits
    timed("simhash", lambda: dedup.simhash(docs)
          .agg(F.sum(F.bit_count("simhash"))).collect())
    timed("cosine_knn", lambda: similarity.cosine_neighbors(
        emb, emb.limit(8).select(F.col("vec_id").alias("query_id"),
                                 "embedding"),
        threshold=0.2).count())

    extract_sec = timings["extract_text"]
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "tokenize+extract turns/sec (flagship) + headline ops",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / extract_sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
