"""End-to-end deployment driver (SURVEY.md §7 Phase 6).

The job a cluster runs via::

    spark-submit --py-files html_parser_spark.zip scripts/run_pipeline.py \
        --input /data/transcripts --output /data/extracted \
        --checkpoint /data/extracted_ckpt --batches 16 --salt 16

Reads a transcripts-shaped parquet directory (Iceberg scan in
deployment — the DataFrame code is identical), salts skewed conv_ids,
runs the fused tokenize+extract stage, and writes output + per-batch
lineage through the resumable checkpoint protocol: re-running after a
crash processes only batches missing from the checkpoint table and
yields byte-identical output. Prints one JSON status line.

Sandbox default input: the sf0.001 documents table wrapped as
transcripts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor Python workers resolve imports via PYTHONPATH, not the
# driver's sys.path (with --py-files the zip plays this role)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("transcript-extract-pipeline")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from html_parser_spark.config import EXTRACT_CONFIG
    from html_parser_spark.operators.extract import extract_text
    from html_parser_spark.plans import pipeline
    from html_parser_spark.sources.transcripts import wrap_documents

    t0 = time.monotonic()
    if os.path.exists(os.path.join(args.input, "documents.parquet")):
        tr = wrap_documents(spark, args.input)
    else:
        tr = spark.read.parquet(args.input)

    salted = pipeline.salted_repartition(tr, args.cpus * 2, args.salt)
    extracted = extract_text(salted, EXTRACT_CONFIG).withColumn(
        "batch_id",
        F.pmod(F.xxhash64("conv_id"), F.lit(args.batches)).cast("int"))
    # STAGE the extraction partitioned by batch_id before the
    # resumable loop — run_resumable's per-batch filter must be a
    # PARTITION filter (its documented contract); feeding it the live
    # extraction plan would re-execute the expensive fused extract
    # once per batch (O(batches x corpus)) and resume could never
    # re-read only the unfinished file groups
    staged_dir = os.path.join(args.output + "_staged")
    done = pipeline.completed_batches(spark, args.checkpoint)
    if len(done) >= args.batches:
        # every batch already committed: re-invocations are pure
        # reads — no restage (the staged tree was dropped when the
        # run completed), no batch execution
        n_run = 0
    else:
        # Restage when the staged tree is missing/unreadable, not
        # only on an empty checkpoint: a cleaned-up _staged dir (or
        # a reused checkpoint dir) must trigger a restage, never a
        # read failure. _SUCCESS is the parquet commit marker — a
        # half-written tree without it restages too.
        staged_ok = os.path.exists(
            os.path.join(staged_dir, "_SUCCESS"))
        if not staged_ok or done == set():
            extracted.write.mode("overwrite") \
                .partitionBy("batch_id").parquet(staged_dir)
        staged = spark.read.parquet(staged_dir)
        n_run = pipeline.run_resumable(spark, staged, args.output,
                                       args.checkpoint)
        # drop the staged copy ONLY once every batch has committed
        # (a completed run must not double storage forever); a
        # partial run keeps it so resume stays a partition-pruned
        # read instead of a fresh O(corpus) extract
        if len(pipeline.completed_batches(
                spark, args.checkpoint)) >= args.batches:
            import shutil
            shutil.rmtree(staged_dir, ignore_errors=True)

    lineage = spark.read.parquet(args.checkpoint)
    stats = lineage.agg(
        F.sum("n_rows").alias("rows"), F.sum("n_chars").alias("chars"),
        F.countDistinct("batch_id").alias("batches")).collect()[0]
    print(json.dumps({
        "batches_executed": n_run,
        "batches_total": int(stats.batches),
        "rows": int(stats.rows),
        "chars": int(stats.chars),
        "wall_sec": round(time.monotonic() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
