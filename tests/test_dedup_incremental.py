"""Incremental MinHash-LSH dedup against a persisted signature
store: incremental == from-scratch, store growth, short-doc
handling, and the foreachBatch streaming twin."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from html_parser_spark.operators.dedup import (
    dedup_incremental, lsh_band_rows, lsh_candidate_pairs,
    minhash_signatures)


def _corpus(spark):
    base = "some shingle heavy words repeated for minhash %d end"
    rows = [(i, base % (i % 4)) for i in range(12)]
    rows += [(12, "tiny"), (13, "totally unique text nothing like "
                                "the others anywhere here")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _from_scratch_kept(docs):
    """The rule's from-scratch form: kept iff never the larger side
    of an LSH candidate pair."""
    sigs = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sigs, max_bucket=10**6)
    dropped = {r.id_b for r in cand.select("id_b").distinct()
               .collect()}
    return {r.doc_id: r.doc_id not in dropped
            for r in docs.select("doc_id").collect()}


def test_incremental_matches_from_scratch(spark, tmp_path):
    docs = _corpus(spark)
    store = str(tmp_path / "store")
    v0 = dedup_incremental(spark, docs.filter("doc_id < 6"), store)
    v1 = dedup_incremental(spark, docs.filter("doc_id >= 6"), store)
    got = {r.doc_id: r.kept
           for r in v0.unionByName(v1).collect()}
    assert got == _from_scratch_kept(docs)
    # something must actually have been deduped for this to mean much
    assert sum(not k for k in got.values()) >= 8


def test_store_accumulates_all_signatures(spark, tmp_path):
    docs = _corpus(spark)
    store = str(tmp_path / "store")
    dedup_incremental(spark, docs.filter("doc_id < 6"), store)
    assert spark.read.parquet(store).count() == 6
    dedup_incremental(spark, docs.filter("doc_id >= 6"), store)
    stored = spark.read.parquet(store)
    assert stored.count() == 14  # dropped docs' sigs stored too
    assert {r.doc_id for r in stored.select("doc_id").collect()} \
        == set(range(14))


def test_short_docs_never_band_and_are_kept(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "ab"), (1, "cd"), (2, ""), (3, None)],
        "doc_id long, text string")
    store = str(tmp_path / "store")
    v = dedup_incremental(spark, docs, store)
    assert all(r.kept for r in v.collect())
    # and their NULL sigs are excluded from band derivation
    sigs = spark.read.parquet(store)
    assert lsh_band_rows(sigs.filter(F.col("h0").isNotNull())) \
        .count() == 0


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch (same
    batch_id, same rows — the crash-between-write-and-checkpoint
    case) must leave the signature store and verdicts EXACTLY as a
    single delivery would — no double-appended sigs, no duplicate
    verdict rows, same keep set (regression: both writes were plain
    appends)."""
    from html_parser_spark.streaming.extract_stream import dedup_epoch

    docs = _corpus(spark)
    store = str(tmp_path / "store")
    verdicts = str(tmp_path / "verdicts")
    e0 = docs.filter("doc_id < 6")
    e1 = docs.filter("doc_id >= 6")
    dedup_epoch(e0, 0, store, verdicts)
    # epoch 1 delivered, then REPLAYED (e.g. restart before commit)
    dedup_epoch(e1, 1, store, verdicts)
    dedup_epoch(e1, 1, store, verdicts)
    stored = spark.read.parquet(store)
    assert stored.count() == 14          # not 22
    assert {r.doc_id for r in stored.select("doc_id").collect()} \
        == set(range(14))
    out = spark.read.parquet(verdicts)
    assert out.count() == 14             # one verdict per doc
    got = {r.doc_id: r.kept for r in out.collect()}
    assert got == _from_scratch_kept(docs)


def test_streaming_twin_matches_from_scratch(spark, tmp_path):
    """foreachBatch twin: two files delivered as two ordered
    micro-batches reproduce the from-scratch keep set, and the
    verdicts carry their epoch's batch_id."""
    from html_parser_spark.streaming.extract_stream import (
        dedup_incremental_sink)

    docs = _corpus(spark)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    docs.filter("doc_id < 6").coalesce(1).write.mode(
        "append").parquet(src)
    time.sleep(1.2)  # mod-time order = epoch order for the source
    docs.filter("doc_id >= 6").coalesce(1).write.mode(
        "append").parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_incremental_sink(stream, store, verdicts)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    out = spark.read.parquet(verdicts)
    got = {r.doc_id: r.kept for r in out.collect()}
    assert got == _from_scratch_kept(docs)
    by_batch = {r.batch_id for r in out.select("batch_id")
                .distinct().collect()}
    assert by_batch == {0, 1}
