"""End-to-end TRAINING-DATA CURATION pipeline — the composed job a
100 TB corpus actually runs, wired from the engine's operators::

    spark-submit --py-files html_parser_spark.zip scripts/run_curation.py \
        --output /data/curated --report /data/curated_report.json

Stages (each one of the independently-oracle-verified operators):

1. **extract** — fused tokenize + main-content assembly per turn
   (`operators.extract.extract_text`), map-only.
   With ``--dedup-lines N``, a CCNet-tier duplicate-line scrub
   (`dedup.dedup_lines`) runs on the line-structured extracted text
   first, so boilerplate never reaches the quality stats.
2. **quality gate** — Gopher rule bundle on the extracted text
   (`textstats.gopher_quality`): word count / mean word length /
   symbol ratio / alpha-word ratio / stopword presence.
   With ``--c4``, the C4 page-filter bundle (`textstats.c4_quality`)
   additionally gates on the LINE-structured extracted text (line
   retention, sentence count, lorem/brace/badword page rules).
   Note the sandbox corpus is punctuation-free synthetic prose, so
   C4's terminal-punctuation line rule faithfully drops ALL of it
   (verified: the funnel runs an empty corpus through every later
   stage and the write without error).
3. **language gate** — char-trigram `lang_id`, keep a configured
   language allowlist.
   With ``--ppl-terciles T.parquet``, a CCNet perplexity gate then
   ranks survivors by hashed-n-gram LM score under the target table
   and keeps only the ``--ppl-keep`` buckets (default head,middle —
   the CCNet recipe).
4. **benchmark decontamination** — drop docs sharing any n-word
   shingle with an eval/benchmark table (`dedup.decontaminate`,
   broadcast probe; ``--eval-table`` points at a parquet of texts,
   omitted = stage skipped; ``--decontaminate-mode scrub`` excises
   just the leaked spans instead of dropping).
5. **near-dup removal** — MinHash signatures → LSH candidate pairs →
   star connected components → one canonical doc per cluster
   (`dedup.dedup_canonical` composition).
6. **corpus mixing** (``--mix 'en=0.6,fr=0.4'``) — deterministic
   hash-Bernoulli sampling so language strata follow the requested
   training-mix weights (`sampling.mix_corpus`); the keep set is a
   pure function of the data, identical at any cluster size.
   With ``--dsir-target T.parquet --dsir-keep K``, DSIR importance
   resampling (`sampling.dsir_select`) then keeps the K rows most
   like the target distribution, deterministically (Gumbel-top-k
   over hashed-n-gram log-ratio weights).
7. **render** (``--render-conversations``) — re-assemble surviving
   turns into one chat-template document per conversation
   (`sessions.render_conversations`, stable turn order), then
   **write** — surviving rows as parquet; ``--shards N`` instead
   exports N deterministic content-hash training shards
   (`plans.pipeline.write_training_shards`) — or (Iceberg append in
   deployment) + a JSON funnel report (rows in/out per stage — the
   per-stage accounting a curation run must publish).

Sandbox default input: sf0.001 documents wrapped as transcripts.
With ``--warc`` the corpus is first packed into WARC segments and
consumed back through the archive record walk + HTTP envelope split
— the Common Crawl ingestion path — before the same funnel runs
(verified: identical 90-doc keep set at --cpus 8 and --cpus 5).
``--url-blocklist d1,d2`` (WARC mode) applies the RefinedWeb URL
gate (`urls.url_filter`) on each response's target URI BEFORE
extraction — blocked domains/subdomains never enter the funnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", default=None)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--eval-table", default=None,
                    help="parquet of benchmark texts (column 'text'); "
                         "enables the decontamination stage")
    ap.add_argument("--eval-ngram", type=int, default=13)
    ap.add_argument("--dedup-lines", type=int, default=0,
                    metavar="MIN_COUNT",
                    help="CCNet-tier boilerplate removal: scrub lines "
                         "of the line-structured EXTRACTED text whose "
                         "normalized form repeats >= MIN_COUNT times "
                         "across the corpus (dedup.dedup_lines), "
                         "before the quality gate sees the text; "
                         "0 = stage skipped")
    ap.add_argument("--shards", type=int, default=0,
                    help="export N deterministic content-hash "
                         "training shards instead of plain parquet")
    ap.add_argument("--mix", default=None,
                    help="corpus mix weights over the predicted "
                         "language, e.g. 'en=0.6,fr=0.4' — "
                         "deterministic hash-Bernoulli sampling "
                         "(operators.sampling.mix_corpus); omitted = "
                         "stage skipped")
    ap.add_argument("--mix-seed", type=int, default=0)
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of target-distribution texts "
                         "(column 'text'); enables DSIR importance "
                         "resampling (sampling.dsir_select) after "
                         "dedup — keeps the --dsir-keep rows most "
                         "like the target, deterministically")
    ap.add_argument("--dsir-keep", type=int, default=1000)
    ap.add_argument("--decontaminate-mode", default="drop",
                    choices=("drop", "scrub"),
                    help="drop = remove the whole conversation on any "
                         "eval overlap (conservative default); scrub = "
                         "excise just the overlapping word spans and "
                         "keep the rest of each turn")
    ap.add_argument("--render-conversations", action="store_true",
                    dest="render",
                    help="re-assemble surviving turns into ONE "
                         "chat-template document per conversation "
                         "(role/tool tags, stable turn order) before "
                         "the write — the training-export shape")
    ap.add_argument("--c4", action="store_true",
                    help="additionally gate pages on the C4 rule "
                         "bundle (textstats.c4_quality) applied to "
                         "the line-structured extracted text")
    ap.add_argument("--url-blocklist", default=None,
                    help="comma list of blocked registered domains "
                         "(RefinedWeb URL gate, urls.url_filter) "
                         "applied to response target URIs — WARC "
                         "mode only, before extraction")
    ap.add_argument("--ppl-terciles", default=None,
                    help="parquet of target-LM texts (column "
                         "'text'); enables the CCNet perplexity "
                         "gate (sampling.ccnet_terciles) after the "
                         "language gate")
    ap.add_argument("--ppl-keep", default="head,middle",
                    help="comma list of perplexity buckets to keep "
                         "(head/middle/tail/unscored)")
    ap.add_argument("--warc", action="store_true",
                    help="crawl-first ingest: pack the corpus into "
                         "WARC segments and consume them back "
                         "through the archive record walk + HTTP "
                         "split (sources.warc) before extraction — "
                         "the Common Crawl ingestion path")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("transcript-curation-pipeline")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from html_parser_spark.config import EXTRACT_CONFIG
    from html_parser_spark.operators import dedup, textstats
    from html_parser_spark.operators.extract import extract_text
    from html_parser_spark.sources.transcripts import wrap_documents

    t0 = time.monotonic()
    funnel: dict[str, int] = {}

    tr = wrap_documents(spark, args.input)
    if args.warc:
        # crawl-first ingest: pack the corpus into WARC segments and
        # consume it back through the archive walk — the Common
        # Crawl path (synth stands in for reading .warc.gz blobs; in
        # deployment the binaryFile/blob column feeds warc_records
        # directly). Only 200 text/html responses proceed.
        from html_parser_spark.sources.warc import (
            synth_warc, warc_records)
        recs = warc_records(synth_warc(tr))
        funnel["warc_records"] = recs.count()
        resp = recs.filter((F.col("warc_type") == "response")
                           & (F.col("http_status") == 200)
                           & F.col("content_type")
                           .startswith("text/html"))
        if args.url_blocklist:
            # RefinedWeb URL gate on the record's target URI, BEFORE
            # extraction — a blocked crawl never costs a parse
            from html_parser_spark.operators.urls import url_filter
            doms = tuple(d.strip()
                         for d in args.url_blocklist.split(",")
                         if d.strip())
            resp = (url_filter(resp, url_col="uri",
                               blocked_domains=doms)
                    .filter("keep_url")
                    .drop("host", "blocked_domain", "blocked_pattern",
                          "soft_score", "keep_url"))
            funnel["after_url_gate"] = resp.count()
        tr = (resp
              .select(F.col("doc_id").cast("string")
                      .alias("conv_id"),
                      F.lit(0).alias("turn_idx"),
                      F.lit("assistant").alias("role"),
                      F.col("body").alias("text"),
                      F.lit(None).cast("string").alias("tool"),
                      F.to_timestamp(
                          F.lit("2026-01-01 00:00:00")).alias("ts")))
    funnel["input_turns"] = tr.count()

    # 1. extract (cache: three downstream consumers)
    ex0 = extract_text(tr, EXTRACT_CONFIG)

    # 1b. optional CCNet-tier duplicate-line scrub — runs on the
    # line-structured extracted_text (trimmed_text has newlines
    # collapsed already), BEFORE the quality gate so boilerplate
    # does not distort word/stopword stats; the survivors are then
    # whitespace-collapsed exactly like trimmed_text.
    if args.dedup_lines:
        # cache: dedup_lines scans this twice (line frequencies +
        # reassembly) and the doc_key re-join once more — without the
        # cache each pass re-runs the fused extract over the corpus
        keyed0 = (ex0.select("conv_id", "turn_idx", "extracted_text")
                  .withColumn("doc_key",
                              F.concat_ws("#", "conv_id", "turn_idx"))
                  .cache())
        dl = dedup.dedup_lines(keyed0, key_col="doc_key",
                               text_col="extracted_text",
                               min_count=args.dedup_lines).cache()
        ex = (dl.join(keyed0.select("doc_key", "conv_id", "turn_idx"),
                      "doc_key")
              .select("conv_id", "turn_idx",
                      F.trim(F.regexp_replace("clean_text", r"\s+",
                                              " ")).alias("text"))
              .cache())
        # rows survive line dedup by design — the informative funnel
        # number is how many turns had boilerplate lines scrubbed
        funnel["line_scrubbed_turns"] = (
            dl.filter("n_dup_lines > 0").count())
    else:
        ex = (ex0.select("conv_id", "turn_idx",
                         F.col("trimmed_text").alias("text"))
              .cache())

    # 2. quality gate on the EXTRACTED text
    q = textstats.gopher_quality(ex, ["conv_id", "turn_idx"],
                                 min_words=args.min_words)
    ok_q = q.filter("passes_gopher").select("conv_id", "turn_idx")
    step2 = ex.join(ok_q, ["conv_id", "turn_idx"], "left_semi").cache()
    funnel["after_quality"] = step2.count()

    # 2b. optional C4 page gate — judged on the LINE-structured
    # as-extracted text (trimmed/collapsed text has no newlines for
    # the line-retention rule to see)
    if args.c4:
        c4v = textstats.c4_quality(
            ex0.select("conv_id", "turn_idx",
                       F.col("extracted_text").alias("text")),
            ["conv_id", "turn_idx"])
        ok_c4 = c4v.filter("passes_c4").select("conv_id", "turn_idx")
        step2 = step2.join(ok_c4, ["conv_id", "turn_idx"],
                           "left_semi").cache()
        funnel["after_c4"] = step2.count()

    # 3. language gate
    allow = [x.strip() for x in args.langs.split(",") if x.strip()]
    lang = textstats.lang_id(step2, ["conv_id", "turn_idx"]).cache()
    ok_l = (lang.filter(F.col("lang_pred").isin(allow))
            .select("conv_id", "turn_idx"))
    step3 = step2.join(ok_l, ["conv_id", "turn_idx"], "left_semi").cache()
    funnel["after_lang"] = step3.count()

    # 3b. optional CCNet perplexity gate: rank survivors by
    # hashed-n-gram LM score under the target table, keep the
    # configured buckets (head,middle = the CCNet recipe)
    if args.ppl_terciles:
        from html_parser_spark.operators.sampling import ccnet_terciles
        tgt = spark.read.parquet(args.ppl_terciles)
        keep_buckets = [x.strip() for x in args.ppl_keep.split(",")
                        if x.strip()]
        keyed_p = step3.withColumn(
            "doc_key", F.concat_ws("#", "conv_id", "turn_idx"))
        terc = ccnet_terciles(keyed_p, tgt, key_col="doc_key")
        ok_p = (terc.filter(F.col("ppl_bucket").isin(keep_buckets))
                .select("doc_key"))
        step3 = (keyed_p.join(ok_p, "doc_key", "left_semi")
                 .drop("doc_key").cache())
        funnel["after_ppl"] = step3.count()

    # 4. benchmark decontamination (broadcast eval-shingle probe).
    # drop mode is keyed by conv_id: one leaked turn drops the whole
    # conversation — the conservative train/test-overlap policy.
    # scrub mode excises just the leaked word spans per turn.
    if args.eval_table:
        ev = spark.read.parquet(args.eval_table)
        if args.decontaminate_mode == "scrub":
            keyed3 = step3.withColumn(
                "doc_key", F.concat_ws("#", "conv_id", "turn_idx"))
            spans = dedup.contaminated_spans(
                keyed3, ev, key_col="doc_key", n=args.eval_ngram)
            scrubbed = (dedup.remove_dup_passages(
                            keyed3, spans=spans, key_col="doc_key",
                            k=args.eval_ngram)
                        .join(keyed3.select("doc_key", "conv_id",
                                            "turn_idx"), "doc_key")
                        .select("conv_id", "turn_idx",
                                F.col("scrubbed_text").alias("text"))
                        .cache())
            # the informative number in scrub mode is how many turns
            # LOST spans (row count is preserved by construction)
            funnel["scrubbed_turns"] = (
                spans.select("doc_key").distinct().count())
            # a turn that was ENTIRELY a benchmark item scrubs to
            # empty — an empty training row is worse than dropping it
            step3 = scrubbed.filter(
                F.length(F.trim("text")) > 0).cache()
        else:
            step3 = dedup.decontaminate(
                step3, ev, key_col="conv_id", n=args.eval_ngram).cache()
        funnel["after_decontaminate"] = step3.count()

    # 5. near-dup removal (doc key = conv_id#turn_idx)
    keyed = step3.withColumn(
        "doc_key", F.concat_ws("#", "conv_id", "turn_idx"))
    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(keyed, key_col="doc_key",
                                 num_hashes=8),
        key_col="doc_key",
        num_hashes=8, band_size=2, max_bucket=1_000_000)
    dropped = (dedup.dedup_canonical(pairs)
               .filter(~F.col("is_canonical"))
               .select(F.col("id").alias("doc_key")))
    survivors = keyed.join(dropped, "doc_key", "left_anti").drop("doc_key")
    funnel["after_dedup"] = survivors.count()

    # 6. corpus mixing (deterministic hash-Bernoulli sampling so
    # language strata follow the requested training-mix weights;
    # the keep set is a pure function of the data — identical at any
    # cluster size)
    if args.mix:
        from html_parser_spark.operators.sampling import mix_corpus
        weights = {k.strip(): float(v) for k, v in
                   (kv.split("=") for kv in args.mix.split(","))}
        survivors = (survivors
                     .join(lang.select("conv_id", "turn_idx",
                                       F.col("lang_pred").alias("lang")),
                           ["conv_id", "turn_idx"])
                     .cache())
        survivors = mix_corpus(survivors, "lang", weights,
                               key_col="text", seed=args.mix_seed) \
            .drop("lang")   # keep output schema identical to non-mix runs
        funnel["after_mix"] = survivors.count()

    # 6b. DSIR selection (importance resampling toward a target
    # distribution — an alternative/complement to stratum mixing):
    # Gumbel-top-k over hashed-n-gram log-ratio weights; the kept
    # set is a pure function of (data, target, seed)
    if args.dsir_target:
        from html_parser_spark.operators.sampling import dsir_select
        tgt = spark.read.parquet(args.dsir_target)
        keyed_s = survivors.withColumn(
            "doc_key", F.concat_ws("#", "conv_id", "turn_idx"))
        picked = dsir_select(keyed_s, tgt, k=args.dsir_keep,
                             key_col="doc_key", seed=args.mix_seed)
        survivors = (keyed_s.join(picked.select("doc_key"),
                                  "doc_key", "left_semi")
                     .drop("doc_key"))
        funnel["after_dsir"] = survivors.count()

    # 6c. optional conversation re-assembly: surviving turns join
    # back their role/tool from the source and render as one
    # chat-template document per conversation (stable turn order);
    # downstream consumers get whole conversations, not loose turns
    if args.render:
        from html_parser_spark.operators.sessions import (
            render_conversations)
        withroles = survivors.join(
            tr.select("conv_id", "turn_idx", "role", "tool"),
            ["conv_id", "turn_idx"], "left")
        survivors = render_conversations(withroles).cache()
        funnel["rendered_convs"] = survivors.count()

    # 7. write + report
    if args.shards:
        from html_parser_spark.plans.pipeline import (
            write_training_shards)
        # shard on conv_id in BOTH modes: no synthetic column leaks
        # into the exported schema, and all turns of a conversation
        # co-locate in one shard (what a training loader wants);
        # (conv_id, turn_idx) ordering keeps the within-shard layout
        # deterministic
        order_cols = (("conv_id",) if args.render
                      else ("conv_id", "turn_idx"))
        write_training_shards(survivors, args.output,
                              n_shards=args.shards,
                              key_col="conv_id",
                              order_cols=order_cols)
    else:
        survivors.write.mode("overwrite").parquet(args.output)
    report = {
        "funnel": funnel,
        "kept_ratio": round(
            funnel.get("after_dsir",
                       funnel.get("after_mix", funnel["after_dedup"]))
            / max(funnel["input_turns"], 1), 4),
        "wall_sec": round(time.monotonic() - t0, 2),
        "output": args.output,
        "langs": allow,
    }
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
