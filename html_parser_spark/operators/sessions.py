"""Conversation sessionization: group turns into sessions separated
by idle gaps — the standard transcript-curation rollup (a reference
corpus has no notion of time; this is engine-side scope like dedup).

Two tiers:

* :func:`sessionize` — batch: one window pass per conv_id (lag ->
  session-start flags -> running sum) then a hash aggregate. Exactly
  one shuffle keyed by conv_id; the window state is a single row of
  lookback, so skewed mega-conversations stream through sorted
  partitions without memory blowup.
* ``streaming.extract_stream.sessionize_stream`` — the continuous
  twin: ``applyInPandasWithState`` keyed by conv_id with event-time
  timeouts, emitting a session row when the watermark passes the
  session's idle deadline.

Plus :func:`render_conversations` — the transcript-native assembly
step that turns the per-turn table back into one training document
per conversation under stable turn ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, gap_seconds: int = 300,
               conv_col: str = "conv_id",
               ts_col: str = "ts") -> DataFrame:
    """turns -> (conv_id, session_seq, session_start_s, session_end_s,
    n_turns): maximal runs of turns whose inter-turn gap is <=
    ``gap_seconds``; session_seq is 1-based per conversation and
    timestamps are epoch seconds (bigint).
    """
    base = df.select(F.col(conv_col),
                     F.col(ts_col).cast("long").alias("_s"))
    w = Window.partitionBy(conv_col).orderBy("_s")
    prev = F.lag("_s").over(w)
    new_session = (prev.isNull()
                   | ((F.col("_s") - prev) > F.lit(gap_seconds))
                   ).cast("int")
    run = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        base.withColumn("_new", new_session)
        .withColumn("_sess", run)
        .groupBy(conv_col, "_sess")
        .agg(F.min("_s").alias("session_start_s"),
             F.max("_s").alias("session_end_s"),
             F.count("*").alias("n_turns"))
        .select(F.col(conv_col),
                F.col("_sess").cast("int").alias("session_seq"),
                "session_start_s", "session_end_s", "n_turns")
    )


def render_conversations(df: DataFrame,
                         conv_col: str = "conv_id",
                         order_col: str = "turn_idx",
                         role_col: str = "role",
                         text_col: str = "text",
                         tool_col: str = "tool",
                         turn_sep: str = "\n") -> DataFrame:
    """transcripts -> one row per conversation: (conv_id, n_turns,
    doc), where ``doc`` is every turn rendered as
    ``<|role|>text`` (``<|role:tool|>text`` when a tool name is set)
    and joined in ``order_col`` order with ``turn_sep``.

    The inverse of the per-turn fan-out: after extraction/curation the
    training exporter needs whole conversations back as single
    documents with role structure preserved — the chat-template
    assembly step. Ordering is *stable by construction*: each turn is
    tagged with its own ``turn_idx`` and the array is sorted after
    collection, so the result is identical under any partitioning or
    shuffle order (the north rule's stable-turn-ordering invariant,
    enforced the same way ``_ordered_concat`` does for event
    reassembly).

    Scale: the render is a map-side projection (turns shuffle as
    final strings, nothing is recomputed after the exchange); the
    aggregation is ONE hash aggregate keyed by the conversation — the
    natural output key, so no second shuffle follows. Group state is
    bounded by conversation length, not corpus size; degenerate
    mega-conversations should be bounded upstream (``chunk_documents``
    in ``plans.pipeline``) before rendering. Pure JVM end to end —
    null text renders as an empty body, null role as ``<||>``.
    """
    rendered = F.concat(
        F.lit("<|"), F.coalesce(F.col(role_col), F.lit("")),
        F.coalesce(F.concat(F.lit(":"), F.col(tool_col)), F.lit("")),
        F.lit("|>"), F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(
        F.col(conv_col),
        F.struct(F.col(order_col).alias("i"),
                 rendered.alias("r")).alias("_t"))
    return (
        base.groupBy(conv_col)
        .agg(F.count("*").cast("long").alias("n_turns"),
             F.array_join(
                 F.transform(F.array_sort(F.collect_list("_t")),
                             lambda s: s.r),
                 turn_sep).alias("doc"))
    )
