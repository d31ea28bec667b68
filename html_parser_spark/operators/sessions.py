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
