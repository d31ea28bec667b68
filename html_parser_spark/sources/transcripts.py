"""Transcript sources.

Two deterministic ways to get a transcripts table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json
``input_hint``):

* :func:`synth_transcripts` -- Spark-native generator: every column is
  a deterministic expression of the row id (xxhash64-seeded), so the
  corpus is reproducible at any scale, generated in parallel on the
  executors with no driver materialization, and skewed (a few hot
  conversations own half the turns) to exercise salting.
* :func:`wrap_documents` -- wraps the driver-provided ``documents``
  parquet in a fixed HTML template (pure SQL concat, so a SQL oracle
  can derive the expected extraction output exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: HTML template pieces for wrap_documents; kept as SQL so DuckDB can
#: reproduce the construction byte-for-byte (see __spark_entry__).
WRAP_SQL_EXPR = (
    "'<html><head><title>Doc &amp; ' || CAST(doc_id AS VARCHAR) || "
    "'</title><meta http-equiv=\"Expires\" content=\"E' || "
    "CAST(doc_id AS VARCHAR) || '\"><style>p {color: red}</style>"
    "</head><body><p>' || text || '</p><a href=\" /d/' || "
    "CAST(doc_id AS VARCHAR) || ' \">&lt;link&gt;</a>"
    "<script>if (x < y) { alert(\"&amp;\"); }</script><br>"
    "<img src=\"i' || CAST(doc_id AS VARCHAR) || '.png\" alt=\"pic ' || "
    "CAST(doc_id AS VARCHAR) || '\"></body></html>'"
)


def wrap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> transcripts-shaped DF with an HTML payload.

    conv_id = CAST(doc_id AS STRING), turn_idx = 0; the template embeds
    title, meta, style, link, script, br and img elements around the
    document text so every extractor has something to chew on.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # DuckDB spells it VARCHAR; Spark SQL wants STRING
    wrap_expr = WRAP_SQL_EXPR.replace("AS VARCHAR", "AS STRING")
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.expr(wrap_expr).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


# word pool for synthetic prose (deterministic, ASCII)
_WORDS = (
    "the quick brown fox jumps over lazy dog while spark executors "
    "shuffle partition columns vectorized arrow batches stream tokens"
).split()

_SNIPPETS = [
    # plain prose with inline markup + entities
    "'<p>' || {w} || ' &amp; ' || {w2} || ' <b>bold</b> &lt;x&gt;</p>'",
    # heading + link
    "'<h1>' || {w} || '</h1><a href=\"/u/' || CAST(pmod(h, 97) AS STRING)"
    " || '\">' || {w2} || '</a>'",
    # comment + entity soup
    "'<!-- c' || CAST(pmod(h, 13) AS STRING) || ' --><div>' || {w} || "
    "' &aring; &#229; &euro; ' || {w2} || '</div>'",
    # script/style boilerplate to strip
    "'<script>var x = 1 < 2; s = \"' || {w} || '\";</script><p>' || "
    "{w2} || '</p><style>.c { color: red }</style>'",
    # table-ish block + img textify
    "'<table><tr><td>' || {w} || '</td></tr></table>"
    "<img src=\"x.png\" alt=\"' || {w2} || '\">'",
]


def synth_transcripts(spark: SparkSession, n_turns: int,
                      n_convs: int = 1000, seed: int = 42,
                      partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic transcripts at any scale.

    Skew: ~half of all turns land in 3 hot conversations (Zipf-ish
    head), the rest spread uniformly over ``n_convs`` -- this is the
    skew profile the salted repartition in plans.pipeline exists for.
    Every value derives from xxhash64(id, seed): same seed -> same
    corpus, regardless of parallelism.
    """
    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.xxhash64("id", F.lit(seed))
    habs = F.abs(h)

    # skewed conv assignment
    conv_id = F.when(
        F.pmod(habs, F.lit(100)) < 50,
        F.concat(F.lit("hot-"), F.pmod(habs, F.lit(3)).cast("string")),
    ).otherwise(
        F.concat(F.lit("conv-"),
                 F.pmod(F.abs(F.xxhash64("id", F.lit(seed + 1))),
                        F.lit(n_convs)).cast("string"))
    )

    # prose: 8-40 words chosen deterministically
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (F.pmod(habs, F.lit(33)) + 8).cast("int")
    prose = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                word_arr,
                (F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)),
                        F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
        " ",
    )

    pick = F.pmod(F.abs(F.xxhash64("id", F.lit(seed + 2))),
                  F.lit(len(_SNIPPETS)))
    snippet_cases = None
    for idx, tpl in enumerate(_SNIPPETS):
        expr_sql = tpl.replace("{w}", "w").replace("{w2}", "w2")
        snippet_cases = (F.when(pick == idx, F.expr(expr_sql))
                         if snippet_cases is None
                         else snippet_cases.when(pick == idx,
                                                 F.expr(expr_sql)))

    base = df.select(
        "id",
        conv_id.alias("conv_id"),
        habs.alias("h"),
        prose.alias("w"),
        F.reverse(prose).alias("w2"),
    )
    text = F.concat(F.lit("<html><body>"), snippet_cases,
                    F.lit("</body></html>"))
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(F.col("h"), F.lit(3)) + 1).cast("int"),
    )
    return base.select(
        F.col("conv_id"),
        # pmod keeps turn_idx a non-negative int32 even past 2^31
        # synthetic rows (a bare CAST would wrap negative and break
        # the stable (conv_id, turn_idx) total order)
        F.pmod(F.col("id"), F.lit(2**31)).cast("int")
        .alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("search")).alias("tool"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("id")).alias("ts"),
    )
