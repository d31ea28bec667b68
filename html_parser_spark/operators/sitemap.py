"""Sitemap extraction (sitemaps.org XML protocol — public standard).

The crawl-side complement of :mod:`robots`: a curation pipeline
discovers its URL frontier from ``sitemap.xml`` files (both shapes —
``<urlset><url>`` leaf sitemaps and ``<sitemapindex><sitemap>``
index files). This operator is deliberately powered by the ENGINE'S
OWN event tokenizer (``operators.extract.events`` in ``xml_mode``),
so the crawl utility exercises the same parse core as the extraction
surface: XML declaration as a processing instruction, start/end
events for the protocol elements, entity-decoded text via ``dtext``
(sitemap ``<loc>`` values are XML-escaped, e.g. ``&amp;``).

Scale shape: one fused Arrow tokenize stage (map-only), then
per-DOCUMENT windows to attribute text nodes to their enclosing
element and number the entries — bounded by the protocol itself
(a sitemap file caps at 50,000 URLs / 50 MB uncompressed), never a
global sort. One partial-agg pivot groups each entry's fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from html_parser_spark.config import ParserConfig


def sitemap_urls(df: DataFrame, key_cols: list[str] | None = None,
                 text_col: str = "text") -> DataFrame:
    """sitemap XML column -> one row per ``<url>`` / ``<sitemap>``
    entry: ``(key..., entry, role, loc, lastmod)``.

    ``entry`` is the 1-based position of the entry in its file,
    ``role`` is ``'url'`` (leaf sitemap) or ``'sitemap'`` (index
    file), ``loc`` is entity-decoded, ``lastmod`` is NULL when the
    optional element is absent. Text is attributed to an element only
    while that element is OPEN (the last start/end marker before the
    text node is a start of ``loc``/``lastmod``), so inter-element
    whitespace never misattributes.
    """
    from html_parser_spark.operators.extract import events

    keys = list(key_cols) if key_cols else ["conv_id", "turn_idx"]
    src = df.select(
        F.col(keys[0]).cast("string").alias("conv_id"),
        (F.col(keys[1]) if len(keys) > 1 else F.lit(0))
        .cast("int").alias("turn_idx"),
        F.col(text_col).alias("text"))
    ev = events(src, ParserConfig(xml_mode=True),
                fields=("event", "tagname", "dtext"))
    w = (Window.partitionBy("conv_id", "turn_idx").orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, 0))
    marker = (F.when(F.col("event") == "start", F.col("tagname"))
              .when(F.col("event") == "end",
                    F.concat(F.lit("/"), F.col("tagname"))))
    entry_start = F.when(
        (F.col("event") == "start")
        & F.col("tagname").isin("url", "sitemap"), 1).otherwise(0)
    role_mark = F.when(
        (F.col("event") == "start")
        & F.col("tagname").isin("url", "sitemap"), F.col("tagname"))
    ann = ev.select(
        "conv_id", "turn_idx", "seq", "event", "dtext",
        F.last(marker, ignorenulls=True).over(w).alias("open_elem"),
        F.sum(entry_start).over(w).alias("entry"),
        F.last(role_mark, ignorenulls=True).over(w).alias("role"))
    vals = ann.filter(
        (F.col("event") == "text") & (F.col("entry") > 0)
        & F.col("open_elem").isin("loc", "lastmod"))
    return (vals.groupBy("conv_id", "turn_idx", "entry", "role")
            .agg(F.max(F.when(F.col("open_elem") == "loc",
                              F.trim("dtext"))).alias("loc"),
                 F.max(F.when(F.col("open_elem") == "lastmod",
                              F.trim("dtext"))).alias("lastmod"))
            .withColumn("entry", F.col("entry").cast("int")))
