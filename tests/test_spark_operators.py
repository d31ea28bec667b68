"""Spark operator tests: the fused extract pipeline, events/headers/
links DataFrames, batch-size & partition-count invariance."""

from __future__ import annotations

import pytest

from html_parser_spark.config import EXTRACT_CONFIG, ParserConfig
from html_parser_spark.operators import extract as ops
from html_parser_spark.sources.transcripts import (
    synth_transcripts,
    wrap_documents,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = [
        ("c1", 0, "user",
         "<html><head><title>T &amp; t</title></head>"
         "<body><p>hello <b>world</b></p>"
         "<script>drop(this)</script>"
         '<a href="/x">link text</a>'
         '<img src="i.png" alt="IMG ALT">'
         "</body></html>",
         None),
        ("c1", 1, "assistant", "plain text &aring; here", None),
        ("c2", 0, "user", "<textarea>raw <b>keep</b></textarea>", None),
        ("c2", 1, "tool", "", "search"),
    ]
    df = spark.createDataFrame(
        [(c, t, r, x, tool) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    return df


def test_extract_text(spark, transcripts):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in ops.extract_text(transcripts).collect()
    }
    # </a> is phrase markup (no space) so the textified img alt
    # follows directly, as in t/tokeparser.t:93 "Perl\xa0Institute"
    assert out[("c1", 0)]["trimmed_text"] == (
        "T & t hello world link textIMG ALT"
    )
    assert out[("c1", 1)]["trimmed_text"] == "plain text \xe5 here"
    # textarea content is literal but still text (not stripped)
    assert out[("c2", 0)]["trimmed_text"] == "raw <b>keep</b>"
    assert out[("c2", 1)]["trimmed_text"] == ""
    assert out[("c2", 1)]["n_events"] == 0


def test_events_df(spark, transcripts):
    ev = ops.events(transcripts, ParserConfig())
    rows = ev.filter("conv_id = 'c1' AND turn_idx = 0").orderBy("seq") \
        .collect()
    assert [r["event"] for r in rows[:4]] == [
        "start", "start", "start", "text"]
    title_text = [r for r in rows if r["event"] == "text"][0]
    assert title_text["text"] == "T &amp; t"
    assert title_text["dtext"] == "T & t"
    # offsets tile each turn
    from pyspark.sql import functions as F

    agg = ev.groupBy("conv_id", "turn_idx").agg(
        F.sum("length").alias("sum_len"),
        F.max(F.col("offset") + F.col("length")).alias("max_end"),
    ).collect()
    by = {(r["conv_id"], r["turn_idx"]): r for r in agg}
    assert by[("c1", 1)]["sum_len"] == len("plain text &aring; here")


def test_events_tag_offset_end_fields(spark, transcripts):
    """`tag` (event-code prefix, hparser.c:424-427) and `offset_end`
    (hparser.c:564-574) exposed through the events() argspec."""
    ev = ops.events(transcripts, ParserConfig(),
                    fields=("event", "tag", "offset", "offset_end",
                            "length"))
    rows = ev.filter("conv_id = 'c1' AND turn_idx = 0") \
        .orderBy("seq").collect()
    tags = [r["tag"] for r in rows if r["tag"] is not None]
    assert tags[:3] == ["html", "head", "title"]
    assert "/title" in tags  # end tags prefixed '/'
    for r in rows:
        assert r["offset_end"] == r["offset"] + r["length"]


def test_events_positions_auto_enabled(spark, transcripts):
    """A cfg with track_positions=False still yields real offsets when
    the argspec selects them (reference lazily ENABLES tracking)."""
    cfg = ParserConfig(track_positions=False)
    ev = ops.events(transcripts, cfg, fields=("event", "offset", "length"))
    rows = ev.filter("conv_id = 'c1' AND turn_idx = 0") \
        .orderBy("seq").collect()
    # events tile the document: each offset equals the running sum
    pos = 0
    for r in rows:
        assert r["offset"] == pos
        pos += r["length"]


def test_headers_df(spark, transcripts):
    rows = ops.head_headers(transcripts).collect()
    got = {(r["conv_id"], r["turn_idx"], r["header_name"]): r["header_value"]
           for r in rows}
    assert got[("c1", 0, "Title")] == "T & t"


def test_links_df(spark, transcripts):
    rows = ops.links(transcripts).collect()
    got = [(r["conv_id"], r["tagname"], r["attr_name"], r["url"])
           for r in rows]
    assert ("c1", "a", "href", "/x") in got
    assert ("c1", "img", "src", "i.png") in got


def test_decode_entities_col(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("&lt;x&gt; &aring;",), ("no entities",), ("&euro;!",)],
        "s string",
    )
    got = [r["d"] for r in
           df.select(ops.decode_entities_col(F.col("s")).alias("d"))
           .collect()]
    assert got == ["<x> \xe5", "no entities", "€!"]


def test_decode_entities_col_tier_equivalence(spark):
    """The three-tier decode (no-&, fast swap chain, full scanner)
    must be indistinguishable from running the reference-exact
    scanner on every row — including rows that straddle the gate
    (strict common entities mixed with exotic/unterminated/numeric
    forms, '&amp;'-escaping, null)."""
    from pyspark.sql import functions as F

    from html_parser_spark.functions.entities import decode_entities

    cases = [
        "plain",                       # tier 1
        "&lt;b&gt; &amp; &quot;q&quot; &apos;a&apos;&nbsp;end",  # 2
        "&amp;lt; stays one level",    # tier 2, escaping order
        "&lt;&unknown; mixed",         # tier 3 (exotic name)
        "&lt no semicolon",            # tier 3 (bare known entity)
        "&#60;&lt;",                   # tier 3 (numeric)
        "&ltx; &quote;",               # tier 3 (near-miss names)
        "&AMP; case",                  # tier 3 (case-sensitive gate)
        "& alone",                     # tier 3
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["d"] for r in
           df.select(ops.decode_entities_col(F.col("s")).alias("d"))
           .collect()]
    exp = [decode_entities(c, False) if c is not None else None
           for c in cases]
    assert got == exp


def test_encode_entities_col_tier_equivalence(spark):
    """The three-tier encode (no-unsafe, printable-ASCII swap chain,
    per-row reference encoder) must be indistinguishable from running
    the reference encoder on every row — including rows that straddle
    the gate (five-char swaps vs controls / non-ASCII / one-way
    apos), and a custom unsafe class must bypass the tiers."""
    from pyspark.sql import functions as F

    from html_parser_spark.functions.entities import encode_entities

    cases = [
        "plain safe text",              # tier 1 (untouched)
        "a < b & c > \"d\" 'e'",        # tier 2 (all five swaps)
        "&amp; pre-encoded",            # tier 2: & -> &amp;&amp;? no:
                                        # '&' swaps first, once
        "caf\xe9 < resum\xe9",          # tier 3 (non-ASCII named)
        "\x01 control < char",          # tier 3 (numeric control)
        "€ euro & sign",           # tier 3 (numeric non-latin1)
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["e"] for r in
           df.select(ops.encode_entities_col(F.col("s")).alias("e"))
           .collect()]
    exp = [encode_entities(c) if c is not None else None
           for c in cases]
    assert got == exp
    # custom class bypasses the tiers but still matches per-row
    got2 = [r["e"] for r in
            df.select(ops.encode_entities_col(
                F.col("s"), "a-c<").alias("e")).collect()]
    exp2 = [encode_entities(c, "a-c<") if c is not None else None
            for c in cases]
    assert got2 == exp2


def test_batch_and_partition_invariance(spark):
    """Reinterpretation of t/parser.t chunk-size invariance: identical
    results for 1 vs many partitions and small vs large Arrow batches."""
    tr = synth_transcripts(spark, 200, seed=7, partitions=8)
    a = sorted(
        (r["conv_id"], r["turn_idx"], r["trimmed_text"])
        for r in ops.extract_text(tr).collect()
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        b = sorted(
            (r["conv_id"], r["turn_idx"], r["trimmed_text"])
            for r in ops.extract_text(tr.repartition(1)).collect()
        )
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert a == b
    assert len(a) == 200


def test_wrap_documents_extract(spark):
    """The SQL-templated wrapping must extract to exactly the value the
    DuckDB oracle computes (same formula as __spark_entry__)."""
    import duckdb

    tr = wrap_documents(spark, SF_DIR)
    got = {
        int(r["conv_id"]): r["trimmed_text"]
        for r in ops.extract_text(tr, EXTRACT_CONFIG).collect()
    }
    expected = dict(duckdb.sql(
        "SELECT doc_id, 'Doc & ' || CAST(doc_id AS VARCHAR) || ' ' || text"
        " || ' <link> pic ' || CAST(doc_id AS VARCHAR) AS t"
        f" FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall())
    assert got == expected
