"""Spark operators: fused tokenize+extract over the transcripts table.

The flagship pipeline (SURVEY.md §7 Phase 1): one `mapInPandas` stage
fuses tokenize -> filter -> assemble per turn, so extraction is
embarrassingly parallel and **shuffle-free** -- each turn is one
complete document, no cross-row state.  Catalyst prunes the scan to
the key + text columns (we pre-select them so the parquet/Iceberg
reader never materializes the rest).

At 100 TB the cost model is: scan (columnar, pruned) -> Arrow batches
to the Python worker -> per-document FSM -> Arrow back.  No shuffle,
no skew sensitivity (a hot conv_id just means more rows, all
independent); ``plans.pipeline`` adds salted repartitioning only when
a downstream stage needs conv-level grouping or balanced output files.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from html_parser_spark.config import EXTRACT_CONFIG, ParserConfig
from html_parser_spark.functions import assemble
from html_parser_spark.functions.tagset import DEFAULT_TEXTIFY
from html_parser_spark.functions.tokenizer import tokenize

#: key columns carried through every per-turn operator
KEY_COLS = ("conv_id", "turn_idx")

EXTRACT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("extracted_text", T.StringType()),
    T.StructField("trimmed_text", T.StringType()),
    T.StructField("n_events", T.IntegerType()),
    T.StructField("n_chars_in", T.IntegerType()),
])


def extract_text(df: DataFrame, cfg: ParserConfig = EXTRACT_CONFIG,
                 textify: dict[str, str] = DEFAULT_TEXTIFY,
                 text_col: str = "text") -> DataFrame:
    """transcripts -> (conv_id, turn_idx, extracted_text, trimmed_text,
    n_events, n_chars_in): TokeParser-style main-content assembly
    (SURVEY.md Q6/Q7) fused with the tokenizer in one Arrow stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = pdf[text_col].tolist()
            ex = []
            tr = []
            nev = []
            for doc in docs:
                doc = doc if isinstance(doc, str) else ""
                rows = tokenize(doc, cfg)
                txt = assemble.document_text(doc, rows, cfg, textify)
                ex.append(txt)
                tr.append(assemble.collapse_ws(txt))
                nev.append(len(rows))
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].astype(str),
                "turn_idx": pdf["turn_idx"],
                "extracted_text": ex,
                "trimmed_text": tr,
                "n_events": nev,
                "n_chars_in": [len(d) if isinstance(d, str) else 0
                               for d in docs],
            })

    cols = [F.col("conv_id").cast("string"),
            F.col("turn_idx").cast("int"),
            F.col(text_col)]
    return df.select(*cols).mapInPandas(run, EXTRACT_SCHEMA)


EVENTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("event", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("dtext", T.StringType()),
    T.StructField("tagname", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("token0", T.StringType()),
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    T.StructField("attrseq", T.ArrayType(T.StringType())),
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("tokenpos", T.ArrayType(T.IntegerType())),
    T.StructField("is_cdata", T.BooleanType()),
    T.StructField("offset", T.IntegerType()),
    T.StructField("offset_end", T.IntegerType()),
    T.StructField("length", T.IntegerType()),
    T.StructField("line", T.IntegerType()),
    T.StructField("column", T.IntegerType()),
    T.StructField("skipped_text", T.StringType()),
])


#: per-field builders — the engine's analogue of the reference's
#: compiled argspec projection (`hparser.c:675-795`): consumers name
#: the fields they want and only those are materialized per event.
def _mk_field_builders():
    from html_parser_spark.functions import project as prj

    return {
        "event": lambda doc, row, cfg: row[0],
        "text": lambda doc, row, cfg: prj.raw_text(doc, row),
        "dtext": lambda doc, row, cfg: prj.dtext(doc, row),
        "tagname": lambda doc, row, cfg: prj.tagname(doc, row, cfg),
        "tag": lambda doc, row, cfg: prj.tag(doc, row, cfg),
        "token0": lambda doc, row, cfg: prj.token0(doc, row),
        "attrs": lambda doc, row, cfg:
            (lambda a: a[0] if a else None)(prj.attrs(doc, row, cfg)),
        "attrseq": lambda doc, row, cfg:
            (lambda a: a[1] if a else None)(prj.attrs(doc, row, cfg)),
        "tokens": lambda doc, row, cfg:
            prj.token_strings(doc, row, cfg),
        "tokenpos": lambda doc, row, cfg: prj.tokenpos(doc, row),
        "is_cdata": lambda doc, row, cfg:
            row[4] if row[0] == "text" else None,
        "offset": lambda doc, row, cfg: row[5],
        "offset_end": lambda doc, row, cfg:
            row[5] + len(prj.raw_text(doc, row)),
        "length": lambda doc, row, cfg: len(prj.raw_text(doc, row)),
        "line": lambda doc, row, cfg: row[6],
        "column": lambda doc, row, cfg: row[7],
        "skipped_text": lambda doc, row, cfg: row[8],
    }


_FIELD_BUILDERS = _mk_field_builders()


def events(df: DataFrame, cfg: ParserConfig = ParserConfig(),
           text_col: str = "text",
           fields: tuple[str, ...] | None = None) -> DataFrame:
    """transcripts -> one row per tokenizer event (SURVEY.md §1.3).

    The per-turn event fan-out happens inside the Arrow batch (the UDF
    yields the exploded frame directly), so there is no separate
    explode/shuffle stage; ``seq`` is the in-turn ordinal, making
    ``(conv_id, turn_idx, seq)`` a stable total order.

    ``fields`` is the argspec (SURVEY.md P1): name only the event
    fields you need — unreferenced projections (attr maps, tokenpos
    arrays...) are never computed, mirroring the reference's compiled
    argspec and keeping the Arrow payload minimal. None = all fields.
    """
    key_fields = ["conv_id", "turn_idx", "seq"]
    sel = [f for f in (fields or
                       [x for x in EVENTS_SCHEMA.fieldNames()
                        if x not in key_fields])]
    schema = T.StructType(
        [EVENTS_SCHEMA[k] for k in key_fields]
        + [EVENTS_SCHEMA[f] for f in sel])
    builders = [(f, _FIELD_BUILDERS[f]) for f in sel]
    pos_fields = {"offset", "offset_end", "line", "column"} & set(sel)
    if cfg.track_positions and not pos_fields:
        # lazy position tracking (SURVEY.md O5): nothing selected
        # reads positions, so skip the per-event line/column upkeep
        cfg = cfg.with_(track_positions=False)
    elif not cfg.track_positions and pos_fields:
        # mirror the reference's lazy ENABLE (hparser.c:724-727): an
        # argspec asking for positions turns tracking on even if the
        # preset (e.g. EXTRACT_CONFIG) switched it off
        cfg = cfg.with_(track_positions=True)

    # attrs and attrseq share one computation when both are selected
    pair_attrs = "attrs" in sel and "attrseq" in sel
    if pair_attrs:
        builders = [(f, fn) for f, fn in builders
                    if f not in ("attrs", "attrseq")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from html_parser_spark.functions import project as prj

        for pdf in batches:
            out = {k: [] for k in schema.fieldNames()}
            for conv_id, turn_idx, doc in zip(
                pdf["conv_id"].astype(str), pdf["turn_idx"],
                pdf[text_col]
            ):
                doc = doc if isinstance(doc, str) else ""
                for seq, row in enumerate(tokenize(doc, cfg)):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["seq"].append(seq)
                    for name, fn in builders:
                        out[name].append(fn(doc, row, cfg))
                    if pair_attrs:
                        a = prj.attrs(doc, row, cfg)
                        out["attrs"].append(a[0] if a else None)
                        out["attrseq"].append(a[1] if a else None)
            if out["conv_id"]:
                yield pd.DataFrame(out)

    return df.select("conv_id", F.col("turn_idx").cast("int"),
                     text_col).mapInPandas(run, schema)


HEADERS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("header_seq", T.IntegerType()),
    T.StructField("header_name", T.StringType()),
    T.StructField("header_value", T.StringType()),
])

_HEAD_CFG = ParserConfig(ignore_elements=("script", "style"))


def head_headers(df: DataFrame, cfg: ParserConfig = _HEAD_CFG,
                 text_col: str = "text") -> DataFrame:
    """HeadParser-equivalent metadata capture (SURVEY.md Q1)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in HEADERS_SCHEMA.fieldNames()}
            for conv_id, turn_idx, doc in zip(
                pdf["conv_id"].astype(str), pdf["turn_idx"], pdf[text_col]
            ):
                doc = doc if isinstance(doc, str) else ""
                rows = tokenize(doc, cfg)
                for i, (name, value) in enumerate(
                    assemble.head_headers(doc, rows, cfg)
                ):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["header_seq"].append(i)
                    out["header_name"].append(name)
                    out["header_value"].append(value)
            if out["conv_id"]:
                yield pd.DataFrame(out)

    return df.select("conv_id", F.col("turn_idx").cast("int"),
                     text_col).mapInPandas(run, HEADERS_SCHEMA)


LINKS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("link_seq", T.IntegerType()),
    T.StructField("tagname", T.StringType()),
    T.StructField("attr_name", T.StringType()),
    T.StructField("url", T.StringType()),
])


def links(df: DataFrame, cfg: ParserConfig = ParserConfig(),
          base: str | None = None, text_col: str = "text") -> DataFrame:
    """LinkExtor-equivalent link extraction (SURVEY.md Q2)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in LINKS_SCHEMA.fieldNames()}
            for conv_id, turn_idx, doc in zip(
                pdf["conv_id"].astype(str), pdf["turn_idx"], pdf[text_col]
            ):
                doc = doc if isinstance(doc, str) else ""
                rows = tokenize(doc, cfg)
                for seq, tag, attr_name, url in assemble.extract_links(
                    doc, rows, cfg, base
                ):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["link_seq"].append(seq)
                    out["tagname"].append(tag)
                    out["attr_name"].append(attr_name)
                    out["url"].append(url)
            if out["conv_id"]:
                yield pd.DataFrame(out)

    return df.select("conv_id", F.col("turn_idx").cast("int"),
                     text_col).mapInPandas(run, LINKS_SCHEMA)


ANCHORS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("anchor_seq", T.IntegerType()),
    T.StructField("href", T.StringType()),
    T.StructField("anchor_text", T.StringType()),
])


def anchors(df: DataFrame, cfg: ParserConfig = ParserConfig(),
            text_col: str = "text") -> DataFrame:
    """eg/hanchors: (anchor_seq, href, trimmed anchor text) per <a>."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ANCHORS_SCHEMA.fieldNames()}
            for conv_id, turn_idx, doc in zip(
                pdf["conv_id"].astype(str), pdf["turn_idx"], pdf[text_col]
            ):
                doc = doc if isinstance(doc, str) else ""
                rows = tokenize(doc, cfg)
                for seq, href, txt in assemble.anchors(doc, rows, cfg):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["anchor_seq"].append(seq)
                    out["href"].append(href)
                    out["anchor_text"].append(txt)
            if out["conv_id"]:
                yield pd.DataFrame(out)

    return df.select("conv_id", F.col("turn_idx").cast("int"),
                     text_col).mapInPandas(run, ANCHORS_SCHEMA)


REWRITE_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("doc", T.StringType()),
])


def _per_turn_doc(df: DataFrame, fn, text_col: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = [d if isinstance(d, str) else ""
                    for d in pdf[text_col]]
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].astype(str),
                "turn_idx": pdf["turn_idx"],
                "doc": [fn(d) for d in docs],
            })

    return df.select("conv_id", F.col("turn_idx").cast("int"),
                     text_col).mapInPandas(run, REWRITE_SCHEMA)


def rewrite_links(df: DataFrame, rewrite,
                  cfg: ParserConfig = ParserConfig(),
                  text_col: str = "text") -> DataFrame:
    """eg/hrefsub: tokenpos-surgery URL rewriting; bytes outside the
    rewritten attr values are untouched."""
    return _per_turn_doc(
        df, lambda d: assemble.rewrite_links(d, tokenize(d, cfg), cfg,
                                             rewrite), text_col)


def strip_markup(df: DataFrame, cfg: ParserConfig = ParserConfig(),
                 strip_tags=assemble.STRIP_TAGS,
                 strip_elements=("style", "script"),
                 text_col: str = "text") -> DataFrame:
    """eg/hstrip: drop styling tags + style/script subtrees, keep the
    rest byte-identical (Filter.pm identity over filtered events)."""
    return _per_turn_doc(
        df, lambda d: assemble.strip_markup(d, None, cfg, strip_tags,
                                            strip_elements), text_col)


def bom_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-sniff warnings (SURVEY.md P12; `hparser.c:1839-1870`,
    `util.c:276-310`): per-turn flags for BOMs and
    probably-undecoded-UTF-8, as pure JVM expressions — at corpus
    scale these feed the metrics table, not per-row warnings."""
    t = F.col(text_col)
    # probable undecoded UTF-8: a Latin-1-decoded lead byte C2-F4
    # followed by a continuation byte 80-BF (util.c:289-302 heuristic)
    utf8ish = t.rlike("[\u00C2-\u00F4][\u0080-\u00BF]")
    bom_utf8 = t.startswith("\ufeff") | t.startswith("\u00ef\u00bb\u00bf")
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        bom_utf8.alias("utf8_bom"),
        (t.startswith("\u00ff\u00fe") | t.startswith("\u00fe\u00ff"))
        .alias("utf16_bom"),
        (utf8ish & ~bom_utf8).alias("maybe_undecoded_utf8"),
    )


def decode_entities_col(col, expand_prefix: bool = False):
    """Vectorized entity decode as a scalar pandas UDF (SURVEY.md P5).

    The '&' pre-mask (SURVEY.md O10) skips untouched rows without even
    entering the scanner.
    """
    from html_parser_spark.functions.entities import decode_entities

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        mask = s.str.contains("&", regex=False, na=False)
        if not mask.any():
            return s
        out = s.copy()
        out[mask] = s[mask].map(
            lambda x: decode_entities(x, expand_prefix)
        )
        return out

    return _decode(col)


def encode_entities_col(col, unsafe_chars: str | None = None):
    """Vectorized entity encode (SURVEY.md P7)."""
    from html_parser_spark.functions.entities import encode_entities

    @F.pandas_udf(T.StringType())
    def _encode(s: pd.Series) -> pd.Series:
        return s.map(lambda x: encode_entities(x, unsafe_chars)
                     if isinstance(x, str) else x)

    return _encode(col)
