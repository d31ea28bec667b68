"""Shared helpers: tokenize a doc and project events into dicts."""

from __future__ import annotations

from html_parser_spark.config import ParserConfig
from html_parser_spark.functions import project
from html_parser_spark.functions.tokenizer import tokenize


def events(doc: str, cfg: ParserConfig | None = None,
           emit_document_events: bool = False, **kw) -> list[dict]:
    cfg = cfg or ParserConfig(**kw)
    return [
        project.project(doc, r, cfg)
        for r in tokenize(doc, cfg, emit_document_events)
    ]


def ev_tuples(doc: str, fields: tuple[str, ...],
              cfg: ParserConfig | None = None,
              emit_document_events: bool = False, **kw) -> list[tuple]:
    return [
        tuple(e[f] for f in fields)
        for e in events(doc, cfg, emit_document_events, **kw)
    ]
