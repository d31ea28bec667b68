"""Parser configuration.

One frozen dataclass mirrors the reference's ``struct p_state`` option
flags (`/root/reference/hparser.h:99-121`, setters `Parser.xs:439-558`).
An instance is broadcast into the vectorized UDFs; it is plain data so
it pickles cheaply to every executor.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class ParserConfig:
    # boolean options (Parser.xs:439-489); xml_mode implies
    # case_sensitive + empty_element_tags + strict_names + xml_pic and
    # disables literal-mode elements (hparser.c:88-93, 1397)
    strict_comment: bool = False
    strict_names: bool = False
    xml_mode: bool = False
    unbroken_text: bool = False
    marked_sections: bool = False
    attr_encoded: bool = False
    case_sensitive: bool = False
    strict_end: bool = False
    closing_plaintext: bool = False
    empty_element_tags: bool = False
    xml_pic: bool = False
    backquote: bool = False
    # boolean_attribute_value (Parser.xs:491-502); None = use attr name
    bool_attr_val: str | None = None

    # tag-set filters (Parser.xs:504-558); empty tuple = not set
    ignore_tags: tuple[str, ...] = ()
    report_tags: tuple[str, ...] = ()
    ignore_elements: tuple[str, ...] = ()

    # which event types the consumer reports; events not listed are
    # dropped like a missing handler with no default (hparser.c:277-283).
    # None = report everything.
    reported_events: tuple[str, ...] | None = None
    # events "handled" by a FALSE handler: dropped WITHOUT entering the
    # skipped_text accumulator and WITHOUT flushing pending text
    # (hparser.c:285-288, docs Parser.pm:560-567)
    false_handler_events: tuple[str, ...] = ()
    # accumulate raw text of unreported events onto the next reported
    # event (hparser.c:559-563, 650-669)
    track_skipped_text: bool = False
    # offset/line/column upkeep; the reference enables it lazily when
    # an argspec asks for positions (hparser.c:724-727, SURVEY.md O5).
    # Extraction presets turn it off -- nothing downstream reads it.
    track_positions: bool = True

    @property
    def is_case_sensitive(self) -> bool:
        return self.xml_mode or self.case_sensitive

    @property
    def is_strict_names(self) -> bool:
        return self.xml_mode or self.strict_names

    @property
    def allow_empty_tag(self) -> bool:
        return self.xml_mode or self.empty_element_tags

    def with_(self, **kw) -> "ParserConfig":
        return replace(self, **kw)


#: TokeParser presets: unbroken_text on by default (TokeParser.pm:22)
TOKEPARSER_CONFIG = ParserConfig(unbroken_text=True)

#: main-content extraction preset (eg/htext pattern: drop script/style
#: subtrees entirely)
EXTRACT_CONFIG = ParserConfig(
    unbroken_text=True, ignore_elements=("script", "style"),
    track_positions=False,
)
