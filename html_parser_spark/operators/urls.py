"""URL canonicalization for crawl/link curation — pure JVM.

The standard pre-dedup URL normalizer a link corpus needs before
host statistics, frontier dedup, or graph building: lowercase
scheme/host, strip default ports and fragments, drop tracking
parameters, sort the surviving query string. One codegen stage
(``parse_url`` + array ops), shuffle-free — at crawl scale this is a
narrow map over the url column.

Scope notes (documented, not silent): path dot-segment resolution
(``/a/../b``) and percent-encoding normalization are not applied —
both change identity semantics in ways a curation pipeline must opt
into deliberately; userinfo (``user:pass@``) is DROPPED from the
canonical form (credentials never identify content and must not leak
into dedup keys or host stats); relative URLs (no authority) pass
through with only trim + fragment-strip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query-parameter PREFIXES that never affect content identity
#: (public tracking-param lists: utm_* campaign tags, click ids).
#: Matched with startswith, not LIKE — in LIKE the '_' of 'utm_%' is
#: a single-char wildcard and would also strip content params like
#: 'utmost='.
TRACKING_PARAM_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL as one JVM
    expression tree; relative inputs (NULL host) fall back to
    trim + fragment-strip."""
    # (?s): a '#' fragment may contain embedded newlines (HTML
    # attribute values span lines); '.' must not stop at them
    u = F.regexp_replace(F.trim(url), "(?s)#.*$", "")
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | \
        ((proto == "https") & (port == "443")) | (port == "")
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    raw_path = F.parse_url(u, F.lit("PATH"))
    path = F.when((raw_path == "") | raw_path.isNull(), F.lit("/")) \
        .otherwise(raw_path)
    q = F.parse_url(u, F.lit("QUERY"))

    def _keep(x: Column) -> Column:
        tracking = None
        for pre in TRACKING_PARAM_PREFIXES:
            c = x.startswith(pre)
            tracking = c if tracking is None else (tracking | c)
        return (x != "") & ~tracking

    kept = F.array_sort(F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"), _keep))
    q_part = F.when(F.size(kept) > 0,
                    F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    canon = F.concat(proto, F.lit("://"), host, port_part, path, q_part)
    return F.when(host.isNull() | (host == ""), u).otherwise(canon)


def canonicalize_urls(df: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """links table -> same rows + ``canonical_url`` column."""
    return df.withColumn("canonical_url",
                         canonical_url_expr(F.col(url_col)))
