"""robots.txt parsing and URL admission — RFC 9309 (public standard).

A crawl-scale curation pipeline must honor robots.txt before a URL
ever reaches fetch/extract. This module implements the RFC's group
and rule model relationally, so both stages are Catalyst-native and
fully re-derivable by a SQL oracle:

* :func:`parse_robots` — robots.txt TEXT column -> exploded rules
  table. Line handling per RFC 9309 §2.2: comments stripped at
  ``#``, fields case-insensitive, a RUN of consecutive
  ``User-agent`` lines opens a group that owns the following
  allow/disallow rules, rules before any group are ignored.
* :func:`robots_allowed` — (rules, urls) -> per-URL verdict under a
  product token. Group selection per §2.2.1: groups naming the
  product token exactly (case-insensitive) win; only when none
  exists do the ``*`` groups apply. Rule matching per §2.2.2: the
  pattern is a path prefix where ``*`` matches any octet sequence
  and a trailing ``$`` anchors the end; the verdict is the MATCHING
  rule with the longest pattern, ties broken in favor of ``allow``;
  no matching rule (or no applicable group) = allowed. Empty
  patterns ("Disallow:" = allow everything) never match.

Scale shape: parsing explodes a robots file into its lines and uses
per-FILE windows (``partitionBy`` the robots key) for group
numbering — bounded by the file's line count, never a global sort.
Matching is an equi-join on the robots key (host): at crawl scale
that is URLs-per-host joined against rules-per-host, the natural
crawl-frontier partitioning; the verdict is one ``max(struct)``
partial aggregation. Pattern->regex translation is a JVM
``regexp_replace`` chain — no Python in either stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pattern_regex(pattern: Column) -> Column:
    """RFC 9309 rule pattern -> anchored Java/RE2 regex (shared
    shape with the DuckDB oracle): escape regex metacharacters,
    ``*`` -> ``.*``, one TRAILING ``$`` -> end anchor (a ``$``
    anywhere else is a literal octet per the RFC)."""
    anchored = pattern.endswith("$")
    body = F.when(anchored,
                  pattern.substr(F.lit(1), F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.regexp_replace(body, r"([\\.\[\]{}()+?^$|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def parse_robots(df: DataFrame, key_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """robots.txt text -> exploded rule rows
    ``(key, group_id, agents, rule, pattern, pattern_len)``.

    ``agents`` is the array of lowercased product tokens naming the
    rule's group (a run of consecutive ``User-agent`` lines). Rules
    outside any group, unknown fields, and empty patterns are
    dropped. Windows are partitioned by the robots key — state never
    crosses one file.
    """
    lines = (df.select(F.col(key_col).alias("key"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "raw"))
             .select("key", "pos",
                     F.trim(F.regexp_replace("raw", "#.*", ""))
                     .alias("line"))
             .filter(F.col("line") != ""))
    parsed = lines.select(
        "key", "pos",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
        .alias("field"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1))
        .alias("value"),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("key").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    # a group starts at each UA line NOT preceded by another UA line
    grouped = parsed.select(
        "key", "pos", "field", "value",
        F.sum(F.when(
            (F.col("field") == "user-agent")
            & (F.coalesce(F.lag("field").over(w), F.lit("")) !=
               "user-agent"), 1).otherwise(0)).over(w)
        .alias("group_id"),
        is_ua.alias("_ua"))
    agents = (grouped.filter("_ua = 1")
              .groupBy("key", "group_id")
              .agg(F.array_sort(F.collect_list(F.lower("value")))
                   .alias("agents")))
    rules = (grouped.filter("_ua = 0")
             .filter(F.col("group_id") > 0)      # pre-group rules: ignored
             .filter(F.col("value") != "")       # empty pattern: no match
             .select("key", "group_id",
                     F.col("field").alias("rule"),
                     F.col("value").alias("pattern"),
                     F.length("value").alias("pattern_len")))
    return rules.join(agents, ["key", "group_id"])


def robots_allowed(rules: DataFrame, urls: DataFrame,
                   user_agent: str = "*",
                   key_col: str = "host",
                   path_col: str = "path") -> DataFrame:
    """Per-URL admission verdict under ``user_agent``.

    Input ``rules`` is :func:`parse_robots` output; ``urls`` carries
    ``(key_col, path_col)``. Returns one row per input URL:
    ``(key, path, allowed, matched_rule, matched_pattern)`` —
    matched_* are NULL when no rule matched (allowed by default).
    """
    ua = user_agent.lower()
    named = F.array_contains(F.col("agents"), F.lit(ua))
    starred = F.array_contains(F.col("agents"), F.lit("*"))
    # §2.2.1: exact-token groups win; '*' groups apply only when NO
    # exact group exists for this robots key
    has_named = (rules.filter(named).select("key").distinct()
                 .withColumnRenamed("key", "k2"))
    applicable = (rules.join(has_named,
                             rules["key"] == F.col("k2"), "left")
                  .filter(F.when(F.col("k2").isNotNull(), named)
                          .otherwise(starred))
                  .select("key", "rule", "pattern", "pattern_len"))
    u = urls.select(F.col(key_col).alias("key"),
                    F.col(path_col).alias("path"))
    cand = (u.join(applicable, "key", "left")
            .withColumn("_m",
                        F.col("pattern").isNotNull()
                        & F.regexp_like(F.col("path"), _pattern_regex(
                            F.col("pattern")))))
    # verdict = max(struct(len, is_allow, ...)) over matching rules:
    # longest pattern wins, ties go to allow (is_allow sorts higher)
    pick = (cand.groupBy("key", "path")
            .agg(F.max(F.when(F.col("_m"), F.struct(
                F.col("pattern_len").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("rule").alias("r"),
                F.col("pattern").alias("p")))).alias("best")))
    return pick.select(
        "key", "path",
        F.coalesce(F.col("best.a") == 1, F.lit(True)).alias("allowed"),
        F.col("best.r").alias("matched_rule"),
        F.col("best.p").alias("matched_pattern"))
