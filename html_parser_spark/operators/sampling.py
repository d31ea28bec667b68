"""Deterministic stratified sampling and corpus mixing.

The last stage of a training-data curation pipeline is rarely "keep
everything that survived the filters": corpora are *mixed* — each
language / source / domain stratum is sampled at a weight chosen for
the training run (the public practice in GPT-3 / Gopher / LLaMA-class
data recipes, e.g. Brown et al. 2020 table 2.2, Touvron et al. 2023
table 1).  This module implements that stage Spark-first:

* ``uniform_hash_col`` — a deterministic uniform ``[0, 1)`` draw per
  row, derived from ``md5(key || '#' || seed)``.  Unlike
  ``DataFrame.sample`` (whose output depends on partition layout and
  task retries), a hash draw is a pure function of the data: the
  sample is byte-identical across cluster sizes, input order, retry
  storms, and engines — DuckDB rebuilds the exact same draw with
  ``('0x' || substr(md5(..), 1, 8))::BIGINT / 2^32``, which is how the
  driver oracle verifies it.
* ``stratified_sample`` — per-stratum Bernoulli keep with explicit
  fractions (a map-only JVM filter; strata without a fraction are
  dropped).
* ``mix_fractions`` / ``mix_corpus`` — turn target *weights* into
  per-stratum fractions given the observed stratum counts, maximising
  the output size subject to the weights and per-stratum availability
  (``total = min_s floor(n_s / share_s)``; ``frac_s = share_s * total
  / n_s``).

Scale notes (100 TB): the sampling filter itself is map-only,
whole-stage-codegen JVM (md5 / conv / substring builtins — no Python,
no shuffle, no RNG state), so it composes with the extraction scan at
zero extra cost.  ``mix_corpus`` adds one aggregate whose output is
one row per stratum (partial aggregation absorbs the per-partition
counts; a languages×sources stratification is thousands of rows at
most) and a driver collect of that tiny table — the same bookkeeping
class as batch ids in ``plans.pipeline.run_resumable``.  Nothing
corpus-sized is broadcast, collected, or re-shuffled.

Reference parity note: the reference (gisle/html-parser) stops at
parse/extract and has no corpus-level stage like this; the operator is
part of the engine's LLM-pipeline surface (SURVEY.md §2.7).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "uniform_hash_col",
    "stratified_sample",
    "mix_fractions",
    "mix_corpus",
]

#: 2^32 — the hash prefix below is 8 hex digits = 32 bits.
_HASH_SPACE = 4294967296.0


def uniform_hash_col(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform ``[0, 1)`` double from ``md5(key#seed)``.

    Uses the first 32 bits of the md5 digest; md5 is over the UTF-8
    bytes of ``key`` so the draw is engine-portable (DuckDB oracle
    parity) and independent of partitioning.  Changing ``seed`` gives
    an independent draw for the same key.
    """
    h = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f"#{seed:d}"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(_HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its hash draw < ``fractions[s]``.

    Strata absent from ``fractions`` are dropped (fraction 0).  The
    filter is a single map-only JVM stage; the fractions map is a tiny
    literal (one entry per stratum), never a join.
    """
    u = uniform_hash_col(F.col(key_col), seed)
    frac = F.lit(0.0)
    for stratum, fraction in fractions.items():
        frac = F.when(
            F.col(strata_col) == F.lit(stratum),
            F.lit(float(fraction))).otherwise(frac)
    return df.filter(u < frac)


def mix_fractions(
    counts: Mapping[str, int],
    weights: Mapping[str, float],
    total: Optional[int] = None,
    normalize: bool = True,
) -> dict[str, float]:
    """Per-stratum sampling fractions realising ``weights`` over
    ``counts``.

    With ``total=None`` the output size is maximised subject to the
    weights and availability: ``total = min_s floor(n_s / share_s)``
    over strata present in both maps, then ``frac_s = share_s * total
    / n_s`` (capped at 1.0).  With ``normalize=False`` the weights are
    used as shares verbatim — required when an external oracle embeds
    the same share literals (a ``w / sum(w)`` renormalisation is a
    float op the oracle would have to reproduce bit-for-bit).
    """
    if normalize:
        wsum = float(sum(weights.values()))
        shares = {k: w / wsum for k, w in weights.items() if w > 0}
    else:
        shares = {k: float(w) for k, w in weights.items() if w > 0}
    live = {k: s for k, s in shares.items() if counts.get(k, 0) > 0}
    if not live:
        return {}
    feasible = min(math.floor(counts[k] / s) for k, s in live.items())
    if total is not None:
        feasible = min(feasible, int(total))
    return {
        k: min(1.0, s * feasible / counts[k]) for k, s in live.items()
    }


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, float],
    key_col: str = "text",
    seed: int = 0,
    total: Optional[int] = None,
    normalize: bool = True,
) -> DataFrame:
    """Sample ``df`` so strata sizes follow ``weights``.

    One tiny aggregate (rows == #strata) is collected to size the
    fractions; the sample itself is the map-only hash filter above.
    """
    counts = {
        row[0]: row[1]
        for row in df.groupBy(strata_col).count().collect()
        if row[0] is not None
    }
    fractions = mix_fractions(counts, weights, total, normalize)
    return stratified_sample(df, strata_col, fractions, key_col, seed)
