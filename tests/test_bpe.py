"""In-engine BPE tokenizer: training determinism vs an independent
reference loop, encode/budget semantics, parallelism invariance, and
the pack_sequences token_mode="bpe" arm."""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from html_parser_spark.operators import bpe

TEXTS = [
    "the low lower lowest low low",
    "newer new news the the the",
    "Low-Life 123 你好世界 newest",
    "the slow slower slowest snow",
    None,
    "",
]


def ref_train(texts, k, max_word_len=64):
    """Independent Sennrich-style reference: same eligibility, same
    (freq DESC, left ASC, right ASC) argmax, leftmost-first in-word
    merging — written over plain dicts, no delimiter strings."""
    wc = collections.Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if re.fullmatch(r"[a-z]+", w) and len(w) <= max_word_len:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    out = []
    for _ in range(k):
        pf = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pf[(syms[i], syms[i + 1])] += wc[w]
        if not pf:
            break
        (left, right), f = sorted(
            pf.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        out.append((left, right, f))
        for w, syms in vocab.items():
            i, ns = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    ns.append(left + right)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    return out


def ref_encode(word, merges):
    syms = list(word)
    for left, right, _ in merges:
        i, ns = 0, []
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                ns.append(left + right)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return syms


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_train_matches_independent_reference(spark, corpus):
    merges = bpe.train_bpe(corpus, num_merges=8)
    assert merges == ref_train(TEXTS, 8)


def test_train_parallelism_invariance(spark, corpus):
    one = bpe.train_bpe(corpus.coalesce(1), num_merges=6)
    many = bpe.train_bpe(corpus.repartition(8), num_merges=6)
    assert one == many


def test_encode_matches_reference_and_reconstructs(spark, corpus):
    merges = bpe.train_bpe(corpus, num_merges=8)
    rows = corpus.select(
        "text", bpe.bpe_tokens_col(F.col("text"), merges).alias("tk")
    ).collect()
    for r in rows:
        words = [w for w in (r.text or "").lower().split()
                 if re.fullmatch(r"[a-z]+", w) and len(w) <= 64]
        exp = [t for w in words for t in ref_encode(w, merges)]
        assert r.tk == exp
        # tokens of each word concatenate back to the word
        assert "".join(r.tk) == "".join(words)


def test_token_budget_char_fallback(spark):
    merges = [("t", "h", 1), ("th", "e", 1)]
    df = spark.createDataFrame(
        [("the the",), ("你好 123 a-b",), (None,), ("",)],
        "text string")
    got = [r.n for r in df.select(
        bpe.bpe_token_count_col(F.col("text"), merges).alias("n")
    ).collect()]
    # 'the the' -> 1 + 1; CJK run 2 chars + '123' 3 + 'a-b' 3; 0; 0
    assert got == [2, 8, 0, 0]


def test_train_exhaustion_raises(spark):
    tiny = spark.createDataFrame([("ab ab",)], "text string")
    with pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe(tiny, num_merges=5)


def test_pack_sequences_bpe_mode(spark, corpus):
    from html_parser_spark.plans.pipeline import pack_sequences

    merges = bpe.train_bpe(corpus, num_merges=4)
    keyed = corpus.withColumn(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))))
    packed = pack_sequences(keyed, target_tokens=6, buckets=2,
                            token_mode="bpe", merges=merges)
    got = {r.doc_id: r.n_tokens for r in packed.collect()}
    exp = {r.doc_id: r.n for r in keyed.select(
        "doc_id", bpe.bpe_token_count_col(F.col("text"), merges)
        .alias("n")).collect()}
    assert got == exp
    with pytest.raises(ValueError, match="merges"):
        pack_sequences(keyed, target_tokens=6, token_mode="bpe")
    with pytest.raises(ValueError, match="token_mode"):
        pack_sequences(keyed, target_tokens=6, token_mode="chars")


def test_bpe_plan_is_pure_jvm(spark, corpus):
    """The encode/budget path must stay Python-free: no
    BatchEvalPython / ArrowEval / MapInArrow nodes in the plan, and
    no shuffle (Exchange) — a narrow map at any corpus size."""
    merges = bpe.train_bpe(corpus, num_merges=4)
    plan = corpus.select(
        bpe.bpe_token_count_col(F.col("text"), merges).alias("n"),
        bpe.bpe_tokens_col(F.col("text"), merges).alias("tk"),
    )._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEval", "MapInArrow",
                "Exchange"):
        assert bad not in plan, plan
