"""BPE learning/encoding tests: the Spark plans vs a plain-Python
reference implementation (the golden-oracle pattern used for the ML
pipeline — iterative fits aren't SQL-expressible, so the oracle is
exact replay in another language). t26's encode parity vs DuckDB is
covered by the oracle sweep."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.bpe import (
    bpe_readable,
    bpe_segment,
    bpe_token_count,
    learn_bpe_merges,
    merge_adjacent,
    merges_as_df,
)

# ---------------------------------------------------------------- reference


def _ref_merge_word(sym: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _ref_learn(texts: list[str], n_merges: int, min_freq: int):
    freqs = Counter()
    for t in texts:
        freqs.update(re.findall("[a-z0-9]+", t.lower()))
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < min_freq:
            break
        merges.append((a, b, f))
        vocab = {_ref_merge_word(s, a, b): fr for s, fr in vocab.items()}
    return merges


def _ref_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    sym = tuple(word)
    for a, b in merges:
        sym = _ref_merge_word(sym, a, b)
    return list(sym)


# ---------------------------------------------------------------- unit


def test_merge_adjacent_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],), (["a", "b", "a", "b"],)], ["sym"])
    got = [r.m for r in df.select(merge_adjacent(F.col("sym"), "a", "a").alias("m")).collect()]
    assert got == [["aa", "a"], ["a", "b", "a", "b"]]
    got2 = [r.m for r in df.select(merge_adjacent(F.col("sym"), "a", "b").alias("m")).collect()]
    assert got2 == [["a", "a", "a"], ["ab", "ab"]]


def test_merge_adjacent_merged_token_does_not_cascade(spark):
    # after ["a","a"] -> "aa", the new "aa" must not re-merge with a
    # following "a" under pair (a, a)
    df = spark.createDataFrame([(["a", "a", "a", "a", "a"],)], ["sym"])
    got = df.select(merge_adjacent(F.col("sym"), "a", "a").alias("m")).first().m
    assert got == ["aa", "aa", "a"]


def test_learn_matches_python_reference_micro(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wider wide new",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = learn_bpe_merges(docs, n_merges=8, min_freq=2)
    assert got == _ref_learn(texts, 8, 2)
    assert len(got) > 0


def test_learn_matches_python_reference_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = learn_bpe_merges(docs, n_merges=12, min_freq=2)
    assert got == _ref_learn(texts, 12, 2)
    assert len(got) == 12  # this corpus has plenty of repeated pairs


def test_learn_stops_below_min_freq(spark):
    docs = spark.createDataFrame([("ab zz",)], ["text"])
    # every pair occurs once -> below min_freq=2 -> no merges
    assert learn_bpe_merges(docs, n_merges=4, min_freq=2) == []


def test_merges_df_shape(spark):
    df = merges_as_df(spark, [("a", "b", 7), ("ab", "c", 3)])
    rows = [tuple(r) for r in df.collect()]
    assert rows == [(1, "a", "b", "ab", 7), (2, "ab", "c", "abc", 3)]


def test_segment_matches_reference_apply(spark):
    merges = [("s", "t"), ("a", "t"), ("o", "r"), ("or", "t"), ("b", "at")]
    texts = ["sort the batch", "st at or", "torts retort"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    seg = df.select(
        "text",
        bpe_segment("text", merges).alias("s"),
        bpe_token_count(bpe_segment("text", merges)).alias("n"),
    ).collect()
    for r in seg:
        words = re.findall("[a-z0-9]+", r.text.lower())
        ref_tokens = [t for w in words for t in _ref_apply(w, merges)]
        got_tokens = [
            t for t in r.s.replace("}", "").replace("{", " ").split() if t
        ]
        assert got_tokens == ref_tokens, r.text
        assert r.n == len(ref_tokens)


def test_readable_form_roundtrips_token_count(spark):
    merges = [("t", "h"), ("th", "e")]
    df = spark.createDataFrame([("the theme hearth",)], ["text"])
    row = df.select(
        bpe_readable(bpe_segment("text", merges)).alias("r"),
        bpe_token_count(bpe_segment("text", merges)).alias("n"),
    ).first()
    assert len(row.r.split()) == row.n


def test_no_cached_blocks_leak(spark):
    """learn_bpe_merges localCheckpoints per round — all blocks must be
    released by return (driver sessions run 100+ queries)."""
    docs = spark.createDataFrame([("low low lower",)], ["text"])
    learn_bpe_merges(docs, n_merges=4, min_freq=2)
    # Earlier tests in the session may have populated the deliberate
    # session-scoped index-frame cache; this test asserts BPE leaks.
    from mergers_acquisitions_predictions_spark.operators.util import (
        release_memoized_frames,
    )

    release_memoized_frames()
    sc = spark.sparkContext
    import time

    for _ in range(20):  # unpersist(blocking=False) is async
        if not sc._jsc.sc().getRDDStorageInfo():
            break
        time.sleep(0.25)
    assert not sc._jsc.sc().getRDDStorageInfo()
