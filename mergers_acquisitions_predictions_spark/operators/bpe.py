"""Distributed BPE (byte-pair encoding) — vocabulary LEARNING and
corpus ENCODING as Spark plans.

The tokenizer is the one reference-free component every LLM training
pipeline needs; the reference repo stops at word tokenization
(`acq_etl_code.scala:38-44`), so this module supplies the subword
layer: Sennrich-style merge learning and greedy merge application.

Scale design (the part that matters at 100 TB):

* Learning never iterates over the corpus. ONE corpus pass builds the
  word-frequency table (explode + groupBy — the classic BPE reduction:
  merge statistics are a function of the weighted vocabulary, not the
  raw text), and all ``n_merges`` iterations run over that vocab-sized
  frame (~10⁶–10⁷ rows for a 100 TB corpus — still distributed, but
  five orders of magnitude smaller than the corpus).
* Each iteration is two vocab-sized jobs: an adjacent-pair count
  (slice/zip_with/explode + groupBy-sum) and a map-side greedy merge
  fold. The driver moves ONE row per round (the argmax pair) — model
  parameters, not data. Rounds are ``localCheckpoint``-ed so lineage
  stays flat instead of nesting one fold-tower per iteration (same
  discipline as dedup.dup_clusters).
* Encoding is pure column expressions: wrap each word's symbols as
  ``{s}`` guards, then one ``replace`` per merge — left-to-right
  non-overlapping replacement IS greedy BPE merge order, and the
  guards make cross-symbol or cross-word matches impossible. Built-in
  string ops, JVM-side, codegen'd; no Python in the corpus path. (The
  guard alphabet must be disjoint from the token alphabet — tokens
  here are ``[a-z0-9]+`` so ``{}`` is safe.)

Determinism: pair argmax ties break lexicographically on (left,
right), so the learned merge list is a pure function of the corpus —
reproducible across partitionings, cluster sizes, and reruns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from .util import release_local_checkpoint

#: Symbol guards for the string-encoded form: "{s}" per symbol.
#: Must never appear inside a token (tokenize() yields [a-z0-9]+).
_L, _R = "{", "}"


def wrap_symbols(word: Column | str) -> Column:
    """``"scan"`` → ``"{s}{c}{a}{n}"``: every character becomes a
    guarded symbol, the string form all merge rewrites operate on."""
    return F.regexp_replace(word, "(.)", _L + "$1" + _R)


def merge_adjacent(sym: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbols in
    a symbol ARRAY — one aggregate fold: append each symbol unless it
    is ``right`` and the last appended is ``left``, in which case the
    pair collapses into one symbol. Matches canonical BPE's
    non-overlapping scan (``a a a`` under (a,a) → ``aa a``)."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: (word, freq, sym) with ``sym`` the initial
    character-symbol array. Everything after this is vocab-sized."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", F.split("word", "").alias("sym"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a corpus; returns the
    ordered merge list as ``(left, right, pair_freq)`` tuples — model
    parameters (driver-side by design, like any fitted artifact).

    Stops early when no adjacent pair reaches ``min_freq``."""
    words = word_freq_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            multi = words.filter(F.size("sym") >= 2)
            cand = (
                multi.select(
                    "freq",
                    F.explode(
                        F.zip_with(
                            F.slice("sym", 1, F.size("sym") - 1),
                            F.slice("sym", 2, F.size("sym") - 1),
                            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("pair_freq"))
            )
            top = cand.orderBy(F.desc("pair_freq"), "a", "b").first()
            if top is None or top["pair_freq"] < min_freq:
                break
            merges.append((top["a"], top["b"], int(top["pair_freq"])))
            prev_jdf = words._jdf
            words = words.withColumn(
                "sym", merge_adjacent(F.col("sym"), top["a"], top["b"])
            ).localCheckpoint(eager=True)
            release_local_checkpoint(prev_jdf)
    finally:
        # the result is a plain list — no plan reads the loop frames
        release_local_checkpoint(words._jdf)
    return merges


def merges_as_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge list as a (rank, left, right, merged,
    pair_freq) DataFrame — the persistable tokenizer artifact."""
    rows = [
        (i + 1, a, b, a + b, f) for i, (a, b, f) in enumerate(merges)
    ]
    from .util import local_rows_df

    return local_rows_df(
        spark, rows, "rank int, left string, right string, merged string, pair_freq bigint"
    )


def bpe_segment(
    text_col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Apply a FIXED merge list (production tokenization: the vocab is
    a shipped artifact) to a text column; returns the guarded string
    form ``"{th}{e} {s}{c}{an}"`` — word boundaries are spaces, which
    no ``{l}{r}`` pattern can cross.

    One built-in ``replace`` per merge, applied in merge-rank order
    (BPE application order IS learning order)."""
    s = F.array_join(F.transform(tokenize(text_col), wrap_symbols), " ")
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(_L + left + _R + _L + right + _R),
            F.lit(_L + left + right + _R),
        )
    return s


def bpe_token_count(segmented: Column) -> Column:
    """Subword token count of a guarded segment string: one ``}`` per
    symbol."""
    return (
        F.length(segmented) - F.length(F.replace(segmented, F.lit(_R), F.lit("")))
    ).cast("long")


def bpe_readable(segmented: Column) -> Column:
    """``"{th}{e} {s}{c}{an}"`` → ``" th e  s c an"``: drop guards,
    space-separate symbols (translate: ``{``→space, ``}``→deleted)."""
    return F.translate(segmented, _L + _R, " ")
