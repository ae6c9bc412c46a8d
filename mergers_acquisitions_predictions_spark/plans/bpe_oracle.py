"""DuckDB replay of BPE merge LEARNING (t25's oracle).

`operators/bpe.learn_bpe_merges` is an iterative fit: each round
counts adjacent symbol pairs over the weighted vocabulary, picks the
argmax, and rewrites every word's symbols. That loop is nonetheless
fully replayable in SQL because `n_merges` is a fixed config: this
builder UNROLLS one CTE stage per round — the recursive-CTE trick
(s12's greedy MMR) specialized to a known iteration count.

Cross-engine exactness comes from mirroring the Spark operator's
decisions one-for-one:

- pair counting is over ALL adjacent index positions (overlapping —
  "aaa" yields (a,a) twice per occurrence), exactly the
  slice/zip_with/explode shape;
- argmax ties break on (pair_freq DESC, left, right) — pure string /
  integer comparisons, no float surface anywhere in the algorithm;
- the merge rewrite uses the SAME guarded-string trick as the engine's
  encode path (every symbol wrapped as ``{s}``): both engines'
  ``replace`` is left-to-right non-overlapping, which IS canonical
  BPE's greedy scan ("{a}{a}{a}" under (a,a) → "{aa}{a}");
- early stop (no pair ≥ min_freq) falls out structurally: the
  stage-k argmax CTE is empty, the LEFT JOIN leaves words unchanged,
  and every later stage is empty too.

Every stage is ``AS MATERIALIZED``: stage k is referenced by BOTH
stage k+1's rewrite and its pair count, so DuckDB's default CTE
inlining would re-derive the whole prefix per reference —
exponential in n_merges (measured: >120 s inlined vs 0.09 s
materialized at sf0.01, n_merges=12).
"""

from __future__ import annotations


def bpe_merges_sql(n_merges: int = 12, min_freq: int = 2) -> str:
    """The full oracle SQL: (rank, left, right, merged, pair_freq)
    for up to ``n_merges`` learned merges over `documents`."""
    parts = [
        """w0 AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS freq,
           regexp_replace(word, '(.)', '{\\1}', 'g') AS s
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents)
    GROUP BY word
)"""
    ]
    for k in range(1, n_merges + 1):
        prev = k - 1
        # '}{': the symbol-boundary splitter (symbols never contain
        # braces — tokens are [a-z0-9]+, the guard alphabet is
        # disjoint by construction, operators/bpe.py).
        parts.append(
            f"""p{k} AS MATERIALIZED (
    SELECT p.a AS a, p.b AS b, sum(freq) AS pair_freq FROM (
        SELECT freq, unnest(list_transform(range(1, len(sl)),
            i -> struct_pack(a := sl[i], b := sl[i + 1]))) AS p
        FROM (SELECT freq,
                     str_split(substr(s, 2, length(s) - 2), 'SPLIT') AS sl
              FROM w{prev} WHERE length(s) > 3)
    ) GROUP BY 1, 2
)""".replace("SPLIT", "}{")
        )
        parts.append(
            f"""b{k} AS MATERIALIZED (
    SELECT a, b, CAST(pair_freq AS BIGINT) AS pair_freq FROM p{k}
    WHERE pair_freq >= {min_freq}
    ORDER BY pair_freq DESC, a, b LIMIT 1
)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
    SELECT w.word, w.freq,
           CASE WHEN b.a IS NULL THEN w.s
                ELSE replace(w.s, '{{' || b.a || '}}{{' || b.b || '}}',
                             '{{' || b.a || b.b || '}}') END AS s
    FROM w{prev} w LEFT JOIN b{k} b ON TRUE
)"""
        )
    union = "\n    UNION ALL\n".join(
        f'SELECT CAST({k} AS INTEGER) AS rank, a AS "left", b AS "right", '
        f"a || b AS merged, pair_freq FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union
