"""Property-based tests (hypothesis) for algebraic invariants that
example-based tests can miss: MinHash union law, session-window gap
invariants, discrete-quantile definition.

Each example drives a real Spark job, so example counts are small and
deadlines are off.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.windows import session_windows_batch

tokens_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=3, max_size=25
)


@settings(max_examples=8, deadline=None)
@given(a=tokens_strategy, b=tokens_strategy)
def test_minhash_union_law(spark, a, b):
    """sig(A ∪ B) == elementwise min(sig(A), sig(B)) — the property
    that makes MinHash signatures mergeable (and therefore
    partial-aggregatable at scale)."""
    from mergers_acquisitions_predictions_spark.operators.dedup import (
        with_minhash_signatures,
    )

    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(a + b))],
        ["doc_id", "text"],
    )
    # shingle_n=1 so doc 2's shingle set is EXACTLY set(a) | set(b)
    # (word n-grams > 1 would add boundary shingles at the a|b seam)
    rows = {
        r.doc_id: [r[f"sig{i}"] for i in range(8)]
        for r in with_minhash_signatures(df, n_hashes=8, shingle_n=1).collect()
    }
    merged = [
        min(x for x in (sa, sb) if x is not None) if (sa or sb) else None
        for sa, sb in zip(rows[0], rows[1])
    ]
    assert rows[2] == merged


@settings(max_examples=8, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=30)
)
def test_session_window_gap_invariant(spark, gaps):
    """Within a session, consecutive events are ≤ gap apart; the first
    event of each new session is > gap after the previous event."""
    gap_minutes = 30
    t = dt.datetime(2024, 1, 1)
    times = []
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        times.append(t)
    df = spark.createDataFrame(
        [(1, i, ts, 1.0) for i, ts in enumerate(times)],
        ["user_id", "event_id", "ts", "value"],
    )
    sessions = sorted(
        (r.session_start, r.n_events)
        for r in session_windows_batch(
            df, ts="ts", key="user_id", gap_minutes=gap_minutes
        ).collect()
    )
    # python ground truth: islands over the same gap rule
    expected = []
    start, n, prev = times[0], 0, None
    for ts in times:
        if prev is not None and (ts - prev).total_seconds() > gap_minutes * 60:
            expected.append((start, n))
            start, n = ts, 0
        n += 1
        prev = ts
    expected.append((start, n))
    assert sessions == sorted(expected)
    assert sum(n for _, n in sessions) == len(times)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=40
    ),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.9, 0.95]),
)
def test_discrete_quantile_definition(spark, vals, q):
    """The rank-vs-count quantile (q33) equals sorted[ceil(q*n)-1] —
    DuckDB quantile_disc's definition."""
    import math

    from pyspark.sql import Window as W

    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    w = W.orderBy("x")
    ranked = df.select(
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    target = F.ceil(F.lit(q) * F.col("n"))
    got = ranked.agg(F.min(F.when(F.col("rn") >= target, F.col("x")))).first()[0]
    want = sorted(vals)[math.ceil(q * len(vals)) - 1]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_global_running_sum_equals_sequential_scan(spark, vals, n_parts):
    """The two-phase distributed prefix sum must equal the sequential
    scan for ANY input layout — including empty range partitions,
    single rows, and heavy duplicates in the values."""
    from mergers_acquisitions_predictions_spark.operators.ordered import (
        global_running_sum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(n_parts)
    got = {
        r.k: r.running_sum for r in global_running_sum(df, "k", "v").collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_global_row_number_is_a_permutation_rank(spark, keys, n_parts):
    """Ranks are exactly 1..n and agree with Python's stable sort on
    (key, id) — for any duplicate-heavy key distribution and any
    input partitioning."""
    from mergers_acquisitions_predictions_spark.operators.ordered import (
        global_row_number,
    )

    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["k", "id"]).repartition(n_parts)
    got = {r.id: r.row_num for r in global_row_number(df, ["k", "id"]).collect()}
    order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
    want = {i: rank + 1 for rank, i in enumerate(order)}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=600),
)
def test_shard_assignment_replays_prefix_sum(spark, toks, budget):
    """shard == floor(start_offset / budget) over the id-ordered token
    stream, for ANY token distribution and budget — the whole-document
    sharding contract (docs never split, shards fill in order)."""
    from mergers_acquisitions_predictions_spark.operators.curation import (
        shard_by_token_budget,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_tokens, r.shard)
        for r in shard_by_token_budget(docs, budget).collect()
    }
    cum = 0
    for i, n in enumerate(toks):
        assert got[i] == (n, cum // budget)
        cum += n


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=200), min_size=2, max_size=30),
    weight=st.floats(min_value=0.01, max_value=10.0),
    budget=st.integers(min_value=1, max_value=5000),
)
def test_mixture_sample_rate_law(spark, toks, weight, budget):
    """keep_rate == min(1, weight*budget / source_tokens) exactly; the
    sample is a subset of the source; unweighted sources never leak."""
    from mergers_acquisitions_predictions_spark.operators.curation import (
        mixture_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", " ".join(["w"] * n)) for i, n in enumerate(toks)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = mixture_sample(docs, {"a": weight}, budget).collect()
    a_tokens = sum(n for i, n in enumerate(toks) if i % 2 == 0)
    expect_rate = min(1.0, weight * float(budget) / float(a_tokens))
    assert all(r.source == "a" for r in out)  # 'b' is unweighted
    assert all(r.keep_rate == expect_rate for r in out)
    a_ids = {i for i in range(len(toks)) if i % 2 == 0}
    assert {r.doc_id for r in out} <= a_ids
    if expect_rate == 1.0:
        assert {r.doc_id for r in out} == a_ids  # clipped rate keeps all


@settings(max_examples=8, deadline=None)
@given(
    n_a=st.integers(min_value=1, max_value=20),
    n_b=st.integers(min_value=1, max_value=20),
    w_a=st.floats(min_value=0.05, max_value=5.0),
    w_b=st.floats(min_value=0.05, max_value=5.0),
)
def test_interleaved_order_replays_wfq_schedule(spark, n_a, n_b, w_a, w_b):
    """The serving order equals the weighted-fair-queuing replay:
    sort (src_rank / weight, source, id) — for ANY weights and source
    sizes, positions are dense 1..N and match the Python replay."""
    from mergers_acquisitions_predictions_spark.operators.curation import (
        interleaved_order,
    )

    rows = [(i, "a") for i in range(n_a)] + [(100 + i, "b") for i in range(n_b)]
    docs = spark.createDataFrame(
        [(i, s, "w") for i, s in rows], ["doc_id", "source", "text"]
    )
    got = {
        r.position: (r.doc_id, r.source)
        for r in interleaved_order(docs, {"a": w_a, "b": w_b}).collect()
    }
    replay = sorted(
        ((r + 1) / {"a": w_a, "b": w_b}[s], s, i)
        for i, s in rows
        for r in [[x for x, t in rows if t == s].index(i)]
    )
    want = {p + 1: (i, s) for p, (vt, s, i) in enumerate(replay)}
    assert got == want


_names = st.lists(
    st.text(alphabet="abc ", min_size=1, max_size=8), min_size=1, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(left=_names, right=_names, k=st.integers(min_value=0, max_value=3))
def test_fuzzy_join_equals_brute_force_within_blocks(spark, left, right, k):
    """fuzzy_join must equal the brute-force cross join filtered by
    the SAME blocking predicate + edit-distance bound, with the exact
    distance reported — on arbitrary strings (including empties after
    strip, repeats, and all-space names)."""
    from mergers_acquisitions_predictions_spark.operators.joins import fuzzy_join

    l = spark.createDataFrame(
        [(i, s) for i, s in enumerate(left)], "lid int, lname string"
    )
    r = spark.createDataFrame(
        [(i, s) for i, s in enumerate(right)], "rid int, rname string"
    )
    blk = lambda c: F.substring(F.col(c), 1, 1)  # noqa: E731
    got = {
        (x.lid, x.rid, x.edit_dist)
        for x in fuzzy_join(
            l, r, "lname", "rname", blk("lname"), blk("rname"), max_dist=k
        ).collect()
    }
    want = {
        (x.lid, x.rid, x.d)
        for x in l.crossJoin(r)
        .withColumn("d", F.levenshtein("lname", "rname"))
        .where(
            (F.substring("lname", 1, 1) == F.substring("rname", 1, 1))
            & (F.col("d") <= k)
        )
        .collect()
    }
    assert got == want


corpus_strategy = st.lists(
    st.lists(
        st.sampled_from("aa bb cc dd ee".split()), min_size=0, max_size=14
    ),
    min_size=2,
    max_size=6,
)


def _ref_trim(docs: dict[int, list[str]], w: int) -> dict[int, list[str]]:
    """Pure-python reference of trim_dup_spans' greedy-by-gram
    semantics: keeper = lexicographic-min (doc, pos) per cross-doc
    gram; every other occurrence drops its w positions."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, toks in docs.items():
        for p in range(len(toks) - w + 1):
            occ.setdefault(tuple(toks[p : p + w]), []).append((d, p))
    drops: dict[int, set[int]] = {d: set() for d in docs}
    for gram, places in occ.items():
        if len({d for d, _ in places}) < 2:
            continue
        keeper = min(places)
        for d, p in places:
            if (d, p) != keeper:
                drops[d].update(range(p, p + w))
    return {
        d: [t for i, t in enumerate(toks) if i not in drops[d]]
        for d, toks in docs.items()
    }


@settings(max_examples=8, deadline=None)
@given(corpus=corpus_strategy)
def test_trim_dup_spans_matches_python_reference(spark, corpus):
    """trim_dup_spans == the 20-line sequential reference on random
    small-alphabet corpora (small alphabet forces heavy window
    collisions — overlapping drops, multi-doc grams, keeper races)."""
    from mergers_acquisitions_predictions_spark.operators.dedup import trim_dup_spans

    w = 3
    docs = {i: toks for i, toks in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in trim_dup_spans(df, window=w, return_text=True).collect()
    }
    want = _ref_trim(docs, w)
    for d, toks in want.items():
        assert got[d] == (len(toks), " ".join(toks)), (d, docs[d], got[d], toks)


_vec = st.lists(
    # bounded away from 0 so every vector has a safely nonzero norm
    st.floats(min_value=0.0625, max_value=1.0, width=32),
    min_size=8,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(_vec, min_size=5, max_size=12))
def test_pq_encode_matches_sequential_reference(spark, vecs):
    """pq_encode == a plain-Python PQ encoder (normalize, slice,
    rounded argmin with first-min tie-break) on arbitrary float32
    vectors — the Spark HOF expression and the reference must agree
    code-for-code, including ties."""
    import math

    from mergers_acquisitions_predictions_spark.operators.pq import (
        pq_anchor_codebooks,
        pq_encode,
    )

    n_sub, sub = 4, 2
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    cbs = pq_anchor_codebooks(df, n_subspaces=n_sub, n_codes=3)

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return [x / math.sqrt(acc) for x in v]

    def ref_codes(v):
        u = norm(v)
        out = []
        for m in range(n_sub):
            sl = u[m * sub : (m + 1) * sub]
            ds = [
                round(sum((a - b) * (a - b) for a, b in zip(sl, code)), 6)
                for code in cbs[m]
            ]
            out.append(ds.index(min(ds)))
        return out

    from mergers_acquisitions_predictions_spark.functions.vectors import l2_norm

    u = F.transform(
        F.col("embedding"), lambda x: x.cast("double") / l2_norm(F.col("embedding"))
    )
    got = {
        r.vec_id: list(r.pq)
        for r in df.select("vec_id", pq_encode(u, cbs).alias("pq")).collect()
    }
    # float32 -> python float round-trip: collect the same casts Spark sees
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in df.collect()}
    for i in got:
        assert got[i] == ref_codes(raw[i]), i


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=3),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=6,
    ),
    qterms=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_reference_implementation(spark, docs, qterms):
    """Round 13: the engine's BM25 must equal an independent
    pure-Python computation of the Lucene-IDF formula on arbitrary
    corpora — scores to 6 dp, ranking by (score desc, doc_id), docs
    sharing no query term absent."""
    import math

    from mergers_acquisitions_predictions_spark.operators.bm25 import (
        B,
        K1,
        bm25_topk,
    )

    toks = {i: d for i, d in enumerate(docs)}
    frame = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in toks.items()], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(0, t) for t in qterms], "query_id long, term string"
    )
    got = {
        r.doc_id: (r.bm25, r.rank)
        for r in bm25_topk(frame, q, k=len(docs)).collect()
    }

    n = len(toks)
    avgdl = sum(len(d) for d in toks.values()) / n
    want = {}
    for d, tk in toks.items():
        s = 0.0
        for t in sorted(set(qterms)):
            c = tk.count(t)
            if not c:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            s += (idf * (c * (K1 + 1))) / (
                c + K1 * ((1 - B) + B * len(tk) / avgdl)
            )
        if s:
            want[d] = round(s, 6)
    assert {d: v[0] for d, v in got.items()} == want
    order = sorted(want, key=lambda d: (-want[d], d))
    assert [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == order
