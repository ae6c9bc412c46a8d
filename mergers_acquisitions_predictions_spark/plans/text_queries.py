"""Text-analysis queries over `documents` (SURVEY §2.6/§2.8 text ops +
north-star text-analysis extensions).

DuckDB-oracle parity notes: tokenization is `regexp_extract_all` on
both sides; per-token reductions (`F.aggregate` vs `list_sum`) run
left-to-right in double; md5 is the portable hash everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import clean_text, remove_stopwords, tokenize, word_ngrams
from ..functions.textstats import LANG_MARKERS, fingerprint, language_id, quality_score
from ..operators.aggregates import document_frequency
from ..operators.util import repartition_for_compute
from ..sources.readers import load_table
from .registry import query

#: DuckDB spelling of `tokenize` (functions/text.py) — keep in sync.
SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
#: DuckDB spelling of `clean_text` (reference F3: digits stripped).
SQL_CLEAN = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g'))"
)
#: DuckDB spelling of `textstats.fingerprint`'s normalization
#: (digits preserved — dedup identity, not the F3 feature cleaner).
SQL_FP_CLEAN = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Text queries are CPU-bound per row; round partition count up to
    # cluster parallelism (no-op at real scale, 32× locally).
    return repartition_for_compute(load_table(spark, sf_dir, "documents"))


def _unigram_model(spark: SparkSession, sf_dir: str):
    """Session-memoized full-corpus unigram LM artifacts: the (tok, c)
    frequency frame and the (n_total, n_vocab) scalars — the model
    constants behind t28/t34 (and t32's Zipf counts, renamed). One
    token-keyed shuffle per session instead of one per scoring query;
    the scalars ride `memoized_literal` so the driver-side `.first()`
    job also runs once. t29 deliberately does NOT share: its model is
    fit on the non-src0 slice (held-out scoring), a different frame."""
    from ..operators.util import memoized_frame, memoized_literal

    def build() -> DataFrame:
        return (
            _docs(spark, sf_dir)
            .select(F.explode(tokenize("text")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    freq = memoized_frame(("unigram_freq", sf_dir, "documents"), build)
    n_total, n_vocab = memoized_literal(
        ("unigram_scalars", sf_dir, "documents"),
        lambda: tuple(
            freq.agg(F.sum("c").cast("long"), F.count(F.lit(1))).first()
        ),
    )
    return freq, int(n_total), int(n_vocab)


# Registered late (plans/extra_queries.py): rotated out of the driver
# window in round 2 to admit t26_bpe_encode — t01 was driver-green in
# round 1 and token counting keeps in-window evidence via t12/t16;
# still value-checked by the local parity sweep.
T01_ORACLE = f"""
    SELECT doc_id,
           len(tok) AS n_tokens,
           len(list_distinct(tok)) AS n_distinct_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE round(list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                           / len(tok), 4)
           END AS avg_token_len
    FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    """


def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (F2 + north-star token-count op). Pure map-side
    expressions — at 100 TB this is a single scan stage."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    n = F.size("tok")
    total_len = F.aggregate(
        F.col("tok"), F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tok")).cast("long").alias("n_distinct_tokens"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(total_len / n, 4))
        .alias("avg_token_len"),
    )


# Registered late (plans/extra_queries.py): rotated out of the driver
# window in round 2 to admit j03_fuzzy_name_match — t02 was
# driver-green in round 1 and its regex-normalization mechanism keeps
# in-window evidence via t01/t15; still value-checked by the local
# parity sweep.
T02_ORACLE = f"""
    SELECT doc_id,
           substr(cleaned, 1, 120) AS clean_prefix,
           CAST(length(cleaned) AS BIGINT) AS n_chars_clean
    FROM (SELECT doc_id, {SQL_CLEAN} AS cleaned FROM documents)
    """


def t02_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex normalization chain (F1/F3/F4, `acq_etl_code.scala:38-44`)
    as column expressions instead of RDD lambdas."""
    d = _docs(spark, sf_dir).select("doc_id", clean_text("text").alias("cleaned"))
    return d.select(
        "doc_id",
        F.substring("cleaned", 1, 120).alias("clean_prefix"),
        F.length("cleaned").cast("long").alias("n_chars_clean"),
    )


@query(
    "t03_ngram_stats",
    oracle=f"""
    SELECT doc_id,
           len(bi) AS n_bigrams,
           len(list_distinct(bi)) AS n_distinct_bigrams,
           len(list_distinct(tri)) AS n_distinct_trigrams
    FROM (
        SELECT doc_id,
               list_transform(range(1, len(tok)),
                              i -> array_to_string(list_slice(tok, i, i + 1), ' ')) AS bi,
               list_transform(range(1, len(tok) - 1),
                              i -> array_to_string(list_slice(tok, i, i + 2), ' ')) AS tri
        FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    )
    """,
)
def t03_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram generation (M2, `NGram` n=2/3 at `acq_etl_code.scala:56-67`)
    as array-slice expressions — stays array-valued like the reference,
    never explodes to rows unless an op needs it."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    bi = word_ngrams(F.col("tok"), 2)
    tri = word_ngrams(F.col("tok"), 3)
    return d.select(
        "doc_id",
        F.size(bi).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bi)).cast("long").alias("n_distinct_bigrams"),
        F.size(F.array_distinct(tri)).cast("long").alias("n_distinct_trigrams"),
    )


_STOP_SQL = "['the','a','an','and','or','of','to','in','is','it']"


@query(
    "t04_stopword_filter",
    oracle=f"""
    SELECT doc_id,
           len(tok) AS n_tokens,
           len(content) AS n_content_tokens,
           len(list_distinct(content)) AS n_distinct_content
    FROM (
        SELECT doc_id, tok,
               list_filter(tok, t -> NOT list_contains({_STOP_SQL}, t)) AS content
        FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    )
    """,
)
def t04_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-word removal (J6, `acq_etl_code.scala:33-41`) as an array
    filter expression — order/multiplicity preserving, no broadcast
    variable, no collect."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    content = remove_stopwords(F.col("tok"))
    return d.select(
        "doc_id",
        F.size("tok").cast("long").alias("n_tokens"),
        F.size(content).cast("long").alias("n_content_tokens"),
        F.size(F.array_distinct(content)).cast("long").alias("n_distinct_content"),
    )


@query(
    "t05_lang_source_stats",
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           round(avg(CAST(len({SQL_TOKENS}) AS DOUBLE)), 4) AS avg_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def t05_lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per (lang, source) — grouped agg over text-derived
    expressions."""
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.round(F.avg(F.size(tokenize("text")).cast("double")), 4).alias("avg_tokens"),
    )


@query(
    "t06_doc_fingerprints",
    oracle=f"SELECT doc_id, md5({SQL_FP_CLEAN}) AS fp FROM documents",
)
def t06_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text — the
    constant-width exact-dedup key (north-star op)."""
    return _docs(spark, sf_dir).select("doc_id", fingerprint("text").alias("fp"))


@query(
    "t07_exact_dedup_summary",
    oracle=f"""
    SELECT count(*) AS n_docs,
           count(DISTINCT md5({SQL_FP_CLEAN})) AS n_unique_texts,
           count(*) - count(DISTINCT md5({SQL_FP_CLEAN})) AS n_dup_docs
    FROM documents
    """,
)
def t07_exact_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup accounting: the shuffle key is the 32-byte
    fingerprint, never the document body."""
    d = _docs(spark, sf_dir).select(fingerprint("text").alias("fp"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.count_distinct("fp")).alias("n_dup_docs"),
    )


@query(
    "t08_vocabulary",
    oracle=f"""
    SELECT term, count(*) AS df
    FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents)
    GROUP BY term
    HAVING count(*) >= 5
    """,
)
def t08_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build with a document-frequency band — the relational
    spelling of `CountVectorizer.setMinDF` (A3,
    `acq_etl_code.scala:73`). array_distinct BEFORE explode keeps the
    shuffle at one row per (doc, distinct term)."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tokens"))
    return document_frequency(d, "doc_id", "tokens", min_df=5)


@query(
    "t09_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS nn FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.c * ln(CAST(n.nn AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
        WHERE tf.doc_id < 20
    )
    SELECT doc_id, term, tfidf, rn
    FROM (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS BIGINT) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def t09_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-level TF-IDF (A3/A4: the relational equivalent of
    CountVectorizer→IDF, `acq_etl_code.scala:71-81`) + per-doc top-k
    (the describeTopics pattern). Ranking is on the ROUNDED score with
    a term tiebreak for cross-engine determinism.

    Scale: tf and df aggregate from the same exploded frame; the doc
    count joins in as a broadcast scalar; top-k is one window shuffle
    on doc_id."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(tokenize("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dfreq = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("nn"))
    scored = (
        tf.filter(F.col("doc_id") < 20)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("c") * F.log(F.col("nn").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


def _lang_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(tok, t -> list_contains([{markers}], t))) AS BIGINT)"
    )


@query(
    "t10_language_id",
    oracle=f"""
    SELECT doc_id, lang AS actual_lang,
           CASE
             WHEN en_h > 0 AND en_h = greatest(en_h, de_h, fr_h, es_h) THEN 'en'
             WHEN de_h > 0 AND de_h = greatest(en_h, de_h, fr_h, es_h) THEN 'de'
             WHEN fr_h > 0 AND fr_h = greatest(en_h, de_h, fr_h, es_h) THEN 'fr'
             WHEN es_h > 0 AND es_h = greatest(en_h, de_h, fr_h, es_h) THEN 'es'
             ELSE 'und'
           END AS pred_lang
    FROM (
        SELECT doc_id, lang,
               {_lang_hits_sql('en')} AS en_h,
               {_lang_hits_sql('de')} AS de_h,
               {_lang_hits_sql('fr')} AS fr_h,
               {_lang_hits_sql('es')} AS es_h
        FROM (SELECT doc_id, lang, {SQL_TOKENS} AS tok FROM documents)
    )
    """,
)
def t10_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stop-word-marker voting (north-star op):
    deterministic argmax with fixed priority, so the heuristic is
    DuckDB-reproducible. Map-side only."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", tokenize("text").alias("tok"))
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        language_id(F.col("tok")).alias("pred_lang"),
    )


@query(
    "t11_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE round(
                    least(len(tok) / 100.0, 1.0)
                    * greatest(0.0, 1.0 - abs(
                        list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                        / len(tok) - 5.0) / 10.0), 6)
           END AS quality
    FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    """,
)
def t11_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality scoring (north-star op): length + token-
    shape heuristic, reproducible in the oracle."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    score = quality_score(F.col("tok"))
    return d.select(
        "doc_id",
        F.when(F.size("tok") == 0, F.lit(0.0))
        .otherwise(F.round(score, 6))
        .alias("quality"),
    )


#: BPE-style pre-tokenizer: leading-space word / number / punctuation
#: runs — the segmentation LLM tokenizers apply before merges.
#: RE2 (DuckDB) and Java regex agree on this subset.
_BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@query(
    "t12_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_pieces,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_ws_tokens
    FROM documents
    WHERE length(trim(text)) > 0
    """,
)
def t12_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for LLM-pipeline budgeting: a BPE-ish
    pre-tokenizer regex (word/number/punct pieces with leading-space
    affinity) alongside plain whitespace tokens. Both are map-side
    regex expressions — a full BPE vocab merge would be a pandas_udf
    over a tokenizer lib, slotting in behind the same column."""
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_pieces"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


#: Chunking geometry: 20-token chunks, 5-token overlap → stride 15.
_CHUNK, _OVERLAP = 20, 5
_STRIDE = _CHUNK - _OVERLAP


# Registered late (plans/extra_queries.py): rotated out of the driver
# window in round 2 to admit t28_unigram_logprob_quality — the
# chunking/packing family keeps in-window evidence via t18 (sequence
# packing) and t20 (pack manifest); still value-checked by the local
# parity sweep.
T14_ORACLE = f"""
    SELECT doc_id,
           (s - 1) // {_STRIDE} AS chunk_id,
           array_to_string(list_slice(tok, s, s + {_CHUNK - 1}), ' ') AS chunk_text,
           CAST(len(list_slice(tok, s, s + {_CHUNK - 1})) AS BIGINT) AS n_tokens
    FROM (
        SELECT doc_id, tok,
               unnest(range(1, greatest(len(tok) - {_OVERLAP}, 1) + 1, {_STRIDE})) AS s
        FROM (SELECT doc_id, {{tok}} AS tok FROM documents)
    )
    """.format(tok=SQL_TOKENS)


def t14_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token-window chunking — the doc→training-
    sample splitter of an LLM data pipeline (20-token chunks, 5-token
    overlap). tokenize + sequence-of-starts + posexplode + slice: all
    map-side array expressions, so chunking a 100 TB corpus is a
    single scan stage with zero shuffles; chunk ids are a pure
    function of (doc_id, start), stable under any partitioning.
    The final short tail chunk is kept (start positions stop once the
    remaining suffix is covered by overlap)."""
    toks = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("tok") - _OVERLAP, F.lit(1)),
        F.lit(_STRIDE),
    )
    ch = toks.select(
        "doc_id", "tok", F.posexplode(starts).alias("chunk_id", "start")
    )
    piece = F.slice("tok", F.col("start"), _CHUNK)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def _pii_oracle_sql() -> str:
    """Build the DuckDB mirror of redact_pii/pii_hits over the same
    synthesized contact string (string concat, not f-string: the
    patterns contain regex braces)."""
    from ..functions.textstats import PII_PATTERNS

    raw = (
        "'contact ' || lower(c_mktsegment) || '@corp.example.com'"
        " || CASE WHEN c_custkey % 2 = 0 THEN ' call +1-555-'"
        "      || lpad(CAST((c_custkey * 7) % 900 + 100 AS VARCHAR), 3, '0')"
        "      || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
        "    ELSE '' END"
        " || CASE WHEN c_custkey % 3 = 0 THEN ' id '"
        "      || lpad(CAST(c_custkey % 1000000000 AS VARCHAR), 9, '0')"
        "    ELSE '' END"
        " || ' note ' || c_name"
    )
    redacted = "raw"
    hits = []
    for name, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        redacted = (
            "regexp_replace(" + redacted + ", '" + lit + "', '<" + name.upper() + ">', 'g')"
        )
        hits.append("len(regexp_extract_all(raw, '" + lit + "'))")
    return (
        "SELECT c_custkey, " + redacted + " AS redacted, "
        "CAST(" + " + ".join(hits) + " AS BIGINT) AS n_pii "
        "FROM (SELECT c_custkey, c_name, " + raw + " AS raw FROM customer)"
    )


@query("t15_pii_redaction", oracle=_pii_oracle_sql())
def t15_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — emails, phone numbers, 9-digit id numbers
    replaced by typed placeholders, with a per-row redaction count.
    The corpus has no organic PII, so a deterministic contact string
    is synthesized per customer row and scrubbed; the patterns and
    the chained-regexp_replace plan are the real operator (map-side,
    no shuffle — at 100 TB the scrub rides inside the scan stage)."""
    from ..functions.textstats import pii_hits, redact_pii

    c = load_table(spark, sf_dir, "customer")
    phone = F.when(
        F.col("c_custkey") % 2 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad(((F.col("c_custkey") * 7) % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    idnum = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(
            F.lit(" id "),
            F.lpad((F.col("c_custkey") % 1000000000).cast("string"), 9, "0"),
        ),
    ).otherwise("")
    raw = F.concat(
        F.lit("contact "),
        F.lower("c_mktsegment"),
        F.lit("@corp.example.com"),
        phone,
        idnum,
        F.lit(" note "),
        F.col("c_name"),
    )
    return c.select("c_custkey", raw.alias("raw")).select(
        "c_custkey",
        redact_pii("raw").alias("redacted"),
        pii_hits("raw").alias("n_pii"),
    )


@query(
    "t16_repetition_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(tok)) / len(tok), 6)
           END AS dup_token_frac,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE round(
                    list_max(list_transform(list_distinct(grams),
                        g -> len(list_filter(grams, x -> x = g)))) / len(grams), 6)
           END AS top_bigram_frac
    FROM (
        SELECT doc_id, tok,
               list_transform(range(1, len(tok)),
                   i -> array_to_string(list_slice(tok, i, i + 1), ' ')) AS grams
        FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    )
    """,
)
def t16_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals for quality filtering:
    duplicate-token fraction and the share of all word bigrams taken
    by the single most frequent bigram. Both are PER-ROW array
    expressions (no explode, no shuffle): the mode count is an
    O(distinct × total) in-row scan — bounded by document length, so
    it stays inside the scan stage at any corpus size."""
    d = _docs(spark, sf_dir).select("doc_id", tokenize("text").alias("tok"))
    grams_expr = word_ngrams(F.col("tok"), 2)

    def top_count(gs):
        return F.array_max(
            F.transform(
                F.array_distinct(gs),
                lambda g: F.size(F.filter(gs, lambda x: x == g)),
            )
        )

    # Bind grams once as a HOF lambda var (NOTES.md: CollapseProject
    # would otherwise re-evaluate the ngram pipeline per reference).
    g = d.select("doc_id", F.col("tok"), grams_expr.alias("grams"))
    return g.select(
        "doc_id",
        F.size("tok").cast("long").alias("n_tokens"),
        F.when(F.size("tok") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.lit(1.0) - F.size(F.array_distinct("tok")) / F.size("tok"), 6)
        )
        .alias("dup_token_frac"),
        F.when(F.size("grams") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.element_at(
                    F.transform(F.array(F.col("grams")), top_count), 1
                )
                / F.size("grams"),
                6,
            )
        )
        .alias("top_bigram_frac"),
    )


@query(
    "t17_winnow_fingerprints",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(range(1, length(norm) - 8 + 2),
                   i -> ('0x' || substr(md5(substr(norm, CAST(i AS INTEGER), 8)),
                         1, 15))::BIGINT) AS hs
        FROM n
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                   j -> list_min(list_slice(hs, j, j + 3)))) AS f
        FROM h
    )
    SELECT doc_id, unnest(f) AS fp FROM fps
    """,
)
def t17_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints, exploded to
    (doc_id, fp) — any ≥11-char shared substring between documents
    guarantees a shared fp, so a self-join on fp finds LOCAL overlap
    (quotes, boilerplate, partial plagiarism) that whole-document
    fingerprints miss. The fingerprint stage is zero-shuffle; the
    downstream overlap join keys on a long, never on text."""
    from ..functions.textstats import winnow_fingerprints

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(winnow_fingerprints(F.col("text"), k=8, w=4)).alias("fp")
    )


@query(
    "t18_sequence_packing",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
        FROM tok
    )
    SELECT doc_id, n_tokens,
           cum_tokens - n_tokens AS start_offset,
           CAST(floor((cum_tokens - n_tokens) / 256.0) AS BIGINT) AS first_pack,
           CAST(floor((cum_tokens - 1) / 256.0) AS BIGINT) AS last_pack,
           CAST(floor((cum_tokens - 1) / 256.0)
                - floor((cum_tokens - n_tokens) / 256.0) + 1 AS BIGINT) AS n_packs
    FROM cum
    WHERE n_tokens > 0
    """,
)
def t18_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk SEQUENCE PACKING — the standard LLM
    pretraining data-prep step: documents are concatenated in a
    deterministic global order (doc_id) and the token stream is cut
    into fixed 256-token training sequences; each document reports the
    packs it lands in (``first_pack``..``last_pack``, boundaries may
    split a document).

    The global running token offset is the scale-critical piece: a
    bare ``Window.orderBy`` would funnel the corpus through ONE task,
    so `operators/curation.pack_sequences` uses
    ``operators/ordered.global_running_sum`` — range partition +
    per-partition scan + broadcast prefix offsets; every stage stays
    distributed at any corpus size."""
    from ..operators.curation import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), seq_len=256)


@query(
    "t19_quality_rank_filter",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               CASE WHEN len(tok) = 0 THEN 0.0
                    ELSE round(
                        least(len(tok) / 100.0, 1.0)
                        * greatest(0.0, 1.0 - abs(
                            list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                            / len(tok) - 5.0) / 10.0), 6)
               END AS quality
        FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    ),
    r AS (
        SELECT doc_id, quality,
               row_number() OVER (ORDER BY quality, doc_id) AS q_rank,
               count(*) OVER () AS n
        FROM q
    )
    SELECT doc_id, quality, CAST(q_rank AS BIGINT) AS q_rank,
           round((q_rank - 1.0) / (n - 1.0), 6) AS pct_rank
    FROM r
    WHERE round((q_rank - 1.0) / (n - 1.0), 6) >= 0.1
    """,
)
def t19_quality_rank_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based quality curation: rank every document by its
    quality score (t11's heuristic) across the WHOLE corpus and drop
    the bottom decile — the dynamic-threshold filter real pipelines
    use when an absolute cutoff would over/under-prune as the corpus
    mix drifts.

    The global rank is the scale-critical piece: ``row_number() OVER
    (ORDER BY ...)`` with no partitioning is a one-task bottleneck, so
    this uses `operators/ordered.global_row_number` (range partition +
    per-partition rank + broadcast offsets). The corpus size scalar
    arrives via a broadcast single-row aggregate, never a collect."""
    from ..operators.ordered import global_row_number

    scored = _docs(spark, sf_dir).select(
        "doc_id",
        F.round(quality_score(tokenize("text")), 6).alias("quality"),
    )
    ranked = global_row_number(scored, ["quality", "doc_id"], out_col="q_rank")
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    pct = F.round((F.col("q_rank") - 1.0) / (F.col("__n") - 1.0), 6)
    from ..operators.util import own_caches

    out = (
        ranked.join(F.broadcast(n))
        .select("doc_id", "quality", "q_rank", pct.alias("pct_rank"))
        .filter(F.col("pct_rank") >= 0.1)
    )
    # ranked owns the prefix-sum checkpoint — transfer to the result.
    return own_caches(out, ranked)


@query(
    "t20_pack_manifest",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
        FROM tok
    ),
    spans AS (
        SELECT doc_id, n_tokens, cum_tokens,
               unnest(range(CAST(floor((cum_tokens - n_tokens) / 256.0) AS BIGINT),
                            CAST(floor((cum_tokens - 1) / 256.0) AS BIGINT) + 1)
               ) AS pack_id
        FROM cum WHERE n_tokens > 0
    )
    SELECT pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(least(cum_tokens, (pack_id + 1) * 256)
                    - greatest(cum_tokens - n_tokens, pack_id * 256))
                AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM spans
    GROUP BY pack_id
    """,
)
def t20_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PER-PACK view of sequence packing (t18 is per-document):
    one row per 256-token training sequence with its document count,
    token occupancy, and covering doc-id span — the manifest a batch
    loader consumes to fetch exactly the documents of pack N. Every
    interior pack's n_tokens is exactly 256 (test-asserted); only the
    final pack is partial.

    Plan: t18's distributed pack assignment, exploded over each
    document's covered pack range (`sequence(first,last)` — bounded:
    a doc spans ⌈tokens/256⌉+1 packs), then ONE aggregation keyed by
    pack_id. Scale note: pack_id is dense and uniform by construction
    — no skew, and the shuffle carries one short row per (doc, pack)
    span."""
    from ..operators.curation import pack_sequences

    seq_len = 256
    packed = pack_sequences(load_table(spark, sf_dir, "documents"), seq_len=seq_len)
    end = F.col("start_offset") + F.col("n_tokens")
    tokens_in = F.least(end, (F.col("pack_id") + 1) * seq_len) - F.greatest(
        F.col("start_offset"), F.col("pack_id") * seq_len
    )
    from ..operators.util import own_caches

    return own_caches(
        packed.select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.explode(F.sequence("first_pack", "last_pack")).alias("pack_id"),
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(tokens_in).cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        ),
        packed,  # inherits the prefix-sum checkpoint ownership
    )


#: t26's shipped tokenizer artifact: a fixed merge list in rank order
#: (production BPE application runs a FROZEN vocab; learning is t25).
#: Chosen to exercise multi-level merges on this corpus ("or"+"t",
#: "b"+"at", "c"+"an" consume earlier merges' outputs).
T26_MERGES = [
    ("s", "t"), ("a", "t"), ("o", "r"), ("e", "r"), ("a", "n"),
    ("t", "h"), ("or", "t"), ("b", "at"), ("r", "o"), ("c", "an"),
]


def _sql_bpe_apply(expr: str) -> str:
    """The DuckDB spelling of bpe_segment's replace chain."""
    for a, b in T26_MERGES:
        expr = f"replace({expr}, '{{{a}}}{{{b}}}', '{{{a}{b}}}')"
    return expr


_SQL_WRAPPED = (
    "array_to_string(list_transform(" + SQL_TOKENS
    + r", w -> regexp_replace(w, '(.)', '{\1}', 'g')), ' ')"
)


@query(
    "t26_bpe_encode",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_word_tokens,
           CAST(length(seg) - length(replace(seg, '}}', '')) AS BIGINT)
               AS n_bpe_tokens,
           substr(translate(seg, '{{}}', ' '), 1, 80) AS bpe_preview
    FROM (
        SELECT doc_id, toks, {_sql_bpe_apply('s')} AS seg
        FROM (SELECT doc_id, {SQL_TOKENS} AS toks,
                     {_SQL_WRAPPED} AS s
              FROM documents)
    )
    """,
)
def t26_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword (BPE) ENCODING of the corpus with a fixed merge table —
    the tokenization pass every training run does over all 100 TB, so
    it must be pure JVM column work: guard-wrapped symbols + one
    built-in left-to-right `replace` per merge (greedy merge order by
    construction; guards make cross-symbol/word matches impossible).
    No Python, no shuffle — map-side over the scan. Learning the
    merges is t25 (operators/bpe.learn_bpe_merges); both engines
    replay the identical rewrite chain, so this is fully
    value-checked."""
    from ..operators.bpe import bpe_readable, bpe_segment, bpe_token_count

    d = load_table(spark, sf_dir, "documents")
    seg = d.select(
        "doc_id",
        F.size(tokenize("text")).cast("long").alias("n_word_tokens"),
        bpe_segment("text", [(a, b) for a, b in T26_MERGES]).alias("seg"),
    )
    return seg.select(
        "doc_id",
        "n_word_tokens",
        bpe_token_count(F.col("seg")).alias("n_bpe_tokens"),
        F.substring(bpe_readable(F.col("seg")), 1, 80).alias("bpe_preview"),
    )


@query(
    "t28_unigram_logprob_quality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM tok),
    voc AS (SELECT count(*) AS v FROM freq)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln((f.c + 1) / (CAST(tot.n AS DOUBLE) + voc.v))), 6)
               AS avg_logprob
    FROM tok JOIN freq f USING (tok), tot, voc
    GROUP BY doc_id
    """,
)
def t28_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, unigram flavor (the CCNet/
    perplexity-filter shape): learn token probabilities FROM the
    corpus (Laplace-smoothed), score each document by mean token
    log-probability. Low scorers are gibberish/boilerplate/OOV-dense;
    thresholding is downstream's call (compose with t19's percentile
    rank filter).

    Plan: ONE token-keyed shuffle builds the frequency table; N and V
    are two driver-side scalars (model constants, like class
    weights); the score join is freq-table-sized on the build side —
    vocabulary, not corpus (AQE broadcasts when it fits; ~10⁷ rows at
    100 TB, no forced hint) — then one doc-keyed aggregate. Docs with
    zero tokens have no defined score and drop out (join semantics,
    both engines)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokenize("text")).alias("tok")
    )
    freq, n_total, n_vocab = _unigram_model(spark, sf_dir)
    logp = F.log((F.col("c") + 1) / F.lit(float(n_total) + float(n_vocab)))
    scored = d.join(freq.select("tok", logp.alias("logp")), "tok")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("logp"), 6).alias("avg_logprob"),
    )


@query(
    "t34_ccnet_buckets",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM tok),
    voc AS (SELECT count(*) AS v FROM freq),
    scored AS (
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(floor(avg(ln((f.c + 1) / (CAST(tot.n AS DOUBLE) + voc.v)))
                          * 1e6 + 0.5) AS BIGINT) AS score_ppm
        FROM tok JOIN freq f USING (tok), tot, voc
        GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_tokens, score_ppm,
           CAST(ntile(3) OVER (
               PARTITION BY lang ORDER BY score_ppm DESC, doc_id
           ) AS BIGINT) AS bucket,
           CASE ntile(3) OVER (
               PARTITION BY lang ORDER BY score_ppm DESC, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket_label
    FROM scored
    """,
)
def t34_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partitioning (Wenzek et al.
    2020): score every document by corpus-LM mean token log-prob
    (t28's unigram scorer), then split EACH LANGUAGE into perplexity
    terciles — 'head' is the cleanest third a pretraining mix
    upsamples, 'tail' the third it drops or down-weights. Per-language
    bucketing is the point: absolute perplexity is not comparable
    across languages, so thresholds must be language-relative.

    Plan: t28's shapes (one token-keyed shuffle for the freq table,
    two scalar model constants, vocab-sized score join, one doc-keyed
    aggregate) plus ONE lang-keyed window exchange for the terciles.
    At 100 TB the ntile sort is per-language; a language so dominant
    its partition breaks the sort budget switches to approx-quantile
    boundary assignment (q33's percentile machinery) at the cost of
    exact tercile cardinality — documented, not defaulted, because
    exact ntile is what the oracle can replay. Scores become integer
    ppm BEFORE ranking (floor(x*1e6+0.5) — engine-portable round-
    half-up, NOTES.md) so the tercile cut is bit-stable cross-engine."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(tokenize("text")).alias("tok")
    )
    freq, n_total, n_vocab = _unigram_model(spark, sf_dir)
    logp = F.log((F.col("c") + 1) / F.lit(float(n_total) + float(n_vocab)))
    scored = (
        d.join(freq.select("tok", logp.alias("logp")), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.floor(F.avg("logp") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("score_ppm"),
        )
    )
    w = W.partitionBy("lang").orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    bucket = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "score_ppm",
        bucket.cast("long").alias("bucket"),
        F.when(bucket == 1, "head")
        .when(bucket == 2, "middle")
        .otherwise("tail")
        .alias("bucket_label"),
    )


@query(
    "t35_source_overlap_matrix",
    oracle=f"""
    WITH fps AS (
        SELECT DISTINCT md5({SQL_FP_CLEAN}) AS fp, source FROM documents
    ),
    totals AS (SELECT source, count(*) AS n_fps FROM fps GROUP BY source),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS shared_fps
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           CAST(shared_fps AS BIGINT) AS shared_fps,
           CAST(ta.n_fps AS BIGINT) AS n_fps_a,
           CAST(tb.n_fps AS BIGINT) AS n_fps_b,
           CAST(floor(CAST(shared_fps AS DOUBLE)
                      / least(ta.n_fps, tb.n_fps) * 1e6 + 0.5) AS BIGINT)
               AS overlap_ppm
    FROM pairs
    JOIN totals ta ON ta.source = source_a
    JOIN totals tb ON tb.source = source_b
    """,
)
def t35_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE duplication matrix: for every source pair, how
    many exact-dedup fingerprints they share, normalized by the
    smaller source (overlap coefficient, ppm) — the curation view
    that decides dedup ORDER and mixture design (two crawls sharing
    40% of their content should not both get full mixture weight;
    dedup the cheaper one against the better one). Web-scale corpora
    (CC dumps across months) make this the first diagnostic run.

    Scale shape: fingerprints ride the shuffle, never text; the fp
    self-join is BOUNDED — a fingerprint appears in at most
    n_sources rows (DISTINCT per source first), so pairs-per-fp ≤
    C(n_sources,2) regardless of how many documents share the text:
    no hot-key quadratic, unlike a doc-level join. Two fp-keyed
    shuffles + one pair-keyed aggregate; totals broadcast back.
    overlap is integer ppm (floor(x*1e6+0.5), NOTES.md)."""
    d = _docs(spark, sf_dir).select(
        fingerprint("text").alias("fp"), "source"
    ).distinct()
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_fps"))
    a = d.select("fp", F.col("source").alias("source_a"))
    b = d.select("fp", F.col("source").alias("source_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("source").alias("source_a"), F.col("n_fps").alias("n_fps_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("source_b"), F.col("n_fps").alias("n_fps_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("shared_fps").cast("long").alias("shared_fps"),
            F.col("n_fps_a").cast("long").alias("n_fps_a"),
            F.col("n_fps_b").cast("long").alias("n_fps_b"),
            F.floor(
                F.col("shared_fps").cast("double")
                / F.least("n_fps_a", "n_fps_b")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("overlap_ppm"),
        )
    )
