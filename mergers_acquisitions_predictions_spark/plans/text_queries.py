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


@query(
    "t01_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(tok) AS n_tokens,
           len(list_distinct(tok)) AS n_distinct_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE round(list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                           / len(tok), 4)
           END AS avg_token_len
    FROM (SELECT doc_id, {SQL_TOKENS} AS tok FROM documents)
    """,
)
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


@query(
    "t02_clean_text",
    oracle=f"""
    SELECT doc_id,
           substr(cleaned, 1, 120) AS clean_prefix,
           CAST(length(cleaned) AS BIGINT) AS n_chars_clean
    FROM (SELECT doc_id, {SQL_CLEAN} AS cleaned FROM documents)
    """,
)
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
