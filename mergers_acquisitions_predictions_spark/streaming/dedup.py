"""Streaming deduplication (north-star op): exact dedup over an
unbounded stream with bounded state.

`dropDuplicates` on a stream keeps every seen key in the state store
forever; `dropDuplicatesWithinWatermark` bounds state to the watermark
horizon — the correct primitive for "drop re-deliveries within N
hours" ingest pipelines. Keys are md5 fingerprints (32 bytes/row of
state), never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first event per key; duplicates arriving within the
    watermark horizon are dropped, state evicted beyond it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_near(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "24 hours",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-duplicate dedup over a document ingest stream: the dedup
    key is the full MinHash signature (map-side column expressions,
    identical hash family to the batch d01/d02 path), so two documents
    collide exactly when ALL ``n_hashes`` signature slots agree —
    which for 8 hashes means Jaccard ≈ 1 with high probability (the
    near-exact tier: boilerplate re-crawls, trivial edits).

    State is one short signature string per unique document within the
    watermark horizon — bounded, and orders of magnitude smaller than
    the text. Recall-vs-precision is the n_hashes knob: fewer hashes
    collide more aggressively. A banded OR-over-bands variant (drop if
    ANY band collides, the streaming d02) needs per-band keyed state +
    a per-doc verdict — `applyInPandasWithState` keyed by band_key
    feeding a second stateful aggregation; the signature-key form here
    covers the ingest-dedup case with builtin operators only."""
    from ..operators.dedup import with_minhash_signatures

    carried = [c for c in docs.columns if c != "doc_id"]
    sigs = with_minhash_signatures(
        docs, text_col, "doc_id", n_hashes=n_hashes, shingle_n=shingle_n, keep=carried
    )
    # F.concat (not concat_ws): a NULL slot (shingle-less doc) must
    # poison the key; such docs then fall back to a per-doc unique key
    # so they can never collide with each other.
    sig_key = F.concat(
        *[F.col(f"sig{i}") for i in range(n_hashes)]
    )
    keyed = sigs.withColumn(
        "__sig",
        F.coalesce(sig_key, F.concat(F.lit("nosig:"), F.col("doc_id").cast("string"))),
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__sig"])
        .drop("__sig", *[f"sig{i}" for i in range(n_hashes)])
    )


def dedup_stream_documents(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Content dedup for a document ingest stream: fingerprint the
    normalized text (map-side, 32-byte key) and keep first arrival."""
    with_fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
