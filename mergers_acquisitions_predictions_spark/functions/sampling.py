"""Deterministic hash-bucket sampling primitives.

THE way to sample/split reproducibly at scale: membership is a pure
function of the key, so it survives reruns, repartitionings, task
retries, and incremental data arrival — `rand()` is none of those
(it reseeds per task attempt). The bucket is the top-60-bit md5 of
the key, portable across engines (see SQL_BUCKET for the DuckDB
spelling the oracles use)."""

from __future__ import annotations

from pyspark.sql import functions as F


def hash_bucket(col, buckets: int):
    """Deterministic bucket in [0, buckets): top-60-bit md5 of the
    key, uniform and engine-portable."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


#: DuckDB spelling of `hash_bucket` — .format(k=key_expr, n=buckets).
SQL_BUCKET = "(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 15))::BIGINT % {n})"
