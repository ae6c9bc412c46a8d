"""Source/sink roundtrip queries (SURVEY §2.1): driver rows for the
reader/sink family — S1 (whole-file corpus scan + path metadata), S2
(line text scan), S3 (CSV header read), S4 (CSV headerless → named),
S7 (CSV sink), S8 (single-file sink).

These are the artifact-handshake recipe (plans/handshake.py) applied
to SOURCES: the query WRITES real files through the engine's sinks,
reads them back through the engine's readers, and the oracle reads
the very same files with DuckDB's native ``read_csv``/``read_text`` —
so the hash certifies the sink's encoding and the reader's parsing
cross-engine, not a relational twin. (VERDICT r5 #1: the parquet sink
S6 was certified this way in round 5 via m02/s13; this closes the
rest of the family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table, read_corpus_dir, read_csv, read_lines
from ..sources.writers import write_csv, write_single_csv
from .handshake import handshake_path
from .registry import query

_IO01_DETAIL = handshake_path("io01_detail")
_IO01_SUMMARY = handshake_path("io01_summary")

#: DuckDB column specs for the two CSV artifacts (doubled braces: the
#: oracle is an f-string).
_IO01_DETAIL_COLS = (
    "{'o_orderkey': 'BIGINT', 'o_custkey': 'BIGINT', "
    "'o_orderstatus': 'VARCHAR', 'o_orderdate': 'DATE', "
    "'o_orderpriority': 'VARCHAR'}"
)
_IO01_SUMMARY_COLS = (
    "{'o_orderstatus': 'VARCHAR', 'n_direct': 'BIGINT', "
    "'n_prio_direct': 'BIGINT', 'first_direct': 'DATE', "
    "'last_direct': 'DATE'}"
)


@query(
    "io01_csv_roundtrip",
    oracle=f"""
    WITH d AS (
        SELECT * FROM read_csv('{_IO01_DETAIL}/*.csv', header = true,
                               columns = {_IO01_DETAIL_COLS})
    ),
    s AS (
        SELECT * FROM read_csv('{_IO01_SUMMARY}/*.csv', header = false,
                               columns = {_IO01_SUMMARY_COLS})
    ),
    agg AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rt,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio_rt,
               strftime(min(o_orderdate), '%Y-%m-%d') AS first_rt,
               strftime(max(o_orderdate), '%Y-%m-%d') AS last_rt
        FROM d GROUP BY 1
    )
    SELECT o_orderstatus, n_rt, n_prio_rt, first_rt, last_rt,
           n_direct, n_prio_direct,
           strftime(first_direct, '%Y-%m-%d') AS first_str,
           strftime(last_direct, '%Y-%m-%d') AS last_str
    FROM agg JOIN s USING (o_orderstatus)
    """,
)
def io01_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink→source roundtrip certifying S3/S4/S7/S8 in one loop
    (reference: headered acquirer CSVs `join_acquirers.scala:15-16,37`
    and the headerless single-file export `predictions.scala:39-41`):

    - S7: the orders projection is written DISTRIBUTED with headers
      (`writers.write_csv`, one header per part file);
    - S8: the per-status summary is written as a SINGLE headerless
      file (`writers.write_single_csv` — driver-sized finals only);
    - S3: the detail comes back through `readers.read_csv` with an
      explicit schema, header consumed per part file;
    - S4: the summary comes back headerless with POSITIONAL columns
      bound to names by the declared schema (the reference's `_cN`
      access, typed).

    The returned frame joins the re-aggregated roundtripped detail
    against the directly-written summary (they must agree row for
    row), and the oracle recomputes BOTH sides from the same files
    with DuckDB's CSV reader — so the hash certifies Spark's CSV
    encoding (dates, strings, bigints) and parsing cross-engine.
    Fixed artifact paths per the handshake contract
    (plans/handshake.py); these sinks ARE the certified operators, so
    the write intentionally goes through them unmodified rather than
    the atomic-publish wrapper."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    write_csv(o, _IO01_DETAIL, header=True)
    summary = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_direct"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_prio_direct"),
        F.min("o_orderdate").alias("first_direct"),
        F.max("o_orderdate").alias("last_direct"),
    )
    write_single_csv(
        summary.select(
            "o_orderstatus", "n_direct", "n_prio_direct",
            "first_direct", "last_direct",
        ),
        _IO01_SUMMARY,
        header=False,
    )
    detail_rt = read_csv(
        spark,
        _IO01_DETAIL,
        schema=(
            "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
            "o_orderdate DATE, o_orderpriority STRING"
        ),
        header=True,
    )
    summary_rt = read_csv(
        spark,
        _IO01_SUMMARY,
        schema=(
            "o_orderstatus STRING, n_direct BIGINT, n_prio_direct BIGINT, "
            "first_direct DATE, last_direct DATE"
        ),
        header=False,
    )
    agg = detail_rt.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rt"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_prio_rt"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_rt"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_rt"),
    )
    # Dates stay typed through the roundtrip (written as DATE, parsed
    # back as DATE on both engines); the OUTPUT rows export them as
    # ISO strings — the repo's date-column convention for the
    # value-hash gate (pandas date-vs-datetime64 dtype aliasing).
    return agg.join(summary_rt, "o_orderstatus").select(
        "o_orderstatus", "n_rt", "n_prio_rt", "first_rt", "last_rt",
        "n_direct", "n_prio_direct",
        F.date_format("first_direct", "yyyy-MM-dd").alias("first_str"),
        F.date_format("last_direct", "yyyy-MM-dd").alias("last_str"),
    )


_IO02_CORPUS = handshake_path("io02_corpus")

#: Fixture bound: io02 materializes files for doc_id < _IO02_N_DOCS
#: only — the collect is fixture-sized by construction, never
#: corpus-sized (the engine operators under test are the READERS).
_IO02_N_DOCS = 60
_IO02_DOCS_PER_FILE = 10


@query(
    "io02_corpus_dir_scan",
    oracle=f"""
    WITH files AS (
        SELECT str_split_regex(filename, '/|_') AS seg, content
        FROM read_text('{_IO02_CORPUS}/*.txt')
    )
    SELECT CAST(seg[-3] AS BIGINT) AS cik,
           strftime(CAST(seg[-2] AS DATE), '%Y-%m-%d') AS report_date,
           CAST(length(content) AS BIGINT) AS n_chars,
           CAST(len(string_split(content, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(regexp_extract_all(lower(content), '[a-z0-9_]+'))
                AS BIGINT) AS n_tokens
    FROM files
    """,
)
def io02_corpus_dir_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file + line-oriented text scans certifying S1/S2
    (reference: `sc.wholeTextFiles` with path-borne report_date/cik,
    `acq_etl_code.scala:12-16,37-47`): a small corpus directory is
    materialized with the reference's `_`-delimited path metadata
    (`<cik>_<date>_part.txt`, one doc per line), then read back TWO
    ways inside one plan —

    - S1 `readers.read_corpus_dir`: one row per FILE, cik and
      report_date extracted from `input_file_name` with column
      expressions (segments addressed from the path END so the layout
      is scratch-root-independent); contributes n_chars.
    - S2 `readers.read_lines`: one row per LINE, aggregated per file;
      contributes n_lines and n_tokens (tokens counted per line and
      summed — equal to whole-content counting because the join
      delimiter is the line break).

    The oracle reads the same files with DuckDB `read_text` and
    replays the path parsing with string ops, so the hash certifies
    both readers' content fidelity and the path-metadata extraction
    cross-engine. The fixture write collects `_IO02_N_DOCS` documents
    (bounded by construction, see the constant) — the operators under
    test are the readers, the files are their input."""
    import os
    import shutil

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _IO02_N_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    groups: dict[int, list] = {}
    for r in docs:
        groups.setdefault(int(r["doc_id"]) // _IO02_DOCS_PER_FILE, []).append(r)
    shutil.rmtree(_IO02_CORPUS, ignore_errors=True)
    os.makedirs(_IO02_CORPUS)
    for g, rows in groups.items():
        cik = 100 + g
        date = f"2020-01-{g + 1:02d}"
        body = "\n".join(
            r["text"] for r in sorted(rows, key=lambda r: r["doc_id"])
        )
        with open(
            os.path.join(_IO02_CORPUS, f"{cik}_{date}_part.txt"), "w"
        ) as f:
            f.write(body)

    seg = F.split(F.input_file_name(), r"/|_")
    tokens_per_line = F.size(
        F.regexp_extract_all(F.lower(F.col("line")), F.lit("[a-z0-9_]+"), 0)
    )
    per_file_lines = (
        read_lines(spark, _IO02_CORPUS)
        .select(
            F.element_at(seg, -3).cast("long").alias("cik"),
            F.lit(1).alias("one"),
            tokens_per_line.alias("line_tokens"),
        )
        .groupBy("cik")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("line_tokens").cast("long").alias("n_tokens"),
        )
    )
    whole = read_corpus_dir(
        spark, _IO02_CORPUS, date_segment=-2, cik_segment=-3
    ).select(
        F.col("cik").cast("long").alias("cik"),
        F.date_format("report_date", "yyyy-MM-dd").alias("report_date"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return whole.join(per_file_lines, "cik").select(
        "cik", "report_date", "n_chars", "n_lines", "n_tokens"
    )


_IO03_DOCS = handshake_path("io03_jsonl")

#: One deliberately-malformed line, exercising PERMISSIVE
#: corrupt-record routing end to end (the 100 TB-pipeline contract:
#: dirty lines are routed, never fatal — readers.read_jsonl).
_IO03_CORRUPT_LINE = '{"doc_id": 17, "text": "trunca'


@query(
    "io03_jsonl_roundtrip",
    oracle=f"""
    WITH l AS (
        SELECT line FROM read_csv('{_IO03_DOCS}/*.json', header = false,
            columns = {{'line': 'VARCHAR'}}, delim = '', quote = '',
            escape = '')
    ),
    p AS (
        SELECT CASE WHEN json_valid(line)
                    THEN CAST(json_extract(line, '$.doc_id') AS BIGINT) % 5
                    ELSE -1 END AS bucket,
               CASE WHEN json_valid(line)
                    THEN length(json_extract_string(line, '$.text'))
                    END AS chars_line
        FROM l
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(chars_line) AS BIGINT) AS sum_chars
    FROM p GROUP BY 1
    """,
)
def io03_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines sink→source roundtrip WITH corrupt-record routing —
    the interchange format large text corpora actually ship in
    (SURVEY §2.1 engine extras; `writers.write_jsonl` /
    `readers.read_jsonl`): the documents projection is written as
    JSONL through the engine's sink, one malformed line is planted in
    the directory, and the read comes back through `read_jsonl` in
    PERMISSIVE mode with an explicit schema — valid rows parse typed,
    the malformed line lands in `_corrupt_record` instead of failing
    the scan (the declared 100 TB contract: a dirty line five hours
    into a job is routed, not fatal).

    The returned frame buckets rows by doc_id%5 with the corrupt row
    under bucket -1; the oracle reads the SAME files line-wise in
    DuckDB (read_csv with delimiting disabled), splits on
    `json_valid`, and replays the aggregation — so the hash certifies
    the sink's JSON string escaping, the reader's typed parsing, AND
    the corrupt-routing split cross-engine. (ORC has no DuckDB-side
    reader, so the ORC roundtrip stays pytest-certified —
    test_sources::orc_roundtrip.)"""
    import os

    from ..sources.readers import read_jsonl
    from ..sources.writers import write_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    write_jsonl(docs, _IO03_DOCS)
    with open(os.path.join(_IO03_DOCS, "zz-corrupt.json"), "w") as f:
        f.write(_IO03_CORRUPT_LINE + "\n")
    rt = read_jsonl(
        spark,
        _IO03_DOCS,
        "doc_id BIGINT, text STRING",
        mode="PERMISSIVE",
        corrupt_col="_corrupt_record",
    )
    good = F.col("_corrupt_record").isNull()
    return (
        rt.select(
            F.when(good, F.col("doc_id") % 5).otherwise(-1).alias("bucket"),
            F.when(good, F.length("text")).alias("chars_line"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("chars_line").cast("long").alias("sum_chars"),
        )
    )


_IO04_Z = handshake_path("io04_zorder")


@query(
    "io04_layout_roundtrip",
    oracle=f"""
    WITH z AS (
        SELECT * FROM read_parquet('{_IO04_Z}/*.parquet')
    ),
    box AS (
        SELECT * FROM z
        WHERE l_partkey BETWEEN 1 AND 50 AND l_suppkey BETWEEN 1 AND 5
    ),
    zbox AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_box,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_box,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM box GROUP BY 1
    ),
    salted AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_salted,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_salted
        FROM box GROUP BY 1
    ),
    src AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_bucketed,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bucketed
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n_box, qty_box, min_price, max_price,
           n_salted, qty_salted, n_bucketed, qty_bucketed
    FROM zbox
    JOIN salted USING (l_returnflag)
    JOIN src USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def io04_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the physical-layout family (§2.10 extras —
    VERDICT r6 #5: `operators/layout.py` was the last pytest-only
    family): the s18 recipe applied to LAYOUT — every leg rewrites or
    re-aggregates the same rows, so the hash proves each layout op is
    layout-only, while the plan-level claims (footer-stat pruning,
    Exchange-free bucket joins, salt spread) stay asserted in
    tests/test_layout.py.

    - **Z-order write** (`layout.write_zordered`, uniform binning —
      min/max binning + bit-interleave + ONE range shuffle): the
      lineitem projection is written Z-clustered on
      (l_partkey, l_suppkey) to a handshake path; the oracle
      `read_parquet`s THE SAME FILES, so the hash certifies the
      clustered rewrite preserved every row and value bit-exactly.
      Both engines then apply the box predicate the Z-curve exists to
      serve (partkey×suppkey box) and aggregate per return flag.
    - **Salting** (`layout.salted_group_count`): the same box
      aggregate computed through the two-phase salted plan; the
      oracle computes it as a PLAIN group-by, so the hash certifies
      salted == plain cross-engine (the operator's whole contract).
    - **Bucketed table** (`layout.write_bucketed`): the projection is
      persisted as a managed table bucketed by l_partkey and
      re-aggregated from the TABLE READ-BACK; the oracle aggregates
      the original lineitem parquet, so the hash certifies the
      bucketed write is content-preserving end-to-end.

    Exactness discipline: counts and BIGINT-cast quantity sums
    (l_quantity is integral-valued; integer sums are exact and
    order-independent), min/max on doubles (bit-picks, no
    accumulation) — no float-order exposure anywhere (NOTES.md).
    Scale shape: one range exchange for the Z-write, bucketed write
    shuffles once into 8 buckets, aggregates are partial+final; the
    box scan under the Z-layout is the pruned path (file/row-group
    skipping via footer stats, measured in SCALE.md)."""
    from ..operators.layout import salted_group_count, write_bucketed, write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )
    # The Z-ordered rewrite ({_IO04_Z} parquet) and the bucketed table
    # (spark-warehouse managed table) are independent jobs over the
    # same read-only projection writing DISJOINT artifacts — overlap
    # them (round 14, guide §2.6); the box/bucket read-backs below are
    # the join point needing both.
    from ..operators.util import run_overlapped

    run_overlapped(
        lambda: write_zordered(
            li, _IO04_Z, zorder_cols=["l_partkey", "l_suppkey"], bits=6,
            n_files=8,
        ),
        lambda: write_bucketed(li, "io04_bucketed", ["l_partkey"], n_buckets=8),
    )

    box = spark.read.parquet(_IO04_Z).filter(
        F.col("l_partkey").between(1, 50) & F.col("l_suppkey").between(1, 5)
    )
    zbox = box.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_box"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_box"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    salted = salted_group_count(
        box.withColumn("qty", F.col("l_quantity").cast("long")),
        "l_returnflag",
        n_salts=16,
        agg_col="qty",
    ).select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_salted"),
        F.col("sum_qty").cast("long").alias("qty_salted"),
    )
    bucketed = (
        spark.table("io04_bucketed")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bucketed"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_bucketed"),
        )
    )
    return (
        zbox.join(salted, "l_returnflag")
        .join(bucketed, "l_returnflag")
        .orderBy("l_returnflag")
    )
