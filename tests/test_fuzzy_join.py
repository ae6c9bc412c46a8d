"""Unit tests for the blocked approximate-string-match join
(`operators.joins.fuzzy_join`) — the entity-resolution semantics
behind j03_fuzzy_name_match (whose value parity vs DuckDB's
levenshtein is covered by the oracle sweep)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.joins import fuzzy_join


def _frames(spark):
    dirty = spark.createDataFrame(
        [
            (1, "acme corp"),      # 1 edit from master 10
            (2, "acme c0rp"),      # 1 edit from master 10
            (3, "zenith corp"),    # same block as 10/12, far from both
            (4, "bolt inc"),       # 2 subs from master 11
        ],
        ["dirty_id", "dirty_name"],
    )
    master = spark.createDataFrame(
        [
            (10, "acme corp."),
            (11, "bolt llc"),
            (12, "acmex corp"),
        ],
        ["master_id", "master_name"],
    )
    return dirty, master


def _match(spark, max_dist=2):
    dirty, master = _frames(spark)
    first_tok = lambda c: F.split(F.col(c), " ")[0]  # noqa: E731
    return fuzzy_join(
        dirty,
        master,
        "dirty_name",
        "master_name",
        block_left=first_tok("dirty_name"),
        block_right=first_tok("master_name"),
        max_dist=max_dist,
    )


def test_matches_within_distance_inside_block(spark):
    rows = {(r.dirty_id, r.master_id, r.edit_dist) for r in _match(spark).collect()}
    # "acme corp"  -> "acme corp." (1 insert), "acmex corp" blocked out
    #   (block key "acme" != "acmex")
    # "acme c0rp"  -> "acme corp." (1 sub + 1 insert = 2)
    # "zenith corp" matches nothing (no "zenith" block in master)
    # "bolt inc"   -> "bolt llc" ("inc" -> "llc" = 2 subs)
    assert rows == {(1, 10, 1), (2, 10, 2), (4, 11, 2)}


def test_blocking_bounds_recall_by_design(spark):
    # "acmex corp" is distance 1 from "acme corp" but lives in block
    # "acmex": the documented single-pass blocking miss.
    rows = _match(spark, max_dist=2)
    assert rows.filter(F.col("master_id") == 12).count() == 0


def test_tighter_threshold_prunes(spark):
    rows = {(r.dirty_id, r.master_id) for r in _match(spark, max_dist=1).collect()}
    assert rows == {(1, 10)}


def test_distance_column_is_exact_not_flag(spark):
    got = {r.dirty_id: r.edit_dist for r in _match(spark).collect()}
    assert got == {1: 1, 2: 2, 4: 2}


def test_self_join_same_base_frame(spark):
    # left and right derived from ONE scan (the j03 shape): the join
    # condition must not trip Spark's ambiguous-self-join detection.
    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha betz"), (3, "gamma beta")],
        ["id", "name"],
    )
    left = base.select(F.col("id").alias("lid"), F.col("name").alias("lname"))
    right = base.select(F.col("id").alias("rid"), F.col("name").alias("rname"))
    last_tok = lambda c: F.element_at(F.split(F.col(c), " "), -1)  # noqa: E731
    pairs = fuzzy_join(
        left, right, "lname", "rname",
        block_left=last_tok("lname"), block_right=last_tok("rname"),
        max_dist=1,
    )
    got = {(r.lid, r.rid) for r in pairs.collect()}
    # within block "beta": (1,1) d0, (1,3)/(3,1) d5 -> out; (3,3) d0;
    # 2 is in block "betz" alone -> only its self pair survives.
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_identical_col_names_rejected(spark):
    dirty, master = _frames(spark)
    with pytest.raises(ValueError):
        fuzzy_join(
            dirty, master.withColumnRenamed("master_name", "dirty_name"),
            "dirty_name", "dirty_name", "dirty_name", "dirty_name",
        )


def test_plan_is_hash_join_not_nested_loop(spark):
    """The blocking key must plan as an equi (hash/sort-merge) join —
    never BroadcastNestedLoop/Cartesian."""
    plan = _match(spark)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_multipass_blocking_recovers_single_pass_misses(spark):
    from mergers_acquisitions_predictions_spark.operators.joins import (
        fuzzy_join_multipass,
    )

    dirty, master = _frames(spark)
    first_tok = lambda c: F.split(F.col(c), " ")[0]  # noqa: E731
    last_tok = lambda c: F.element_at(F.split(F.col(c), " "), -1)  # noqa: E731
    passes = [
        (first_tok("dirty_name"), first_tok("master_name")),
        (last_tok("dirty_name"), last_tok("master_name")),
    ]
    rows = {
        (r.dirty_id, r.master_id)
        for r in fuzzy_join_multipass(
            dirty, master, "dirty_name", "master_name", passes, max_dist=2
        ).collect()
    }
    # single-pass (first-token) result plus the pass-2 recovery:
    # "acme corp" vs master 12 "acmex corp" (distance 1) shares the
    # LAST token block even though first tokens differ.
    assert (1, 12) in rows
    assert rows >= {(1, 10), (2, 10), (4, 11)}
    # no duplicate pair rows from overlapping passes
    df = fuzzy_join_multipass(
        dirty, master, "dirty_name", "master_name", passes, max_dist=2
    )
    assert df.count() == df.dropDuplicates(["dirty_id", "master_id"]).count()


def test_multipass_requires_a_pass(spark):
    dirty, master = _frames(spark)
    from mergers_acquisitions_predictions_spark.operators.joins import (
        fuzzy_join_multipass,
    )

    with pytest.raises(ValueError):
        fuzzy_join_multipass(dirty, master, "dirty_name", "master_name", [])
