"""Plan-shape checks for the TPC-H classics added for star-schema breadth:
dims broadcast, thresholds/aggregates stay JVM-side, and nothing funnels
through an unpartitioned window or a SinglePartition exchange (the 100 TB
killers). Value correctness is covered by the DuckDB oracle twins."""

from __future__ import annotations

from my_crawler_spark.entry_queries import (
    q_tpch_q8,
    q_tpch_q13_shape,
    q_tpch_q15,
    q_tpch_q17_shape,
    q_tpch_q18,
    q_tpch_q19_shape,
    q_tpch_q22_shape,
    q_tpch_q2_shape,
    q_tpch_q9_shape,
    q_tpch_q11_shape,
    q_tpch_q16_shape,
    q_tpch_q20_shape,
    q_tpch_q21_shape,
)

SF = "/root/testdata/sf0.001"


def explain_str(df) -> str:
    from io import StringIO
    import contextlib

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q8_dims_broadcast_and_jvm_side(spark):
    plan = explain_str(q_tpch_q8(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q15_max_is_broadcast_not_window(spark):
    """The max-revenue filter must be a 1-row broadcast join back onto the
    per-supplier agg — a global window here would single-task the fleet."""
    plan = explain_str(q_tpch_q15(spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q17_threshold_join_broadcasts_stats(spark):
    plan = explain_str(q_tpch_q17_shape(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q18_has_no_single_partition_exchange(spark):
    """HAVING runs as a partial-aggregated groupBy; the top-100 is
    TakeOrdered, never an Exchange SinglePartition over the fact."""
    plan = explain_str(q_tpch_q18(spark, SF))
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_or_of_ands_stays_jvm(spark):
    plan = explain_str(q_tpch_q19_shape(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_shape(spark):
    plan = explain_str(q_tpch_q22_shape(spark, SF))
    assert "LeftAnti" in plan
    assert "Window" not in plan


def test_q2_min_is_broadcast_not_window(spark):
    """The per-part minimum-cost filter must be an agg broadcast back onto
    the candidate relation, never a window over the derived part-supplier
    pairs."""
    plan = explain_str(q_tpch_q2_shape(spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_q11_global_fraction_is_one_row_broadcast(spark):
    """The 0.1%-of-global threshold joins a 1-row aggregate via broadcast
    nested loop; the integer compare keeps it off the float boundary."""
    plan = explain_str(q_tpch_q11_shape(spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q16_exclusion_is_left_anti(spark):
    plan = explain_str(q_tpch_q16_shape(spark, SF))
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q20_exists_chain_is_semi_joins(spark):
    plan = explain_str(q_tpch_q20_shape(spark, SF))
    assert "LeftSemi" in plan
    assert "Window" not in plan


def test_q21_no_correlated_probes(spark):
    """The EXISTS/NOT-EXISTS pair must compile to per-order aggregates +
    joins — no window, no Python, no SinglePartition funnel."""
    plan = explain_str(q_tpch_q21_shape(spark, SF))
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_new_tpch_entries_execute(spark):
    """Smoke at sf0.001: every new entry runs and yields a stable schema.
    (Hash-level correctness is the driver's DuckDB twin at sf0.01.)"""
    for fn, min_rows in [
        (q_tpch_q8, 1),
        (q_tpch_q13_shape, 1),
        (q_tpch_q15, 1),
        (q_tpch_q17_shape, 1),
        (q_tpch_q18, 0),
        (q_tpch_q19_shape, 1),
        (q_tpch_q22_shape, 0),
        (q_tpch_q2_shape, 1),
        (q_tpch_q9_shape, 1),
        (q_tpch_q11_shape, 1),
        (q_tpch_q16_shape, 1),
        (q_tpch_q20_shape, 0),
        (q_tpch_q21_shape, 0),
    ]:
        rows = fn(spark, SF).collect()
        assert len(rows) >= min_rows, fn.__name__
