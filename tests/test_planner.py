"""Batch-planner contract (S2 chunking, publish_ranges.py:122-146; resumption
ST2; range-predicate pushdown)."""

from sonic_etl_spark.plans.planner import chunk_range, filter_to_manifests, plan_batches


def test_chunk_range_contract():
    assert list(chunk_range(0, 2499, 1000)) == [(0, 999), (1000, 1999), (2000, 2499)]
    assert list(chunk_range(5, 5, 1000)) == [(5, 5)]
    assert list(chunk_range(10, 9, 1000)) == []  # empty interval
    chunks = list(chunk_range(0, 10_000, 999))
    # disjoint, dense, inclusive cover
    assert chunks[0][0] == 0 and chunks[-1][1] == 10_000
    for (s1, e1), (s2, _e2) in zip(chunks, chunks[1:]):
        assert s2 == e1 + 1 and e1 - s1 + 1 <= 999


def test_plan_batches_resume():
    heads = {0: 2999, 1: 1999}
    committed = {(0, 0, 999), (1, 0, 999), (1, 1000, 1999)}
    batches = plan_batches(heads, committed, 1000)
    flat = [m for b in batches for m in b]
    # partition 0 resumes at 1000; partition 1 is fully committed
    assert flat == [(0, 1000, 1999), (0, 2000, 2999)]


def test_plan_batches_empty():
    assert plan_batches({}, set()) == []
    assert plan_batches({0: 99}, {(0, 0, 99)}) == []


def test_filter_pushdown(spark):
    df = spark.range(1000).selectExpr(
        "cast(id % 4 as int) partition_id", "cast(id / 4 as long) offset"
    )
    got = filter_to_manifests(df, [(0, 0, 9), (1, 5, 9)])
    assert got.count() == 15
    # the predicate must reach the scan, not sit in a Python filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan


def test_filter_no_manifests_is_empty(spark):
    df = spark.range(10).selectExpr("cast(0 as int) partition_id", "id offset")
    assert filter_to_manifests(df, []).count() == 0
