"""LangCatalog tests: lookup, miss, conflict resolution, null catalog."""

import pytest
import pyspark.sql.functions as F

from sonic_etl_spark.functions.catalog import (
    ConflictingSpec,
    LangCatalog,
    LangSpec,
    NullCatalog,
)


def test_add_identical_noop_and_conflict_raises():
    cat = LangCatalog()
    cat.add(LangSpec("py", "#"))  # identical re-add → no-op
    with pytest.raises(ConflictingSpec):
        cat.add(LangSpec("py", "//"))


def test_marker_lookup_and_miss(spark):
    cat = LangCatalog()
    df = spark.createDataFrame(
        [("py",), ("sql",), ("brainfuck",)], "lang string"
    )
    out = {
        r["lang"]: r["m"]
        for r in df.select(
            "lang", cat.comment_marker_col(F.col("lang")).alias("m")
        ).collect()
    }
    assert out == {"py": "#", "sql": "--", "brainfuck": None}


def test_count_comment_lines(spark):
    cat = LangCatalog()
    df = spark.createDataFrame(
        [(1, "py", "# a b # c"), (2, "xx", "# a")],
        "doc_id bigint, lang string, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            cat.count_comment_lines(F.col("text"), F.col("lang")).alias("n"),
        ).collect()
    }
    assert out[1] == 2
    assert out[2] is None  # catalog miss → NULL, not 0


def test_null_catalog_always_misses(spark):
    cat = NullCatalog()
    df = spark.createDataFrame([("py",)], "lang string")
    assert (
        df.select(cat.comment_marker_col(F.col("lang")).alias("m")).first()["m"]
        is None
    )
