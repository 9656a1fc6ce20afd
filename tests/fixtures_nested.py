"""Regenerated nested fixtures per FIXTURES.md (shapes the reference's e2e
suite runs against; data re-authored from the documented shapes, not copied).

Written once per test session into a tmp dir:
  sample.parquet          — FIXTURES.md §1 shape, 2 rows
  sample.json             — same shape, multiline JSON array
  crazy.json              — §2 shape (deeper nesting), multiline JSON array
  partitioned.parquet/    — §4 Hive-style layout, partition col someLong
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession, types as T

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("someStr", T.StringType()),
        T.StructField("someLong", T.LongType()),
        T.StructField("someDouble", T.DoubleType()),
        T.StructField("someBoolean", T.BooleanType()),
        T.StructField("someStrArray", T.ArrayType(T.StringType())),
        T.StructField(
            "someComplexArray",
            T.ArrayType(
                T.StructType([T.StructField("col1", T.LongType()), T.StructField("col2", T.LongType())])
            ),
        ),
        T.StructField(
            "struct",
            T.StructType(
                [
                    T.StructField("col1", T.LongType()),
                    T.StructField("col2", T.LongType()),
                    T.StructField("col3", T.LongType()),
                    T.StructField("subArray", T.ArrayType(T.LongType())),
                ]
            ),
        ),
        T.StructField(
            "nestedStruct",
            T.StructType(
                [
                    T.StructField(
                        "childStruct",
                        T.StructType([T.StructField("col1", T.LongType()), T.StructField("col2", T.LongType())]),
                    ),
                    T.StructField("str", T.StringType()),
                ]
            ),
        ),
        T.StructField("someArrayOfArrays", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField(
            "someArrayOfComplexArrays",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("col1", T.LongType()),
                        T.StructField("col2", T.ArrayType(T.LongType())),
                        T.StructField("col3", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def _sample_rows() -> list[dict]:
    def row(long_val: int, s: str) -> dict:
        return {
            "someStr": s,
            "someLong": long_val,  # keep > 2^31 so long inference stays stable
            "someDouble": 0.1,
            "someBoolean": True,
            "someStrArray": ["a", "b", "c"],
            "someComplexArray": [{"col1": 1, "col2": 2}, {"col1": 3, "col2": 4}],
            "struct": {"col1": 1, "col2": 2, "col3": 3, "subArray": [1, 2, 3]},
            "nestedStruct": {"childStruct": {"col1": 10, "col2": 20}, "str": "ns"},
            "someArrayOfArrays": [[0, 1, 2], [4, 5, 6]],
            "someArrayOfComplexArrays": [{"col1": 1, "col2": [7, 8], "col3": 9}],
        }

    return [row(12345678987654321, "bla"), row(654646321654987, "blu")]


CRAZY_MAP_SCHEMA = T.StructType(
    [
        T.StructField("someStr", T.StringType()),
        T.StructField(
            "mapOfArray",
            T.MapType(
                T.StringType(),
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("val1", T.StringType()),
                            T.StructField("val2", T.StringType()),
                            T.StructField("val3", T.LongType()),
                            T.StructField("val4", T.StringType()),
                        ]
                    )
                ),
            ),
        ),
        T.StructField(
            "crazyStruct",
            T.StructType(
                [
                    T.StructField("justAString", T.StringType()),
                    T.StructField(
                        "repeatedStuff",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("justABool", T.BooleanType()),
                                    T.StructField("longArray", T.ArrayType(T.LongType())),
                                    T.StructField(
                                        "anotherRepeatedStuff",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("innerField1", T.StringType()),
                                                    T.StructField("innerField2", T.StringType()),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _crazy_rows() -> list[dict]:
    return [
        {
            "someStr": "crazy",
            "mapOfArray": {
                "someKey": [{"val1": "a", "val2": "b", "val3": 3, "val4": "d"}],
                "otherKey": [{"val1": "e", "val2": "f", "val3": 6, "val4": "h"}],
            },
            "crazyStruct": {
                "justAString": "js",
                "repeatedStuff": [
                    {
                        "justABool": True,
                        "longArray": [1, 2],
                        "anotherRepeatedStuff": [{"innerField1": "i1", "innerField2": "i2"}],
                    }
                ],
            },
        }
    ]


def write_fixtures(spark: SparkSession, base: str) -> dict[str, str]:
    paths = {
        "sample_parquet": os.path.join(base, "sample.parquet"),
        "sample_json": os.path.join(base, "sample.json"),
        "crazy_parquet": os.path.join(base, "crazy.parquet"),
        "partitioned": os.path.join(base, "partitioned.parquet"),
    }
    rows = _sample_rows()
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(paths["sample_parquet"])
    with open(paths["sample_json"], "w") as f:
        json.dump(rows, f, indent=1)
    spark.createDataFrame(_crazy_rows(), CRAZY_MAP_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        paths["crazy_parquet"]
    )
    df.write.mode("overwrite").partitionBy("someLong").parquet(paths["partitioned"])
    return paths


def prune_fuzz_rows() -> list[dict]:
    """Nulls-and-empties-rich SAMPLE_SCHEMA rows for the prune fuzz — ONE
    definition shared by the in-suite fixtures (tests/test_properties.py)
    and the offline hunt (tools/fuzz_hunt.py), so the two input spaces
    cannot drift (review r9)."""
    full = {
        "someStr": "bla", "someLong": 12345678987654321, "someDouble": 0.5,
        "someBoolean": True, "someStrArray": ["a", "b"],
        "someComplexArray": [{"col1": 1, "col2": 2}, {"col1": 3, "col2": 4}],
        "struct": {"col1": 1, "col2": 2, "col3": 3, "subArray": [1, 2]},
        "nestedStruct": {"childStruct": {"col1": 10, "col2": 20}, "str": "ns"},
        "someArrayOfArrays": [[0, 1], [4]],
        "someArrayOfComplexArrays": [{"col1": 1, "col2": [7], "col3": 9}],
    }
    return [
        full,
        {**full, "someStr": None,
         "struct": {"col1": None, "col2": 5, "col3": None, "subArray": None}},
        {**full, "someLong": -1, "nestedStruct": None, "someComplexArray": []},
        {**full, "someBoolean": False, "someStrArray": [], "someArrayOfArrays": None,
         "someComplexArray": None, "someArrayOfComplexArrays": []},
        dict(full),  # exact duplicate
        {**full, "someDouble": None, "someStr": "blu",
         "someComplexArray": [{"col1": None, "col2": 6}]},
    ]


def crazy_fuzz_rows() -> list[dict]:
    """CRAZY_MAP_SCHEMA rows with an absent map key, empty repeatedStuff,
    and NULL branches — shared like prune_fuzz_rows()."""
    full = _crazy_rows()[0]
    return [
        full,
        {**full, "someStr": "nokey",
         "mapOfArray": {"thirdKey": [{"val1": "x", "val2": None, "val3": None, "val4": "y"}]}},
        {**full, "someStr": "empty",
         "crazyStruct": {"justAString": None, "repeatedStuff": []}},
        {**full, "someStr": None, "mapOfArray": None, "crazyStruct": None},
        dict(full),
    ]
