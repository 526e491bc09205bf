"""S5/S8: quoted-CSV source and sink round-trip, parquet stage sink."""

from __future__ import annotations

from textcleaning_spark.sources import registry


def test_csv_roundtrip_quoted(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 'plain text', "en"),
            (2, 'has\ttab and "quotes"', "de"),
            (3, "comma, separated", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "csv_out")
    registry.write_csv(df, path)
    back = registry.read_csv(spark, path)
    assert back.columns == df.columns
    # inferSchema picks the narrowest integer type — compare values
    back = back.withColumn("doc_id", back.doc_id.cast("long"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_partitioned_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"d{i}", ["en", "de"][i % 2]) for i in range(20)],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "pq_out")
    registry.write_parquet(df, path, partition_by=["lang"])
    back = spark.read.parquet(path)
    assert back.count() == 20
    # partition pruning: a lang filter reads only one directory
    plan = back.filter("lang = 'en'")._jdf.queryExecution().executedPlan().toString()
    assert "lang=en" in plan or back.filter("lang = 'en'").count() == 10
