"""S4 JDBC source exercised LIVE against Apache Derby (embedded JDBC
engine shipped on Spark's own classpath) — a real partitioned parallel
read, not a signature-level stub.

The reference's S4 is a single-stream psycopg2 fetchall
(utils.py:278-295); the engine's contract is a numeric-bounded
partitioned read so the scan parallelizes across executors.
"""

from __future__ import annotations

import pytest

from textcleaning_spark.sources.registry import read_jdbc

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    # keep derby.log out of the repo root
    spark._jvm.System.setProperty(
        "derby.stream.error.file", str(tmp_path_factory.mktemp("derby") / "derby.log")
    )
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    src = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "concat('text-', id) AS body", "id % 7 AS grp"
    )
    src.write.format("jdbc").option("url", url).option("dbtable", "docs").mode(
        "overwrite"
    ).save()
    return url


def test_jdbc_partitioned_read_parallelism(spark, derby_url):
    """numPartitions-way read: Spark must open 4 bounded range scans
    (observable as 4 RDD partitions), and the union of the stripes must
    be the exact table."""
    df = read_jdbc(
        spark,
        derby_url,
        "docs",
        partition_column="doc_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 1000
    got = {(r["doc_id"], r["body"]) for r in rows}
    assert (0, "text-0") in got and (999, "text-999") in got
    # every stripe non-empty: bounds split 0..1000 into 4 × 250-row ranges
    sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sorted(sizes) == [250, 250, 250, 250]


def test_jdbc_unpartitioned_single_stream(spark, derby_url):
    """Without bounds the read is one stream — the documented driver
    bottleneck the partitioned form exists to avoid."""
    df = read_jdbc(spark, derby_url, "docs")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 1000


def test_jdbc_predicate_pushdown(spark, derby_url):
    """Filters push into the remote query (PushedFilters in the scan)."""
    df = read_jdbc(
        spark,
        derby_url,
        "docs",
        partition_column="doc_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    ).filter("grp = 3")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan.lower()
    assert df.count() == sum(1 for i in range(1000) if i % 7 == 3)
