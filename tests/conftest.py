import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("lucene_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from lucene_spark.fixtures import generate_transcripts

    return generate_transcripts(n_convs=20, seed=1337)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus):
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder

    df = transcripts_df(spark, rows=tiny_corpus)
    return IndexBuilder(num_segments=4).build(df)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from lucene_spark.oracle import OracleIndex

    return OracleIndex.build(tiny_corpus)
