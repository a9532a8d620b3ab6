from lucene_spark.oracle.oracle import OracleIndex  # noqa: F401
