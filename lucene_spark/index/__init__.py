from lucene_spark.index.builder import IndexBuilder, InvertedIndex  # noqa: F401
