from lucene_spark.fixtures.transcripts import (  # noqa: F401
    generate_transcripts,
    reference_queries,
    transcripts_df,
)
