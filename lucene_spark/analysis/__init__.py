from lucene_spark.analysis.tokenizer import (  # noqa: F401
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
    tokenize_text,
    tokens_expr,
)
from lucene_spark.analysis.analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    Analyzer,
    s_stem,
    s_stem_sql,
)
from lucene_spark.analysis.porter import porter_stem  # noqa: F401
