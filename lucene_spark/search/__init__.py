from lucene_spark.search.query import (  # noqa: F401
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    CombinedFieldQuery,
    ConstantScoreQuery,
    CoveringQuery,
    DisjunctionMaxQuery,
    FunctionRangeQuery,
    FunctionScoreQuery,
    FuzzyLikeThisQuery,
    FuzzyQuery,
    KnnVectorQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PayloadScoreQuery,
    PhraseQuery,
    PhraseWildcardQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    Sort,
    SortField,
    SpanPayloadCheckQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.searcher import IndexSearcher  # noqa: F401
from lucene_spark.search.parser import QueryParser, QueryParseError  # noqa: F401
from lucene_spark.search.surround import (  # noqa: F401
    SurroundParseError,
    SurroundQueryParser,
    TooManyBasicQueries,
)
from lucene_spark.search.complexphrase import (  # noqa: F401
    ComplexPhraseQueryParser,
)
from lucene_spark.search.xmlparser import (  # noqa: F401
    CoreParser,
    ParserException,
)
from lucene_spark.search.flexible import StandardQueryParser  # noqa: F401
from lucene_spark.search.termautomaton import TermAutomatonQuery  # noqa: F401
