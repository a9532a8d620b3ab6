"""BrazilianStemmer parity: replays EVERY check()/checkReuse() vector in
the reference's own ``analysis/common/.../br/TestBrazilianAnalyzer.java``
through the full Analyzer.brazilian() chain."""

import re

from lucene_spark.analysis import Analyzer
from lucene_spark.analysis.brazilian import brazilian_stem

_REF = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/br/TestBrazilianAnalyzer.java"
)


def _vectors():
    text = open(_REF, encoding="utf-8").read()
    # everything before testStemExclusionTable (whose checkReuse pins the
    # keyword-marker exclusion behavior, not the stemmer)
    text = text.split("testStemExclusionTable")[0]
    pat = re.compile(r'check(?:Reuse\(\s*\w+,|\()\s*"([^"]+)"\s*,\s*"([^"]+)"\)')
    return pat.findall(text)


def test_reference_vectors_replay():
    vectors = _vectors()
    assert len(vectors) >= 80
    an = Analyzer.brazilian()
    for inp, want in vectors:
        got = an.analyze_query(inp)
        assert got == [want], f"{inp!r}: {got} != [{want!r}]"


def test_stop_before_stem_and_null_stem():
    an = Analyzer.brazilian()
    # stopword dropped before stemming
    assert an.analyze_query("a tabela") == ["tabel"]
    # isIndexable bounds: <= 2 chars or >= 30 chars pass through untouched
    assert brazilian_stem("ab") == "ab"
    assert brazilian_stem("x" * 31) == "x" * 31
    # non-letter terms return the changed term (lowercased/deaccented)
    assert brazilian_stem("ab3") == "ab3"


def test_quirks_preserved():
    # step2's first 'ira' entry removes the suffix 'ava'
    # (BrazilianStemmer.java:942-945) — CT ends in 'ira' so nothing is
    # removed, yet the word counts as altered (skipping step4): the
    # reference's own behavior, preserved verbatim
    assert brazilian_stem("mexira") == "mexira"
