"""KStem (analysis/kstem.py): full parity vs the reference's own
kstemTestData.zip vector archive, the KStemmer.java edge contracts, and
the Analyzer.english(stemmer="kstem") preset end-to-end."""

import os
import zipfile

import pytest

from lucene_spark.analysis import Analyzer
from lucene_spark.analysis.kstem import kstem_stem

_KSTEM_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/kstemTestData.zip"
)


@pytest.mark.skipif(not os.path.exists(_KSTEM_ZIP), reason="reference vectors absent")
def test_kstem_full_vector_parity():
    """Replay ALL 12,130 (word, stem) pairs the reference generated from
    the original java kstemmer (TestKStemmer.testVocabulary) — exact."""
    with zipfile.ZipFile(_KSTEM_ZIP) as z:
        lines = z.read("kstem_examples.txt").decode().splitlines()
    pairs = [ln.split("\t") for ln in lines if ln.strip()]
    assert len(pairs) > 12000
    bad = [(w, exp, kstem_stem(w)) for w, exp in pairs if kstem_stem(w) != exp]
    assert bad == [], bad[:20]


def test_kstem_edge_contracts():
    # KStemmer.stem(): <=2-letter and >=50-letter words pass through
    assert kstem_stem("go") == "go"
    assert kstem_stem("a" * 50) == "a" * 50
    # non-alphabetic tokens pass through (terms must be pre-lowercased;
    # uppercase is "non-alpha" by the isAlpha a-z contract)
    assert kstem_stem("abc123") == "abc123"
    assert kstem_stem("Tables") == "Tables"
    # dictionary head words are their own stem
    assert kstem_stem("abandoned") == "abandoned"
    assert kstem_stem("aging") == "age"          # direct conflation
    assert kstem_stem("italians") == "italy"     # plural -> nationality -> country
    assert kstem_stem("aides") == "aide"         # exception word blocks -e removal
    assert kstem_stem("backfilled") == "backfill"  # doubled-consonant -ed
    assert kstem_stem("amplification") == "amplify"  # -ication -> -y
    assert kstem_stem("immunity") == "immune"    # -ity -> -e via dictionary


def test_kstem_vs_porter_divergence():
    """The motivating difference: KStem returns dictionary words, Porter
    returns truncated stems."""
    from lucene_spark.analysis import porter_stem

    assert kstem_stem("queries") == "query" and porter_stem("queries") == "queri"
    assert kstem_stem("tables") == "table" and porter_stem("tables") == "tabl"


def test_english_kstem_preset_chain():
    an = Analyzer.english(stemmer="kstem")
    assert an.stemmer == "kstem" and an.possessive
    # possessive strips 's, "the" leaves a hole, kstem gives whole words
    assert an.analyze_query("the spark's queries") == ["spark", "query"]
    assert an.analyze_query_positions("the spark's queries") == [
        ("spark", 1), ("query", 2),
    ]
    assert Analyzer.from_json(an.to_json()) == an
    with pytest.raises(ValueError):
        Analyzer.english(stemmer="lovins")


def test_english_kstem_end_to_end(spark):
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import IndexSearcher, TermQuery

    rows = [
        ("c0", 0, "u", None, None, "the model's tables are joining"),
        ("c0", 1, "u", None, None, "no relevant words here"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    idx = IndexBuilder(
        num_segments=2, analyzer=Analyzer.english(stemmer="kstem")
    ).build(df)
    s = IndexSearcher(idx)
    # "tables" indexes as kstem("tables") = "table" (not porter's "tabl")
    for qtext, want_term in (("model", "model"), ("tables", "table")):
        (term,) = s.parse_terms(qtext)
        assert term == want_term
        hits = s.search(TermQuery(term), 5).collect()
        assert [(r.conv_id, r.turn_idx) for r in hits] == [("c0", 0)], qtext
    idx.unpersist_all()
