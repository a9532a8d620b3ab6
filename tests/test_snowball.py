"""Snowball stemmer parity: every translated program replays the full
vector archive produced by the REFERENCE'S OWN compiled stemmer
(scripts/dev/gen_snowball_vectors.py — org.tartarus.snowball compiled
with javac, rule-covering vocabulary: every among string alone, on
random stems, in chains, plus 20k random alphabet words per language).
Exact string parity, same bar as the shipped fr/de/es/... archives the
light-stemmer waves replay."""

import gzip
import os

import pytest

from lucene_spark.analysis.snowball import (
    SNOWBALL_LANGUAGES,
    stem_fn,
    stemmer_class,
)
from lucene_spark.analysis.snowball.runtime import make_stem_fn

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_spark",
    "analysis",
    "data",
)

ARCHIVES = {
    "danish": "da",
    "dutch": "nl",
    "romanian": "ro",
    "catalan": "ca",
    "lithuanian": "lt",
    "irish": "ga",
    "armenian": "hy",
    "basque": "eu",
    "nepali": "ne",
    "estonian": "et",
    "tamil": "ta",
    "turkish": "tr",
    "serbian": "sr",
    "english": "en2",
}


def _pairs(code):
    path = os.path.join(DATA, f"snowball_{code}.tsv.gz")
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for ln in f:
            w, _, s = ln.rstrip("\n").partition("\t")
            yield w, s


@pytest.mark.parametrize("lang", sorted(ARCHIVES))
def test_archive_parity(lang):
    f = make_stem_fn(stemmer_class(lang))
    n = 0
    for w, expected in _pairs(ARCHIVES[lang]):
        got = f(w)
        assert got == expected, f"{lang}: {w!r} -> {got!r}, reference {expected!r}"
        n += 1
    assert n > 20000, f"{lang}: archive unexpectedly small ({n})"


def test_known_vectors():
    """Spot vectors from the reference's analyzer tests
    (TestDanishAnalyzer.java:31, TestDutchAnalyzer.java:54-60,
    TestCatalanAnalyzer.java:31, TestRomanianAnalyzer.java:31,
    TestBasqueAnalyzer.java:31, TestArmenianAnalyzer.java:31,
    TestIrishAnalyzer.java:31, TestLithuanianStemming.java,
    TestEstonianAnalyzer.java:36, TestTurkishAnalyzer.java:32)."""
    cases = {
        "danish": [("undersøgelse", "undersøg"), ("undersøg", "undersøg")],
        "dutch": [
            ("lichamelijk", "licham"),
            ("lichamelijke", "licham"),
            ("lichamelijkheden", "licham"),
            ("lichamen", "licham"),
            ("lichame", "licham"),
        ],
        "catalan": [("llengües", "llengu"), ("llengua", "llengu")],
        # Snowball 2.x Romanian folds cedilla ţ/ş to comma-below ț/ș
        # internally (r_norm), matching TestRomanianAnalyzer.java:34-37
        "romanian": [("absența", "absenț"), ("absenți", "absenț"), ("absenţ", "absenț")],
        "basque": [("zaldiak", "zaldi"), ("mendiari", "mendi"), ("zaldi", "zaldi")],
        "armenian": [("արծիվ", "արծ"), ("արծիվներ", "արծ")],
        "irish": [("siopadóireacht", "siopadóir"), ("síceapatacha", "síceapaite")],
        "lithuanian": [("vaikų", "vaik"), ("vaikas", "vaik"), ("vaikais", "vaik")],
        "estonian": [("teadaolevalt", "teadaole"), ("teadaoleva", "teadaole")],
        "turkish": [("ağacı", "ağaç"), ("ağaç", "ağaç")],
        "english": [("consistency", "consist"), ("flies", "fli")],
    }
    for lang, pairs in cases.items():
        f = stem_fn(lang)
        for w, expected in pairs:
            assert f(w) == expected, (lang, w, f(w), expected)
