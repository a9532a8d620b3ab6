"""Round-5 international stemmers (analysis/intl.py, analysis/greek.py):
parity against the reference's OWN test vectors, parsed straight out of
its Test*.java files / vocabulary text files (same replay treatment as
the zip-archive stemmers in test_lang_analyzers.py)."""

import os
import re

import pytest

from lucene_spark.analysis.intl import (
    arabic_normalize,
    arabic_normalize_and_stem,
    arabic_stem,
    bengali_normalize,
    bengali_normalize_and_stem,
    bengali_stem,
    bulgarian_stem,
    czech_stem,
    hindi_normalize,
    hindi_normalize_and_stem,
    hindi_stem,
    telugu_normalize,
    telugu_normalize_and_stem,
    telugu_stem,
    indonesian_stem,
    latvian_stem,
    norwegian_light_stem,
    norwegian_light_stem_nn,
    norwegian_minimal_stem,
    norwegian_minimal_stem_nn,
    persian_normalize,
    persian_stem,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

# checkOneTerm(a, "word", "stem") / check("word", "stem") /
# assertAnalyzesTo(cz, "word", new String[] {"stem"})
_PAIR_RES = (
    re.compile(r'checkOneTerm\(\s*(\w+)\s*,\s*"([^"]*)"\s*,\s*"([^"]*)"\s*\)'),
    re.compile(r'\bcheck\(\s*"([^"]*)"\s*,\s*"([^"]*)"\s*\)'),
    re.compile(r'assertAnalyzesTo\(\s*(\w+)\s*,\s*"([^"]*)"\s*,'
               r'\s*new String\[\]\s*\{"([^"]*)"\}\s*\)'),
)


def _java_vectors(rel: str, analyzer_var: str | None = None):
    """(word, expected) pairs from a reference test file, cut BEFORE the
    keyword-marker / empty-term sections (those pin filter plumbing, not
    the stemmer)."""
    path = os.path.join(_REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference vectors absent")
    src = open(path, encoding="utf-8").read()
    for marker in ("testKeyword", "testWithKeywordAttribute", "testEmptyTerm"):
        cut = src.find(marker)
        if cut != -1:
            src = src[:cut]
    # Java \\uXXXX escapes in string literals
    unesc = lambda s: re.sub(  # noqa: E731
        r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s
    )
    out = []
    for rx in _PAIR_RES:
        for m in rx.finditer(src):
            g = m.groups()
            if len(g) == 3:
                var, w, e = g
                if analyzer_var is not None and var != analyzer_var:
                    continue
            else:
                w, e = g
            # MockTokenizer(WHITESPACE) drops padding around the word
            out.append((unesc(w).strip(), unesc(e)))
    return out


@pytest.mark.parametrize(
    "fn,rel,var,minimum",
    [
        (arabic_normalize, "ar/TestArabicNormalizationFilter.java", None, 14),
        (arabic_stem, "ar/TestArabicStemFilter.java", None, 20),
        (persian_normalize, "fa/TestPersianNormalizationFilter.java", None, 6),
        # CzechAnalyzer lowercases before the stemmer
        (lambda w: czech_stem(w.lower()), "cz/TestCzechStemmer.java", None, 130),
        (bulgarian_stem, "bg/TestBulgarianStemmer.java", None, 90),
        (latvian_stem, "lv/TestLatvianStemmer.java", None, 150),
        (indonesian_stem, "id/TestIndonesianStemmer.java", "a", 40),
        (hindi_stem, "hi/TestHindiStemmer.java", None, 18),
        (hindi_normalize, "hi/TestHindiNormalizer.java", None, 12),
        (bengali_stem, "bn/TestBengaliStemmer.java", None, 14),
        (bengali_normalize, "bn/TestBengaliNormalizer.java", None, 12),
        (telugu_stem, "te/TestTeluguStemmer.java", None, 4),
        (telugu_normalize, "te/TestTeluguNormalizer.java", None, 4),
    ],
    ids=["ar_norm", "ar_stem", "fa_norm", "cs", "bg", "lv", "id_deriv",
         "hi_stem", "hi_norm", "bn_stem", "bn_norm", "te_stem", "te_norm"],
)
def test_java_vector_parity(fn, rel, var, minimum):
    pairs = _java_vectors(rel, var)
    assert len(pairs) >= minimum, f"parsed only {len(pairs)} vectors"
    bad = [(w, e, fn(w)) for w, e in pairs if fn(w) != e]
    assert bad == [], bad[:20]


def test_indonesian_inflectional_vectors():
    """TestIndonesianStemmer analyzer `b` = stemDerivational=false."""
    pairs = _java_vectors("id/TestIndonesianStemmer.java", "b")
    assert len(pairs) >= 4
    bad = [
        (w, e, indonesian_stem(w, derivational=False))
        for w, e in pairs
        if indonesian_stem(w, derivational=False) != e
    ]
    assert bad == [], bad[:20]


def test_persian_stem_vectors():
    """TestPersianStemFilter vectors (inputs pre-normalized by the chain;
    the lone "English" row exercises LowerCase, not the stemmer)."""
    pairs = _java_vectors("fa/TestPersianStemFilter.java")
    assert len(pairs) >= 8
    bad = [
        (w, e, persian_stem(persian_normalize(w.lower())))
        for w, e in pairs
        if persian_stem(persian_normalize(w.lower())) != e
    ]
    assert bad == [], bad[:20]


@pytest.mark.parametrize(
    "fn,vocab,count",
    [
        (norwegian_light_stem, "no/nb_light.txt", 130),
        (norwegian_light_stem_nn, "no/nn_light.txt", 100),
        (norwegian_minimal_stem, "no/nb_minimal.txt", 90),
        (norwegian_minimal_stem_nn, "no/nn_minimal.txt", 70),
    ],
    ids=["nb_light", "nn_light", "nb_minimal", "nn_minimal"],
)
def test_norwegian_vocabulary_files(fn, vocab, count):
    """The reference's own vocabulary files (BaseTokenStreamTestCase.
    assertVocabulary: word<TAB>stem per line, # comments)."""
    path = os.path.join(_REF, vocab)
    if not os.path.exists(path):
        pytest.skip("reference vectors absent")
    pairs = []
    for ln in open(path, encoding="utf-8"):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split("\t")
        if len(parts) == 2:
            pairs.append(parts)
    assert len(pairs) >= count - 60  # files carry comment headers
    bad = [(w, e, fn(w)) for w, e in pairs if fn(w) != e]
    assert bad == [], bad[:20]


def test_arabic_chain_composition():
    """TestArabicStemFilter feeds already-normalized input; the composed
    dictionary-stage function must agree on raw forms too."""
    assert arabic_normalize_and_stem("والْحسن") == "حسن"
    assert arabic_normalize_and_stem("English") == "English"


def test_hindi_bengali_chain_composition():
    assert hindi_normalize_and_stem("लडके") == "लडक"
    assert bengali_normalize_and_stem("করেছিলাম") == "কর"


def test_telugu_chain_composition():
    # IndicNormalizer's TELUGU rows fire before the stemmer: va + u-sign
    # composes to the letter MA (IndicNormalizer.java:180), THEN the
    # plural suffix strips — faithful to te/TeluguAnalyzer.java:117-127
    assert telugu_normalize_and_stem("వస్తువులు") == "వస్తుమ"
    assert telugu_normalize_and_stem("పన్నులు") == "పన్ను"
    # normalizer two-char compositions (TeluguNormalizer.java:98-115)
    assert telugu_normalize("ఒౕ") == "ఓ"
    assert telugu_normalize("ఒౌ") == "ఔ"
    assert telugu_normalize("చై") == "చై"


# -- Greek (analysis/greek.py) -----------------------------------------------

def test_greek_stemmer_vectors():
    """Every TestGreekStemmer.java vector (checkOneTerm over the full
    GreekAnalyzer with an empty stop set: GreekLowerCase -> GreekStem)."""
    from lucene_spark.analysis.greek import greek_fold, greek_stem

    pairs = _java_vectors("el/TestGreekStemmer.java")
    assert len(pairs) >= 300
    fn = lambda w: greek_stem(greek_fold(w))  # noqa: E731
    bad = [(w, e, fn(w)) for w, e in pairs if fn(w) != e]
    assert bad == [], (len(bad), bad[:20])


def test_greek_fold():
    """GreekLowerCaseFilter.java:54-113 diacritic/sigma standardization."""
    from lucene_spark.analysis.greek import greek_fold

    assert greek_fold("Μάϊος") == "μαιοσ"
    assert greek_fold("ΜΆΪΟΣ") == "μαιοσ"
    assert greek_fold("ἄνθρωπος".replace("ἄ", "ά")) == "ανθρωποσ"
    assert greek_fold("ΰϋΐϊ") == "υυιι"
