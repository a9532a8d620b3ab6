"""Round-5 wave-3 analyzers (the Snowball-stemmed chains, analysis/wave3.py
+ analysis/snowball/): full-preset parity against the reference's OWN
Test*Analyzer.java assertions, serialization roundtrips, JVM chain parity
(including the new pre_sub lowering), and engine == oracle search parity.

The stemmers themselves are separately replayed against 503k vectors from
the compiled reference Snowball programs in tests/test_snowball.py; this
module pins the COMPOSED chains (tokenizer alphabet + stop + normalizers +
elision + pre_sub + stem)."""

import os
import re

import numpy as np
import pytest

from lucene_spark.analysis import Analyzer

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

WAVE3 = [
    "danish", "dutch", "romanian", "catalan", "lithuanian", "irish",
    "armenian", "basque", "nepali", "estonian", "tamil", "turkish",
    "serbian",
]
_IDS = ["da", "nl", "ro", "ca", "lt", "ga", "hy", "eu", "ne", "et", "ta",
        "tr", "sr"]

_TEST_FILES = {
    "danish": "da/TestDanishAnalyzer.java",
    "dutch": "nl/TestDutchAnalyzer.java",
    "romanian": "ro/TestRomanianAnalyzer.java",
    "catalan": "ca/TestCatalanAnalyzer.java",
    "lithuanian": "lt/TestLithuanianAnalyzer.java",
    "irish": "ga/TestIrishAnalyzer.java",
    "armenian": "hy/TestArmenianAnalyzer.java",
    "basque": "eu/TestBasqueAnalyzer.java",
    "nepali": "ne/TestNepaliAnalyzer.java",
    "estonian": "et/TestEstonianAnalyzer.java",
    "tamil": "ta/TestTamilAnalyzer.java",
    "turkish": "tr/TestTurkishAnalyzer.java",
    "serbian": "sr/TestSerbianAnalyzer.java",
}

# checkOneTerm(a, "word", "stem")
_ONE_RE = re.compile(r'checkOneTerm\(\s*a\s*,\s*"([^"]*)"\s*,\s*"([^"]*)"\s*\)')
# assertAnalyzesTo(a, "text", new String[] {"t1", "t2", ...})  (0..n tokens,
# possibly spanning lines)
_MANY_RE = re.compile(
    r'assertAnalyzesTo\(\s*a\s*,\s*"([^"]*)"\s*,\s*new String\[\]\s*\{([^}]*)\}',
    re.DOTALL,
)
_TOK_RE = re.compile(r'"([^"]*)"')
_METHOD_RE = re.compile(r"public void (\w+)\(\)")


def _unesc(s: str) -> str:
    return re.sub(r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s)


def _analyzer_cases(rel: str):
    """(input, [expected tokens]) from every default-constructed-analyzer
    test method — methods that build a stem-exclusion / keyword analyzer
    (new CharArraySet / exclusionSet) pin plumbing our presets don't
    model and are skipped, as are the randomized blasts."""
    path = os.path.join(_REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference vectors absent")
    src = open(path, encoding="utf-8").read()
    # split into method bodies
    bounds = [(m.start(), m.group(1)) for m in _METHOD_RE.finditer(src)]
    out = []
    for i, (start, name) in enumerate(bounds):
        end = bounds[i + 1][0] if i + 1 < len(bounds) else len(src)
        body = src[start:end]
        if "CharArraySet" in body or "exclusionSet" in body:
            continue
        if "checkRandomData" in body:
            continue
        for m in _ONE_RE.finditer(body):
            out.append((_unesc(m.group(1)), [_unesc(m.group(2))]))
        for m in _MANY_RE.finditer(body):
            toks = [_unesc(t) for t in _TOK_RE.findall(m.group(2))]
            out.append((_unesc(m.group(1)), toks))
    return out


@pytest.mark.parametrize("preset", WAVE3, ids=_IDS)
def test_reference_analyzer_vectors(preset):
    """Every default-analyzer assertion in the reference's own test file
    replays through the preset chain — stemming, stopwords, elision,
    normalizers, digit folds, apostrophes, case."""
    cases = _analyzer_cases(_TEST_FILES[preset])
    # lt's file carries a single default-analyzer assertion (the stemmer
    # itself is archive-replayed in test_snowball.py)
    assert len(cases) >= (1 if preset == "lithuanian" else 3), (
        f"parsed only {len(cases)} cases"
    )
    an = getattr(Analyzer, preset)()
    bad = []
    for text, expected in cases:
        got = [w for w, _ in sorted(an.analyze_text(text), key=lambda e: e[1])]
        if got != expected:
            bad.append((text, expected, got))
    assert bad == [], bad[:10]


@pytest.mark.parametrize("preset", WAVE3, ids=_IDS)
def test_preset_roundtrip_and_noop(preset):
    an = getattr(Analyzer, preset)()
    assert not an.is_noop()
    assert Analyzer.from_json(an.to_json()) == an


def test_english_snowball_variant():
    """english(stemmer="snowball") = Porter2 in the EnglishAnalyzer chain
    (possessive + stop + stem); differs from Porter1 on the classic
    'generously' class."""
    an = Analyzer.english(stemmer="snowball")
    assert Analyzer.from_json(an.to_json()) == an
    terms = lambda t: [w for w, _ in sorted(  # noqa: E731
        an.analyze_text(t), key=lambda e: e[1])]
    assert terms("the dog's generously optimized queries") == [
        "dog", "generous", "optim", "queri"
    ]
    # Porter1 keeps 'generously' -> 'gener'
    assert [w for w, _ in Analyzer.english().analyze_text("generously")] == [
        "gener"
    ]


# -- JVM chain parity (stem deferred to dictionary stage) ---------------------

_PARITY_TEXTS = {
    "danish": ["undersøgelse på kvinderne", "де er store", ""],
    "dutch": ["lichamelijke opheffingen van de fietsen", "het kind"],
    "romanian": ["absența și copiii lor", "absenţa ţară şcoală"],
    "catalan": ["l'institut d'estudis i les llengües", "un exemple"],
    "lithuanian": ["vaikų ir mergaitės knygos", "ąžuolas čia"],
    "irish": ["b'fhearr m'athair na siopadóireacht", "an tSeapáin nGaeilge"],
    "armenian": ["արծիվներ և գիրքեր", "մարդիկ են"],
    "basque": ["zaldiak eta mendiari buruz", "izan da"],
    "nepali": ["मित्रहरु र १२३४ किताबहरू", "सबै व्यक्तिहरू"],
    "estonian": ["teadaolevalt ja raamatud", "olen siin"],
    "tamil": ["நண்பர்கள் மற்றும் ௧௨௩௪", "புத்தகங்கள்"],
    "turkish": ["Kıbrıs'ta ağacı ve Gölü'ne", "İstanbul dolayı"],
    "serbian": ["abdiciraće и đubrište", "децимални бројеви"],
}


@pytest.mark.parametrize("preset", WAVE3, ids=_IDS)
def test_preset_entries_expr_matches_python_chain(spark, preset):
    """entries_expr (stem stage deferred) == analyze_text with stemmer
    stripped — the builder contract; exercises the pre_sub JVM lowering
    (tr apostrophe, ga eclipsis) and the char_fold digit rows."""
    from dataclasses import replace as dc_replace

    from pyspark.sql import functions as F

    an = getattr(Analyzer, preset)()
    nostem = dc_replace(an, stemmer=None)
    texts = _PARITY_TEXTS[preset]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(nostem.entries_expr(F.col("text")).alias("e")).collect()
    for t, r in zip(texts, rows):
        got = sorted((x["term"], x["pos"]) for x in (r.e or []))
        want = sorted(nostem.analyze_text(t))
        assert got == want, (preset, t)


# -- engine vs oracle parity (full build incl. dictionary stem) ---------------


def _mk_rows(texts):
    from datetime import datetime

    t0 = datetime(2026, 1, 1)
    return [
        dict(conv_id=f"c{i//2}", turn_idx=i % 2, role="user", tool=None,
             ts=t0, text=t)
        for i, t in enumerate(texts)
    ]


@pytest.mark.parametrize(
    "preset,texts,query",
    [
        (
            "danish",
            [
                "undersøgelse af kvinderne og bøgerne",
                "en undersøg uden bog",
                "kvinder og undersøgelser sammen",
                "ingenting interessant",
            ],
            "undersøgelse kvinderne",
        ),
        (
            "dutch",
            [
                "lichamelijke opheffingen van de besturen",
                "een opheffing alleen",
                "besturen en lichamen samen",
                "niets bijzonders",
            ],
            "lichamelijke besturen",
        ),
        (
            "turkish",
            [
                "Kıbrıs'ta büyük ağacı gördük",
                "bir ağaç yalnız",
                "ağaçlar ve Kıbrıs birlikte",
                "hiçbir şey yok",
            ],
            "ağacı Kıbrıs'ta",
        ),
        (
            "romanian",
            [
                "absența copiilor din țară",
                "un copil singur",
                "țara și absențele împreună",
                "nimic interesant",
            ],
            "absența țară",
        ),
        (
            "serbian",
            [
                "децимални бројеви и ђубриште",
                "један број сам",
                "ђубришта и децимале заједно",
                "ништа занимљиво",
            ],
            "децимални ђубриште",
        ),
        (
            "irish",
            [
                "siopadóireacht m'athair sa bhaile",
                "athair amháin anseo",
                "na siopadóirí agus na haithreacha",
                "rud ar bith",
            ],
            "siopadóireacht m'athair",
        ),
    ],
    ids=["da", "nl", "tr", "ro", "sr", "ga"],
)
def test_preset_search_parity(spark, preset, texts, query):
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery

    an = getattr(Analyzer, preset)()
    rows = _mk_rows(texts)
    idx = IndexBuilder(num_segments=2, analyzer=an).build(
        transcripts_df(spark, rows=rows)
    )
    orc = OracleIndex.build(rows, analyzer=an)
    s = IndexSearcher(idx)
    terms = s.parse_terms(query)
    assert terms != query.split()
    q = BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
    engine = s.search(q, 10).collect()
    okeys = orc.topk_keys(orc.search_or(terms, 10))
    assert [(r.conv_id, r.turn_idx) for r in engine] == [
        (c, t) for c, t, _ in okeys
    ]
    np.testing.assert_array_equal(
        np.array([r.score for r in engine], dtype=np.float32),
        np.array([sc for _, _, sc in okeys], dtype=np.float32),
    )
    idx.unpersist_all()
