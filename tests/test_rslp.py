"""RSLP rule-engine stemmers (analysis/rslp.py): full parity vs the
reference's own vector archives (pt/ptrslptestdata.zip 32,016 pairs,
gl/gltestdata.zip 9,416 pairs), rule-machinery contracts, and the
Analyzer.galician() / Analyzer.portuguese(stemmer="rslp") presets."""

import os
import zipfile

import pytest

from lucene_spark.analysis import Analyzer, galician_stem, portuguese_rslp_stem
from lucene_spark.analysis.rslp import parse_rslp

_REF_ANALYSIS_TEST = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
)


@pytest.mark.parametrize(
    "fn,zip_rel,member,count",
    [
        (portuguese_rslp_stem, "pt/ptrslptestdata.zip", "ptrslp.txt", 32016),
        (galician_stem, "gl/gltestdata.zip", "gl.txt", 9416),
    ],
    ids=["pt_rslp", "gl"],
)
def test_rslp_full_archive(fn, zip_rel, member, count):
    path = os.path.join(_REF_ANALYSIS_TEST, zip_rel)
    if not os.path.exists(path):
        pytest.skip("reference vectors absent")
    with zipfile.ZipFile(path) as z:
        lines = z.read(member).decode("utf-8").splitlines()
    pairs = [ln.split("\t") for ln in lines if ln.strip()]
    assert len(pairs) == count
    bad = [(w, e, fn(w)) for w, e in pairs if fn(w) != e]
    assert bad == [], bad[:20]


def test_rule_machinery_contracts():
    """RSLPStemmerBase.java semantics on a hand-built step set."""
    steps = parse_rslp(
        """
# comment
{  "Plural", 3, 1, {"s"},
  {"ns",1,"m"},
  {"s",2,"",{"mas"}}};
{  "Suf", 0, 0, {},
  {"mente",4,"",{"experimente"}}};
"""
    )
    pl = steps["Plural"]
    # min stem size counted BEFORE appending the replacement
    assert pl.apply("bons") == "bom"
    # whole-word exception (flag 1)
    assert pl.apply("mas") == "mas"
    assert pl.apply("casas") == "casa"
    # step min word size: < 3 bypasses
    assert pl.apply("as") == "as"
    # step entry-suffix gate
    assert pl.apply("bom") == "bom"
    suf = steps["Suf"]
    # auto-derived step min = rule.min + len(suffix) = 9
    assert suf.min == 9
    # suffix exception (flag 0) — ends-with
    assert suf.apply("felizmente") == "feliz"
    assert suf.apply("experimente") == "experimente"


def test_flow_divergence_from_light():
    """RSLP (dictionary-suffix rules) vs the light stemmer on the same
    words — the motivating difference, pinned by reference vectors."""
    from lucene_spark.analysis import portuguese_light_stem

    assert portuguese_rslp_stem("consultas") == "consult"
    assert portuguese_light_stem("consultas") == "consult"
    # feminine + noun chain only RSLP does
    assert portuguese_rslp_stem("professora") == "profes"
    assert portuguese_light_stem("professora") == "professor"


def test_galician_flow():
    # plural -> noun, RSLG accent fold
    assert galician_stem("consultas") == "consult"
    # augmentative applies to fixpoint (GalicianStemmer.java:55-58 loop)
    assert galician_stem("táboas") == "tabo"


@pytest.mark.parametrize("preset", ["galician", "portuguese_rslp"])
def test_preset_roundtrip(preset):
    an = getattr(Analyzer, preset)()
    assert not an.is_noop()
    assert Analyzer.from_json(an.to_json()) == an


def test_portuguese_stemmer_arg():
    assert Analyzer.portuguese().stemmer == "portuguese_light"
    assert Analyzer.portuguese(stemmer="rslp").stemmer == "portuguese_rslp"
    with pytest.raises(ValueError):
        Analyzer.portuguese(stemmer="nope")


def test_preset_search_parity(spark):
    """Engine == oracle rank + f32 score for the Galician preset (the
    same contract as test_lang_analyzers.test_preset_search_parity)."""
    import numpy as np

    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery
    from datetime import datetime

    texts = [
        "as consultas rápidas sobre táboas optimizadas",
        "unha consulta lenta",
        "táboas e consultas combinadas",
        "nada interesante aquí",
    ]
    rows = [
        dict(conv_id=f"c{i//2}", turn_idx=i % 2, role="user", tool=None,
             ts=datetime(2026, 1, 1), text=t)
        for i, t in enumerate(texts)
    ]
    an = Analyzer.galician()
    idx = IndexBuilder(num_segments=2, analyzer=an).build(
        transcripts_df(spark, rows=rows)
    )
    orc = OracleIndex.build(rows, analyzer=an)
    s = IndexSearcher(idx)
    terms = s.parse_terms("consultas táboas")
    assert terms == ["consult", "tabo"]
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
