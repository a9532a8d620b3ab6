"""Sorani Kurdish (analysis/sorani.py): full ckbtestdata.zip parity,
normalizer/stemmer unit contracts from the reference's own test cases,
and the Analyzer.sorani() preset end-to-end."""

import os
import zipfile

import pytest

from lucene_spark.analysis import (
    Analyzer,
    sorani_normalize,
    sorani_normalize_and_stem,
    sorani_stem,
)

_CKB_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/ckb/ckbtestdata.zip"
)


@pytest.mark.skipif(not os.path.exists(_CKB_ZIP), reason="reference vectors absent")
def test_sorani_full_archive():
    """All 8,272 normalize+stem pairs (TestSoraniStemFilter.testVocabulary
    runs 'just normalization+stem') — exact."""
    with zipfile.ZipFile(_CKB_ZIP) as z:
        lines = z.read("testdata.txt").decode("utf-8").splitlines()
    pairs = [ln.split("\t") for ln in lines if ln.strip()]
    assert len(pairs) == 8272
    bad = [
        (w, e, sorani_normalize_and_stem(w))
        for w, e in pairs
        if sorani_normalize_and_stem(w) != e
    ]
    assert bad == [], bad[:20]


def test_normalizer_vectors():
    """TestSoraniNormalizationFilter.java cases."""
    assert sorani_normalize("ي") == "ی"      # yeh -> farsi yeh
    assert sorani_normalize("ك") == "ک"      # kaf -> keheh
    assert sorani_normalize("ه‌") == "ە"   # heh+ZWNJ -> ae
    assert sorani_normalize("ه‌ک") == "ەک"
    assert sorani_normalize("ه") == "ە"      # final heh -> ae
    assert sorani_normalize("ة") == "ە"      # teh marbuta -> ae
    assert sorani_normalize("ھ") == "ه"      # heh doachashmee -> heh
    assert sorani_normalize("رۆژ") == "ڕۆژ"  # initial reh -> rreh
    assert sorani_normalize("ڒ") == "ڕ"      # rreh above -> rreh
    # harakat / tatweel deleted; the running-length final-heh contract
    assert sorani_normalize("هـ") == "ه"
    assert sorani_normalize("کَتِبَ") == "کتب"


def test_stemmer_vectors():
    """TestSoraniStemFilter.java cases (input pre-normalized)."""
    assert sorani_stem("پیاوێک") == "پیاو"        # -ek
    assert sorani_stem("دەرگایەک") == "دەرگا"   # -yek
    assert sorani_stem("پیاوەكە".replace("ك", "ک")) == "پیاو"  # -aka
    assert sorani_stem("دەرگاکە") == "دەرگا"     # -ka
    assert sorani_stem("پیاوان") == "پیاو"        # -An
    assert sorani_stem("پیاوەکان") == "پیاو"      # -akAn
    assert sorani_stem("هۆتیلی") == "هۆتیل"       # ezafe
    assert sorani_stem("هۆتیلێکی") == "هۆتیل"
    assert sorani_stem("دوورەوە") == "دوور"       # -awa
    assert sorani_stem("پارەمان") == "پارە"       # -mAn
    assert sorani_stem("") == ""


def test_preset_roundtrip_and_chain():
    an = Analyzer.sorani()
    assert not an.is_noop()
    assert Analyzer.from_json(an.to_json()) == an
    # stop hole + normalize+stem at the dictionary stage
    assert an.analyze_text("پیاوەکان لە هۆتیلێکی گەورە") == [
        ("پیاو", 0), ("هۆتیل", 2), ("گەور", 3),
    ]


def test_preset_search_parity(spark):
    import numpy as np
    from datetime import datetime

    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery

    texts = [
        "پیاوەکان لە هۆتیلێکی گەورە",
        "دەرگاکان و پیاوان پێکەوە",
        "هۆتیلی نوێ",
        "هیچ شتێکی تر",
    ]
    rows = [
        dict(conv_id=f"c{i//2}", turn_idx=i % 2, role="user", tool=None,
             ts=datetime(2026, 1, 1), text=t)
        for i, t in enumerate(texts)
    ]
    an = Analyzer.sorani()
    idx = IndexBuilder(num_segments=2, analyzer=an).build(
        transcripts_df(spark, rows=rows)
    )
    orc = OracleIndex.build(rows, analyzer=an)
    s = IndexSearcher(idx)
    terms = s.parse_terms("پیاوان هۆتیلی")
    assert terms == ["پیاو", "هۆتیل"]
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
