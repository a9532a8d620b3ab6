"""Highlighting: passage extraction semantics + Spark plumbing."""

import pytest

from lucene_spark.search import IndexSearcher, TermQuery
from lucene_spark.search.highlight import (
    extract_passages,
    first_match_snippets,
    highlight_hits,
)


# -- unit: extract_passages -------------------------------------------------


def test_wraps_all_matches_in_best_passage():
    out = extract_passages("the spark engine sparks joy", {"spark": 1.0})
    assert "<b>spark</b>" in out
    # 'sparks' is a different token — not wrapped
    assert "<b>sparks</b>" not in out and "sparks" in out


def test_picks_highest_weighted_passage():
    text = ("alpha beta gamma delta epsilon zeta " * 3
            + " needle needle needle "
            + "eta theta iota kappa " * 3)
    out = extract_passages(text, {"needle": 2.0, "alpha": 0.1},
                           max_passages=1, passage_chars=40)
    assert "<b>needle</b>" in out
    assert "<b>alpha</b>" not in out


def test_multiple_passages_in_text_order():
    text = ("first match here " + "x " * 60
            + "second match there")
    out = extract_passages(text, {"match": 1.0}, max_passages=2, passage_chars=30)
    assert out.count("<b>match</b>") == 2
    assert " ... " in out
    assert out.index("first") < out.index("second")


def test_no_match_yields_empty():
    assert extract_passages("nothing relevant here", {"absent": 1.0}) == ""
    assert extract_passages("", {"x": 1.0}) == ""


def test_case_preserved_outside_tags():
    out = extract_passages("The Spark Engine", {"spark": 1.0})
    assert "<b>Spark</b>" in out  # original casing kept inside the wrap


# -- Spark plumbing ---------------------------------------------------------


@pytest.fixture(scope="module")
def text_df(spark, tiny_corpus, tiny_index):
    from lucene_spark.fixtures import transcripts_df

    tr = transcripts_df(spark, rows=tiny_corpus)
    return tr.join(
        tiny_index.docs.select("doc_id", "conv_id", "turn_idx"),
        ["conv_id", "turn_idx"],
    ).select("doc_id", "text")


def test_highlight_hits_end_to_end(spark, tiny_index, text_df):
    s = IndexSearcher(tiny_index)
    hits = s.search(TermQuery("model"), 5)
    out = highlight_hits(s, ["model"], hits, text_df=text_df).collect()
    assert len(out) == 5
    for r in out:
        assert "<b>" in r.snippet and "</b>" in r.snippet
        assert "model" in r.snippet.lower()


def test_first_match_snippets_jvm(spark, tiny_index, text_df):
    s = IndexSearcher(tiny_index)
    hits = s.search(TermQuery("model"), 5)
    out = first_match_snippets(hits, text_df, "model", width=40).collect()
    for r in out:
        assert "<b>model</b>" in r.snippet
        assert len(r.snippet) <= 40 + len("<b></b>") * (
            r.snippet.count("<b>")
        )


# -- FastVectorHighlighter path (offsets relation, no query-time analysis) --

import re as _re

from lucene_spark.analysis.tokenizer import TOKEN_PATTERN as _TP
from lucene_spark.search.highlight import fvh_snippets, token_offsets_relation


def _py_fvh(text, terms, width, margin, bold_all=True):
    low = text.lower()
    ms = sorted(
        (m.start(), m.end())
        for m in _re.finditer(_TP, low)
        if m.group(0) in terms
    )
    if not ms:
        return ""
    ws = max(0, ms[0][0] - margin)
    we = min(len(low), ws + width)
    inwin = [(s, e) for s, e in ms if s >= ws and e <= we]
    if not bold_all:
        inwin = inwin[:1]
    out, pos = [], ws
    for s, e in inwin:
        out.append(low[pos:s])
        out.append("<b>" + low[s:e] + "</b>")
        pos = e
    out.append(low[pos:we])
    return "".join(out)


def test_token_offsets_relation(spark):
    df = spark.createDataFrame(
        [(1, "The Spark engine sparks joy. spark!"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in token_offsets_relation(df).collect()}
    assert set(rows) == {"the", "spark", "engine", "sparks", "joy"}
    r = rows["spark"]
    assert r["positions"] == [1, 5]
    assert r["starts"] == [4, 29]
    assert r["ends"] == [9, 34]
    low = "the spark engine sparks joy. spark!"
    for t, rr in rows.items():
        for s, e in zip(rr["starts"], rr["ends"]):
            assert low[s:e] == t


@pytest.mark.parametrize("bold_all", [True, False])
def test_fvh_snippets_vs_python_model(spark, bold_all):
    texts = [
        (1, "alpha spark beta spark gamma delta " * 3),
        (2, "no matches at all in this one"),
        (3, "spark at the very start of the text and spark again much later on"),
        (4, "x " * 50 + "spark near the end"),
        (5, "data spark data " * 10),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    hits = spark.createDataFrame([(i,) for i, _ in texts], "doc_id long")
    off = token_offsets_relation(df)
    out = fvh_snippets(
        hits, off, df, ["spark", "data"], width=48, margin=12, bold_all=bold_all
    )
    got = {r["doc_id"]: r["snippet"] for r in out.collect()}
    for did, text in texts:
        assert got[did] == _py_fvh(text, {"spark", "data"}, 48, 12, bold_all), did


def test_fvh_end_to_end_index(spark, tiny_index, text_df):
    s = IndexSearcher(tiny_index)
    hits = s.search(TermQuery("model"), 5)
    off = token_offsets_relation(text_df)
    out = fvh_snippets(hits, off, text_df, ["model"], width=60, margin=15).collect()
    assert len(out) == 5
    for r in out:
        assert "<b>model</b>" in r.snippet


def test_phrase_match_snippets(spark, tiny_index):
    """MatchHighlighter semantic: the phrase bolds as a unit at its first
    occurrence; a doc containing both terms NON-adjacently gets no
    snippet even if it ranks for the individual terms."""
    from pyspark.sql import functions as F

    from lucene_spark.search.highlight import phrase_match_snippets

    rows = [
        (0, "Big the customer said hello"),
        (1, "the big customer arrived"),      # not adjacent -> no snippet
        (2, "x" * 50 + " THE, Customer!"),    # punctuation separator
    ]
    text_df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = {
        r.doc_id: r.snippet
        for r in phrase_match_snippets(
            hits, text_df, ("the", "customer"), before=10, after=10
        ).collect()
    }
    assert got[0] == "big <b>the customer</b> said hell"
    assert got[1] == ""
    assert got[2].endswith("<b>the, customer</b>!")
    assert "<b>" not in got[1]
