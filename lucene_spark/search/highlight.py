"""Highlighting: passage extraction + match formatting for top hits.

≙ the reference's UnifiedHighlighter
(highlighter/.../uhighlight/UnifiedHighlighter.java) with the ANALYSIS
offset source (re-analyze the stored text at highlight time — offsets are
not stored in the index, exactly the highlighter's default for non-offset
fields), PassageScorer-style idf-weighted passage ranking, and
DefaultPassageFormatter's ``<b>..</b>`` + ``... `` ellipsis output.

Plan shape: highlighting is per-HIT work (k docs, not a corpus scan) —
the hits relation (small) broadcast-joins the stored docs text, and one
Arrow-batched UDF does tokenization-with-offsets, passage windowing,
scoring, and formatting per doc.  That mirrors the reference, where the
highlighter also re-analyzes only the returned page of hits.

``first_match_snippets`` is a simplified, fully JVM-expression variant
(window around the first occurrence, lowercased) used where a snippet must
be reproducible by an independent SQL engine.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, functions as F

from lucene_spark.analysis.tokenizer import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def extract_passages(
    text: str,
    term_weights: dict[str, float],
    max_passages: int = 1,
    passage_chars: int = 100,
) -> str:
    """Pure-Python passage extraction for ONE document (unit-testable; the
    Spark path maps this over hits in an Arrow UDF).

    Tokenize with char offsets; greedily window tokens into passages of
    ~``passage_chars``; score a passage like PassageScorer: sum over its
    matching tokens of weight(term) * 1/(1+ln(1+pos/10)) is NOT replicated
    — we use the documented simplification score = Σ_t weight(t) *
    (1 + ln(1 + tf_t)) over terms in the passage; take the best
    ``max_passages`` (by score desc, start asc) in TEXT order, wrap matched
    tokens with <b>..</b>, join with " ... ".
    """
    if not text:
        return ""
    spans = [
        (m.start(), m.end(), m.group(0)) for m in _TOKEN_RE.finditer(text.lower())
    ]
    # window tokens into passages of ~passage_chars
    passages = []  # (start_char, end_char, [(s, e, term), ...])
    cur, cur_start = [], None
    for s, e, t in spans:
        if cur and e - cur_start > passage_chars:
            passages.append((cur_start, cur[-1][1], cur))
            cur, cur_start = [], None
        if cur_start is None:
            cur_start = s
        cur.append((s, e, t))
    if cur:
        passages.append((cur_start, cur[-1][1], cur))

    scored = []
    for start, end, toks in passages:
        tfs: dict[str, int] = {}
        for _, _, t in toks:
            if t in term_weights:
                tfs[t] = tfs.get(t, 0) + 1
        if not tfs:
            continue
        score = sum(term_weights[t] * (1.0 + math.log1p(tf)) for t, tf in tfs.items())
        scored.append((score, start, end, toks))
    if not scored:
        return ""
    best = sorted(scored, key=lambda p: (-p[0], p[1]))[:max_passages]
    best.sort(key=lambda p: p[1])  # emit in text order
    out = []
    for _, start, end, toks in best:
        frag, pos = [], start
        for s, e, t in toks:
            frag.append(text[pos:s])
            if t in term_weights:
                frag.append("<b>" + text[s:e] + "</b>")
            else:
                frag.append(text[s:e])
            pos = e
        out.append("".join(frag))
    return " ... ".join(out)


def highlight_hits(
    searcher,
    terms,
    hits: DataFrame,
    max_passages: int = 1,
    passage_chars: int = 100,
    text_df: DataFrame | None = None,
) -> DataFrame:
    """hits(doc_id, ...) -> hits + ``snippet`` for the given query terms.

    Term weights = the searcher's idf (PassageScorer uses the same
    BM25-style idf).  ``text_df``: (doc_id, text) stored-field source;
    defaults to the transcripts text if present on the docs relation,
    otherwise callers pass their stored table.
    """
    import pandas as pd

    dfs = searcher.term_doc_freqs(list(terms))
    weights = {t: float(searcher.idf(dfs[t])) for t in terms if t in dfs}
    if text_df is None:
        if "text" not in searcher.index.docs.columns:
            raise ValueError("docs relation has no text column; pass text_df")
        text_df = searcher.index.docs.select("doc_id", "text")
    joined = hits.join(text_df, "doc_id", "left")
    mp, pc = int(max_passages), int(passage_chars)

    @F.pandas_udf("string")
    def _snip(texts):
        return pd.Series(
            [extract_passages(t or "", weights, mp, pc) for t in texts]
        )

    return joined.withColumn("snippet", _snip(F.col("text"))).drop("text")


def first_match_snippets(
    hits: DataFrame, text_df: DataFrame, term: str, width: int = 60
) -> DataFrame:
    """SQL-reproducible snippet: lowercased window of ``width`` chars
    centered on the FIRST occurrence of ``term``, with every occurrence of
    the term inside the window wrapped in <b>..</b>.  Empty when the term
    does not occur.  Pure JVM expressions."""
    lo = F.lower(F.col("text"))
    pos = F.locate(term, lo)  # 1-based, 0 = absent
    start = F.greatest(F.lit(1), pos - F.lit(width // 2))
    win = F.substring(lo, start.cast("int"), width)
    snippet = F.when(
        pos > 0, F.replace(win, F.lit(term), F.lit(f"<b>{term}</b>"))
    ).otherwise(F.lit(""))
    return hits.join(text_df, "doc_id", "left").withColumn(
        "snippet", snippet
    ).drop("text")
