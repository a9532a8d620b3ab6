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


def token_offsets_relation(
    text_df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, positions, starts, ends): per-doc token char offsets.

    ≙ storing offsets in the index (``IndexOptions
    DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS`` /
    ``Lucene90TermVectorsFormat`` with offsets, FieldType.setStoreTermVector
    Offsets) — built ONCE at index time with one Arrow pass over the stored
    text, so query-time highlighting never re-analyzes documents (the whole
    point of FastVectorHighlighter vs the re-analysis default).

    ``starts``/``ends`` are 0-based [start, end) char offsets into the
    ORIGINAL text, parallel to ``positions``; tokens chopped at 255 chars
    emit one row entry per chunk, like the index.  Persist / write this
    relation partitioned like the stored fields (doc_id-range) so per-hit
    fetches prune.
    """
    import pandas as pd

    from lucene_spark.analysis.tokenizer import MAX_TOKEN_LENGTH

    schema = (
        f"{doc_col} long, term string, positions array<int>, "
        "starts array<int>, ends array<int>"
    )

    def gen(batches):
        for pdf in batches:
            out = {doc_col: [], "term": [], "positions": [], "starts": [], "ends": []}
            for did, txt in zip(pdf[doc_col], pdf[text_col]):
                acc: dict[str, tuple[list, list, list]] = {}
                pos = 0
                for m in _TOKEN_RE.finditer((txt or "").lower()):
                    run = m.group(0)
                    for i in range(0, len(run), MAX_TOKEN_LENGTH):
                        tok = run[i : i + MAX_TOKEN_LENGTH]
                        ps, ss, es = acc.setdefault(tok, ([], [], []))
                        ps.append(pos)
                        ss.append(m.start() + i)
                        es.append(m.start() + i + len(tok))
                        pos += 1
                for tok, (ps, ss, es) in acc.items():
                    out[doc_col].append(did)
                    out["term"].append(tok)
                    out["positions"].append(ps)
                    out["starts"].append(ss)
                    out["ends"].append(es)
            # explicit dtypes: an empty batch would otherwise default the
            # list columns to float64, which Arrow can't cast to list<int>
            yield pd.DataFrame(
                {
                    doc_col: pd.Series(out[doc_col], dtype="int64"),
                    "term": pd.Series(out["term"], dtype=object),
                    "positions": pd.Series(out["positions"], dtype=object),
                    "starts": pd.Series(out["starts"], dtype=object),
                    "ends": pd.Series(out["ends"], dtype=object),
                }
            )

    return text_df.select(doc_col, text_col).mapInPandas(gen, schema)


def fvh_snippets(
    hits: DataFrame,
    offsets: DataFrame,
    text_df: DataFrame,
    terms,
    width: int = 80,
    margin: int = 20,
    bold_all: bool = True,
    lowercase: bool = True,
) -> DataFrame:
    """FastVectorHighlighter analog: hits + ``snippet`` assembled from the
    stored offsets relation — NO analysis at query time.

    ≙ highlighter/vectorhighlight/FastVectorHighlighter.java:
    FieldTermStack (term vector -> match offsets), SimpleFragListBuilder
    (one fragment of ~``width`` chars anchored ``margin`` chars before the
    first match; SimpleFragListBuilder.java's MARGIN_DEFAULT), and
    SimpleFragmentsBuilder's ``<b>..</b>`` wrapping.

    The whole query-time path is JVM expressions: a doc_id join against the
    (pruned) offsets relation, then one fold (``F.aggregate``) that splices
    ``<b>..</b>`` around each in-window match — no Python UDF at all.
    ``bold_all=False`` wraps only the first match (the SQL-twin-reproducible
    variant).  ``lowercase`` renders from lowered text (offsets are computed
    on lowered text, which is length-identical for the declared subset).
    """
    tset = [t for t in terms]
    matches = (
        offsets.filter(F.col("term").isin(tset))
        .select(
            "doc_id",
            F.explode(F.arrays_zip("starts", "ends")).alias("m"),
        )
        .select("doc_id", F.col("m.starts").alias("s"), F.col("m.ends").alias("e"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("ms"))
    )
    joined = (
        hits.join(matches, "doc_id", "left")
        .join(text_df.select("doc_id", "text"), "doc_id", "left")
    )
    txt = F.lower(F.col("text")) if lowercase else F.col("text")
    tlen = F.length(txt)
    first_s = F.element_at(F.col("ms"), 1)["s"] + 1  # 1-based
    ws = F.greatest(F.lit(1), first_s - F.lit(margin))
    we = F.least(tlen + 1, ws + F.lit(width))  # exclusive
    inwin = F.filter(
        F.col("ms"), lambda m: ((m["s"] + 1) >= ws) & ((m["e"] + 1) <= we)
    )
    if not bold_all:
        # if the first match does not fit entirely inside the window (long
        # term relative to width/margin), still bold it — the fold's final
        # substring is already clamped to >= 0 chars, so the snippet simply
        # ends at the match.  Matches the SQL twin's always-bold-first-match.
        inwin = F.slice(
            F.when(F.size(inwin) > 0, inwin).otherwise(F.col("ms")), 1, 1
        )
    folded = F.aggregate(
        inwin,
        F.struct(ws.cast("int").alias("pos"), F.lit("").alias("acc")),
        lambda a, m: F.struct(
            (m["e"] + 1).cast("int").alias("pos"),
            F.concat(
                a["acc"],
                F.substring(txt, a["pos"], (m["s"] + 1 - a["pos"]).cast("int")),
                F.lit("<b>"),
                F.substring(txt, m["s"] + 1, (m["e"] - m["s"]).cast("int")),
                F.lit("</b>"),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.substring(txt, a["pos"], F.greatest(F.lit(0), we - a["pos"]).cast("int")),
        ),
    )
    snippet = F.when(
        F.col("ms").isNull() | (F.size(F.col("ms")) == 0), F.lit("")
    ).otherwise(folded)
    return joined.withColumn("snippet", snippet).drop("text", "ms")


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


def phrase_snippet_pattern(terms, before: int = 30, after: int = 30) -> str:
    """The shared 3-group snippet regex (context, boundary-anchored phrase
    core, context) — built once so the engine and the SQL twins stay
    literally identical.  ``\\b`` anchors stop partial-word hits ("the
    data" inside "the database"); terms are regex-escaped.  ``\\b`` is
    shared by Java, RE2 and Python (its underscore-is-a-word-char quirk
    is the documented subset)."""
    sep = "[^a-z0-9]+"
    core = sep.join(re.escape(t) for t in terms)
    return f"(.{{0,{before}}})(\\b{core}\\b)(.{{0,{after}}})"


def phrase_match_snippets(
    hits: DataFrame,
    text_df: DataFrame,
    terms,
    before: int = 30,
    after: int = 30,
) -> DataFrame:
    """Span-aware snippet: the FIRST exact-phrase occurrence highlighted
    AS A UNIT — the MatchHighlighter semantic (highlighter/.../
    matchhighlight/MatchHighlighter.java: regions come from the query's
    MATCHES, so "the customer" bolds only where the whole phrase matches,
    never every lone "the").

    The phrase region on the lowered text is the terms joined by a
    non-token separator run (adjacent token positions ⇔ only non-token
    chars between — the ExactPhraseMatcher adjacency, expressed as the
    shared-subset regex ``t1[^a-z0-9]+t2...``); up to ``before``/``after``
    context chars wrap it, and the match is wrapped in <b>..</b>.  Pure
    JVM expressions (one regexp_extract per group), reproducible verbatim
    in an independent SQL engine — the ``first_match_snippets`` contract,
    phrase-aware."""
    pat = phrase_snippet_pattern(terms, before, after)
    lo = F.lower(F.col("text"))
    g1 = F.regexp_extract(lo, pat, 1)
    g2 = F.regexp_extract(lo, pat, 2)
    g3 = F.regexp_extract(lo, pat, 3)
    snippet = F.when(
        g2 != F.lit(""),
        F.concat(g1, F.lit("<b>"), g2, F.lit("</b>"), g3),
    ).otherwise(F.lit(""))
    return (
        hits.join(text_df, "doc_id", "left")
        .withColumn("snippet", snippet)
        .drop("text")
    )
