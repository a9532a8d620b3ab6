"""Classic query-string parser -> Query tree.

≙ the reference's classic ``QueryParser`` (SURVEY.md §2.11, grammar
queryparser/classic/QueryParser.jj; semantics QueryParserBase.java):

supported subset (the syntax exercised by the reference's own demo and
query sets — SearchFiles.java:120, benchmark/conf/query-*.txt):

* terms: ``hello`` — analyzed with the *index* analyzer
  (QueryParserBase.getFieldQuery:456 runs the Analyzer on query text);
  one word analyzing to several tokens becomes SHOULD-of-terms
* phrases: ``"hello world"`` (+ ``~N`` slop — QueryParserBase:480,
  getFieldQuery(slop))
* boolean: ``+must -not term``, ``a AND b``, ``a OR b``, ``NOT a``,
  parenthesized groups (QueryParserBase.addClause:661 conj/mods logic)
* boosts: ``term^2`` / ``"a b"^3`` / ``(a b)^2`` (handleBoost)
* wildcard ``te?m*`` (:691), prefix ``term*`` (:776), fuzzy ``term~``/
  ``term~1`` (:794), regexp ``/re.gex/``, ranges ``[a TO b]`` / ``{a TO b}``
  (:509)
* optional ``text:`` field prefix; ``role:``/``tool:`` (configurable
  ``keyword_fields``) parse to exact-match constant-score FILTER-style
  clauses over the docvalues columns (boost 0 — never scored), any other
  field name is rejected

Like the reference, AND/OR do not nest with precedence: clauses accumulate
into one BooleanQuery where ``a AND b`` promotes both sides to MUST
(QueryParser's conj handling), and the default operator is OR (SHOULD).
"""

from __future__ import annotations

import re

from lucene_spark.analysis.tokenizer import tokenize_text
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<space>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?)
  | (?P<regexp>/(?P<regexp_body>[^/]+)/)
  | (?P<range>[\[{][^\]}]+\s+TO\s+[^\]}]+[\]}])
  | (?P<word>[^\s()+^]+)
  | (?P<caret>\^)
    """,
    re.VERBOSE,
)

_RANGE_RE = re.compile(r"(?P<lb>[\[{])\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*(?P<rb>[\]}])")


class QueryParseError(ValueError):
    pass


class QueryParser:
    """Single-field classic parser; ``parse(s)`` returns a Query.

    ``analyzer``: the index's analysis chain — query words run through it
    (QueryParserBase.getFieldQuery:456 runs the Analyzer on query text);
    phrases keep its position holes."""

    def __init__(self, field: str = "text", default_operator: str = "OR",
                 analyzer=None, synonyms=None,
                 keyword_fields: tuple = ("role", "tool"),
                 fuzzy_prefix_length: int = 0):
        if default_operator not in ("OR", "AND"):
            raise QueryParseError("default_operator must be OR or AND")
        self.field = field
        # non-scored keyword fields (docvalues columns): ``role:user`` parses
        # to an exact-match constant-score clause with boost 0, i.e. it
        # constrains matching under its occur but never contributes score —
        # the filter-field idiom (the engine scores only the text field; a
        # full per-field scored index is out of the single-field scope).
        self.keyword_fields = tuple(keyword_fields)
        self.default_occur = Occur.SHOULD if default_operator == "OR" else Occur.MUST
        self.analyzer = analyzer
        # QueryParserBase.setFuzzyPrefixLength: fuzzy terms require this
        # many leading characters to match literally
        self.fuzzy_prefix_length = fuzzy_prefix_length
        # QueryTimeSynonyms: query-side graph expansion (QueryBuilder.java
        # analyzeGraphBoolean) — single-token rules become SynonymQuery,
        # multi-token alternatives become phrase SHOULD-groups
        self.synonyms = synonyms

    def _analyze_word(self, word: str) -> list[str]:
        if self.analyzer is not None:
            return self.analyzer.analyze_query(word)
        return tokenize_text(word)

    def _analyze_phrase(self, body: str) -> list[tuple[str, int]]:
        if self.analyzer is not None:
            return self.analyzer.analyze_query_positions(body)
        return [(t, i) for i, t in enumerate(tokenize_text(body))]

    # -- lexer ----------------------------------------------------------
    def _lex(self, s: str):
        out = []
        i = 0
        while i < len(s):
            m = _TOKEN_RE.match(s, i)
            if not m:
                raise QueryParseError(f"cannot lex at {s[i:]!r}")
            i = m.end()
            kind = m.lastgroup if m.lastgroup else "word"
            for k in ("space", "lparen", "rparen", "plus", "minus", "phrase",
                      "regexp", "range", "word", "caret"):
                if m.group(k):
                    kind = k
                    break
            if kind == "space":
                continue
            out.append((kind, m))
        return out

    # -- parser ---------------------------------------------------------
    def parse(self, s: str) -> Query:
        toks = self._lex(s)
        q, pos = self._parse_clauses(toks, 0)
        if pos != len(toks):
            raise QueryParseError(f"unexpected token at {pos}")
        return q

    def _parse_clauses(self, toks, pos, stop_at_rparen=False):
        clauses: list[tuple[Query, Occur]] = []
        pending_occur = None
        pending_conj = None  # "AND" | "OR"
        while pos < len(toks):
            kind, m = toks[pos]
            if kind == "rparen":
                if not stop_at_rparen:
                    raise QueryParseError("unbalanced )")
                pos += 1
                break
            if kind == "plus":
                pending_occur = Occur.MUST
                pos += 1
                continue
            if kind == "minus":
                pending_occur = Occur.MUST_NOT
                pos += 1
                continue
            if kind == "word" and m.group("word") in ("AND", "&&"):
                pending_conj = "AND"
                pos += 1
                continue
            if kind == "word" and m.group("word") in ("OR", "||"):
                pending_conj = "OR"
                pos += 1
                continue
            if kind == "word" and m.group("word") in ("NOT", "!"):
                pending_occur = Occur.MUST_NOT
                pos += 1
                continue

            sub, pos = self._parse_atom(toks, pos)
            # conj effect on the LEFT clause (QueryParserBase.addClause):
            # 'a AND b' promotes the left side to MUST; with an AND default
            # operator, 'a OR b' demotes the left side to SHOULD (even an
            # explicit '+a OR b' parses as 'a OR b' in the reference).
            # Prohibited left clauses are never touched.
            if pending_conj == "AND" and clauses:
                lq, lo = clauses[-1]
                if lo != Occur.MUST_NOT:
                    clauses[-1] = (lq, Occur.MUST)
            elif pending_conj == "OR" and clauses and self.default_occur == Occur.MUST:
                lq, lo = clauses[-1]
                if lo != Occur.MUST_NOT:
                    clauses[-1] = (lq, Occur.SHOULD)
            occur = pending_occur
            if occur is None:
                if pending_conj == "AND":
                    occur = Occur.MUST
                elif pending_conj == "OR":
                    # OR yields SHOULD regardless of the default operator
                    occur = Occur.SHOULD
                else:
                    occur = self.default_occur
            if sub is not None:
                clauses.append((sub, occur))
            pending_occur = None
            pending_conj = None
        if not clauses:
            return MatchNoDocsQuery(), pos
        if len(clauses) == 1 and clauses[0][1] in (Occur.SHOULD, Occur.MUST):
            return clauses[0][0], pos
        return BooleanQuery.of(*clauses), pos

    def _parse_atom(self, toks, pos):
        kind, m = toks[pos]
        if kind == "lparen":
            q, pos = self._parse_clauses(toks, pos + 1, stop_at_rparen=True)
        elif kind == "phrase":
            body, slop = m.group("phrase_body"), int(m.group("slop") or 0)
            pairs = self._analyze_phrase(body)
            if not pairs:
                q = MatchNoDocsQuery()
            elif len(pairs) == 1:
                q = TermQuery(pairs[0][0])
            else:
                ps = tuple(p for _, p in pairs)
                q = PhraseQuery(
                    tuple(t for t, _ in pairs),
                    slop=slop,
                    # dense positions are the default — only holes need
                    # explicit positions (keeps plain phrases' equality)
                    positions=None if ps == tuple(range(len(ps))) else ps,
                )
            pos += 1
        elif kind == "regexp":
            q = RegexpQuery(m.group("regexp_body"))
            pos += 1
        elif kind == "range":
            rm = _RANGE_RE.match(m.group("range"))
            if not rm:
                raise QueryParseError(f"bad range {m.group('range')!r}")
            lo = None if rm.group("lo") == "*" else rm.group("lo").lower()
            hi = None if rm.group("hi") == "*" else rm.group("hi").lower()
            q = TermRangeQuery(
                lo, hi,
                include_lower=rm.group("lb") == "[",
                include_upper=rm.group("rb") == "]",
            )
            pos += 1
        elif kind == "word":
            q = self._word_query(m.group("word"))
            pos += 1
        else:
            raise QueryParseError(f"unexpected {kind}")
        return self._boost_suffix(toks, pos, q)

    def _boost_suffix(self, toks, pos, q):
        # ^boost suffix (handleBoost)
        if pos < len(toks) and toks[pos][0] == "caret":
            if pos + 1 >= len(toks) or toks[pos + 1][0] != "word":
                raise QueryParseError("^ must be followed by a number")
            boost = float(toks[pos + 1][1].group("word"))
            q = BoostQuery(q, boost).rewrite()
            pos += 2
        return q, pos

    def _word_query(self, word: str) -> Query:
        if ":" in word:
            field, word = word.split(":", 1)
            if not word:
                raise QueryParseError("empty term after field:")
            if field in self.keyword_fields:
                # keyword fields are exact-match filters; wildcard/fuzzy/
                # range syntax is not supported on them, so reject it loudly
                # instead of silently matching the literal string 'de*'
                if any(c in word for c in "*?~[{"):
                    raise QueryParseError(
                        f"keyword field {field!r} only supports exact values; "
                        f"got {word!r}"
                    )
                from lucene_spark.search.query import RangePredicate

                return ConstantScoreQuery(
                    RangePredicate(column=field, lower=word, upper=word),
                    boost=0.0,
                )
            if field != self.field:
                raise QueryParseError(f"unknown field {field!r}")
        fuzzy = re.fullmatch(r"(?P<base>[^~]+)~(?P<edits>[012])?", word)
        if fuzzy:
            base = self._analyze_word(fuzzy.group("base"))
            if len(base) != 1:
                raise QueryParseError(f"bad fuzzy term {word!r}")
            return FuzzyQuery(base[0], max_edits=int(fuzzy.group("edits") or 2),
                              prefix_length=self.fuzzy_prefix_length)
        if "*" in word or "?" in word:
            pat = word.lower()
            if re.fullmatch(r"[^*?]+\*", pat):
                return PrefixQuery(pat[:-1])
            return WildcardQuery(pat)
        terms = self._analyze_word(word)
        if not terms:
            return MatchNoDocsQuery()
        if self.synonyms is not None:
            from lucene_spark.search.querybuilder import element_query

            clauses = [
                element_query(span, alts)
                for span, alts in self.synonyms.elements(terms)
            ]
            if len(clauses) == 1:
                return clauses[0]
            return BooleanQuery.of(*[(c, Occur.SHOULD) for c in clauses])
        if len(terms) == 1:
            return TermQuery(terms[0])
        # one query word analyzed into several tokens -> SHOULD of terms
        return BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
