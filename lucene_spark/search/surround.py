"""Surround query-language parser (proximity-operator dialect).

≙ the reference's ``queryparser/surround`` module: grammar
queryparser/surround/parser/QueryParser.jj, rewrite semantics
queryparser/surround/query/*.java.  The language:

* infix and prefix boolean operators — ``a AND b``, ``AND(a, b, c)``,
  ``OR``, infix-only ``NOT`` (first operand required, rest prohibited —
  NotQuery.java:31-43);
* positional operators ``W`` (ordered) and ``N`` (unordered) with an
  optional 2-99 distance — ``a 3W b`` = within 3 positions in order
  (SpanNearQuery slop = distance - 1, DistanceQuery.java:103), infix
  left-associative (``w1 W w2 W w3`` nests) or prefix n-ary
  (``2W(a, b, c)``);
* truncation — ``wor*`` (prefix, >= 3 prefix chars), ``w?rd*``
  (wildcard, >= 3 literal chars) per QueryParser.jj
  allowedSuffix/allowedTruncation;
* quoted literal terms ``"a b"`` (one term, not analyzed here) and
  quoted prefixes ``"w1"*``;
* boosts ``term^2.5`` (left-associative multiplication,
  OptionalWeights);
* operator keywords only in exact upper/lower case (``Or`` is a term —
  QueryParser.jj token defs), term juxtaposition without an operator is
  a parse error (Test01Exceptions.java: "word1 word2").

Rewrite, Spark-first:

* boolean context: AND→BooleanQuery MUST, OR→SHOULD, NOT→first MUST +
  rest MUST_NOT (SrndBooleanQuery.java / NotQuery.java); terms→TermQuery,
  truncations→Prefix/WildcardQuery (the engine expands them against the
  DISTINCT TERM DICTIONARY relation and rewrites CONSTANT_SCORE — no
  BooleanQuery blow-up, so the reference's maxBasicQueries memory guard
  is unnecessary on this path);
* distance context: terms→SpanTermQuery, OR→SpanOrQuery, nested
  W/N→SpanNearQuery; truncations expand against the term dictionary at
  parse time (SimpleTerm.visitMatchingTerms analog — needs ``searcher``;
  expansions over ``max_basic_queries`` raise TooManyBasicQueries per
  BasicQueryFactory.java, an EMPTY expansion makes the whole distance
  query MatchNoDocsQuery per DistanceQuery.getSpanNearQuery);
* AND / NOT / field-prefixed subqueries inside a distance operator are
  parse errors (DistanceQuery.distanceSubQueryNotAllowed);
* boosts inside distance operators parse but are ignored (modern Lucene
  removed span-level boosts — LUCENE-8143);
* single-field engine: an explicit ``text:`` prefix is accepted and
  transparent, any other field raises (the classic parser owns the
  keyword-column filter syntax).

Ported reference cases: tests/test_surround.py replays
Test01Exceptions / Test02Boolean / Test03Distance document-set vectors.
"""

from __future__ import annotations

import re

from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    MatchNoDocsQuery,
    Occur,
    PrefixQuery,
    Query,
    TermQuery,
    WildcardQuery,
)
from lucene_spark.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

MINIMUM_PREFIX_LENGTH = 3
MINIMUM_CHARS_IN_TRUNC = 3
DEFAULT_MAX_BASIC_QUERIES = 1024


class SurroundParseError(ValueError):
    """≙ surround/parser/ParseException.java."""


class TooManyBasicQueries(SurroundParseError):
    """≙ surround/query/TooManyBasicQueries.java — a truncation inside a
    distance operator expanded past max_basic_queries dictionary terms."""


# --------------------------------------------------------------------------
# AST (≙ surround/query/SrndQuery.java hierarchy)
class _Node:
    weight: float = 1.0


class _Term(_Node):
    def __init__(self, term: str, quoted: bool = False):
        self.term, self.quoted = term, quoted


class _Prefix(_Node):
    def __init__(self, prefix: str):
        self.prefix = prefix


class _Trunc(_Node):
    def __init__(self, pattern: str):
        self.pattern = pattern


class _Composed(_Node):
    def __init__(self, subs: list):
        self.subs = subs


class _Or(_Composed):
    pass


class _And(_Composed):
    pass


class _Not(_Composed):
    pass


class _Distance(_Composed):
    def __init__(self, subs: list, distance: int, ordered: bool, op: str):
        super().__init__(subs)
        self.distance, self.ordered, self.op = distance, ordered, op
        self._check_subs()

    def _check_subs(self) -> None:
        # DistanceQuery.distanceSubQueryNotAllowed: only terms,
        # truncations, ORs of those, and nested distance ops compose
        # under a positional operator
        for s in self.subs:
            m = _distance_sub_not_allowed(s)
            if m is not None:
                raise SurroundParseError(f"Operator {self.op}: {m}")


class _Fields(_Node):
    def __init__(self, sub: _Node, fields: list):
        self.sub, self.fields = sub, fields


def _distance_sub_not_allowed(node: _Node):
    if isinstance(node, (_Term, _Prefix, _Trunc)):
        return None
    if isinstance(node, _Or):
        for s in node.subs:
            m = _distance_sub_not_allowed(s)
            if m is not None:
                return m
        return None
    if isinstance(node, _Distance):
        return None  # validated on construction
    return f"subquery not allowed: {type(node).__name__}"


# --------------------------------------------------------------------------
# Tokenizer (QueryParser.jj token definitions)
_TERM_CHAR = r'[^ \t\n\r,?*():^"]'
_TERM_RUN = re.compile(rf"(?:{_TERM_CHAR}|[*?])+")
_SUFFIX_RE = re.compile(rf"{_TERM_CHAR}+\*$")
_TRUNC_RE = re.compile(rf"{_TERM_CHAR}+[*?]+(?:{_TERM_CHAR}|[*?])*$")
_DIST_OP_RE = re.compile(r"^(?:([2-9][0-9]?|1[0-9]))?([WwNn])$")
_NUMBER_RE = re.compile(r"\d+(?:\.\d+)?")
_TRUNCQUOTED_RE = re.compile(r'"[^"]+"\*')
_QUOTED_RE = re.compile(r'"(?:[^"\\]|\\[\\"])+"')
_KEYWORDS = {"OR": "OR", "or": "OR", "AND": "AND", "and": "AND",
             "NOT": "NOT", "not": "NOT"}


def _tokenize(s: str) -> list:
    toks, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c in " \t\n\r":
            i += 1
            continue
        if c in "(),:":
            toks.append(({"(": "LPAREN", ")": "RPAREN", ",": "COMMA",
                          ":": "COLON"}[c], c))
            i += 1
            continue
        if c == "^":
            # Boost lexical state: a NUMBER must follow immediately
            m = _NUMBER_RE.match(s, i + 1)
            if not m:
                raise SurroundParseError(f"^ must be followed by a number at {i}")
            toks.append(("CARAT", "^"))
            toks.append(("NUMBER", m.group(0)))
            i = m.end()
            continue
        if c == '"':
            mt = _TRUNCQUOTED_RE.match(s, i)
            mq = _QUOTED_RE.match(s, i)
            # JavaCC maximal munch: the longer match wins
            if mt and (not mq or mt.end() >= mq.end()):
                toks.append(("TRUNCQUOTED", mt.group(0)))
                i = mt.end()
                continue
            if mq:
                toks.append(("QUOTED", mq.group(0)))
                i = mq.end()
                continue
            raise SurroundParseError(f"unterminated quote at {i}")
        m = _TERM_RUN.match(s, i)
        if not m or s[i] in "*?":
            raise SurroundParseError(f"cannot lex at {s[i:]!r}")
        img = m.group(0)
        i = m.end()
        if "*" in img or "?" in img:
            if _SUFFIX_RE.fullmatch(img) and img.count("*") == 1 and "?" not in img:
                toks.append(("SUFFIXTERM", img))
            elif _TRUNC_RE.fullmatch(img):
                toks.append(("TRUNCTERM", img))
            else:
                raise SurroundParseError(f"cannot lex term {img!r}")
            continue
        kw = _KEYWORDS.get(img)
        if kw:
            toks.append((kw, img))
            continue
        dm = _DIST_OP_RE.match(img)
        if dm:
            kind = "W" if dm.group(2) in "Ww" else "N"
            toks.append((kind, img))
            continue
        toks.append(("TERM", img))
    toks.append(("EOF", ""))
    return toks


# --------------------------------------------------------------------------
# Recursive-descent parser (one method per QueryParser.jj production)
class _Parser:
    def __init__(self, toks: list):
        self.toks, self.pos = toks, 0

    def peek(self, ahead: int = 0) -> str:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)][0]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str):
        k, img = self.next()
        if k != kind:
            raise SurroundParseError(f"expected {kind}, got {k} {img!r}")
        return img

    def top(self) -> _Node:
        q = self.fields_query()
        self.expect("EOF")
        return q

    def fields_query(self) -> _Node:
        fields = []
        # LOOKAHEAD(2) to the colon
        while self.peek() == "TERM" and self.peek(1) == "COLON":
            fields.append(self.next()[1])
            self.next()
        q = self.or_query()
        return _Fields(q, fields) if fields else q

    def or_query(self) -> _Node:
        q = self.and_query()
        subs = None
        while self.peek() == "OR":
            self.next()
            if subs is None:
                subs = [q]
            subs.append(self.and_query())
        return q if subs is None else _Or(subs)

    def and_query(self) -> _Node:
        q = self.not_query()
        subs = None
        while self.peek() == "AND":
            self.next()
            if subs is None:
                subs = [q]
            subs.append(self.not_query())
        return q if subs is None else _And(subs)

    def not_query(self) -> _Node:
        q = self.n_query()
        subs = None
        while self.peek() == "NOT":
            self.next()
            if subs is None:
                subs = [q]
            subs.append(self.n_query())
        return q if subs is None else _Not(subs)

    def n_query(self) -> _Node:
        q = self.w_query()
        while self.peek() == "N":
            _, img = self.next()
            q = _Distance([q, self.w_query()], _op_distance(img), False, img)
        return q

    def w_query(self) -> _Node:
        q = self.primary()
        while self.peek() == "W":
            _, img = self.next()
            q = _Distance([q, self.primary()], _op_distance(img), True, img)
        return q

    def primary(self) -> _Node:
        k = self.peek()
        if k == "LPAREN":
            self.next()
            q = self.fields_query()
            self.expect("RPAREN")
        elif k in ("OR", "AND", "W", "N"):
            q = self.prefix_operator()
        else:
            q = self.simple_term()
        self.optional_weights(q)
        return q

    def prefix_operator(self) -> _Node:
        k, img = self.next()
        subs = self.fields_query_list()
        if k == "OR":
            return _Or(subs)
        if k == "AND":
            return _And(subs)
        return _Distance(subs, _op_distance(img), k == "W", img)

    def fields_query_list(self) -> list:
        self.expect("LPAREN")
        subs = [self.fields_query()]
        self.expect("COMMA")
        subs.append(self.fields_query())
        while self.peek() == "COMMA":
            self.next()
            subs.append(self.fields_query())
        self.expect("RPAREN")
        return subs

    def simple_term(self) -> _Node:
        k, img = self.next()
        if k == "TERM":
            return _Term(img)
        if k == "QUOTED":
            body = img[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            return _Term(body, quoted=True)
        if k == "SUFFIXTERM":
            if len(img) - 1 < MINIMUM_PREFIX_LENGTH:
                raise SurroundParseError(f"Too unrestrictive truncation: {img}")
            return _Prefix(img[:-1])
        if k == "TRUNCTERM":
            if sum(ch not in "*?" for ch in img) < MINIMUM_CHARS_IN_TRUNC:
                raise SurroundParseError(f"Too unrestrictive truncation: {img}")
            return _Trunc(img)
        if k == "TRUNCQUOTED":
            if len(img) - 3 < MINIMUM_PREFIX_LENGTH:
                raise SurroundParseError(f"Too unrestrictive truncation: {img}")
            return _Prefix(img[1:-2])
        raise SurroundParseError(f"unexpected {k} {img!r}")

    def optional_weights(self, q: _Node) -> None:
        while self.peek() == "CARAT":
            self.next()
            w = float(self.expect("NUMBER"))
            if w <= 0.0:
                raise SurroundParseError(f"Cannot handle boost value: {w}")
            q.weight = w * q.weight  # left associative


def _op_distance(img: str) -> int:
    return 1 if len(img) == 1 else int(img[:-1])


# --------------------------------------------------------------------------
# Rewrite to the engine query tree
_EMPTY = object()  # a distance sub-clause whose expansion matched no terms


class SurroundQueryParser:
    """``parse(text) -> Query``.  Pass ``searcher`` (an IndexSearcher) to
    enable truncations inside W/N operators — they expand against the
    index's term dictionary at parse time, exactly where the reference
    resolves SimpleTerm.visitMatchingTerms against the IndexReader."""

    def __init__(
        self,
        searcher=None,
        max_basic_queries: int = DEFAULT_MAX_BASIC_QUERIES,
        default_field: str = "text",
    ):
        self.searcher = searcher
        self.max_basic_queries = max_basic_queries
        self.default_field = default_field

    def parse(self, text: str) -> Query:
        ast = _Parser(_tokenize(text)).top()
        return self._boolean(ast)

    # -- boolean context ---------------------------------------------------
    def _boolean(self, node: _Node) -> Query:
        q = self._boolean_noweight(node)
        if node.weight != 1.0:
            q = BoostQuery(q, node.weight)
        return q

    def _boolean_noweight(self, node: _Node) -> Query:
        if isinstance(node, _Fields):
            self._check_fields(node)
            return self._boolean(node.sub)
        if isinstance(node, _Term):
            return TermQuery(node.term)
        if isinstance(node, _Prefix):
            return PrefixQuery(node.prefix)
        if isinstance(node, _Trunc):
            return WildcardQuery(node.pattern)
        if isinstance(node, _Or):
            return BooleanQuery.of(
                *[(self._boolean(s), Occur.SHOULD) for s in node.subs]
            )
        if isinstance(node, _And):
            return BooleanQuery.of(
                *[(self._boolean(s), Occur.MUST) for s in node.subs]
            )
        if isinstance(node, _Not):
            clauses = [(self._boolean(node.subs[0]), Occur.MUST)]
            clauses += [
                (self._boolean(s), Occur.MUST_NOT) for s in node.subs[1:]
            ]
            return BooleanQuery.of(*clauses)
        if isinstance(node, _Distance):
            sq = self._span(node)
            return MatchNoDocsQuery() if sq is _EMPTY else sq.rewrite()
        raise SurroundParseError(f"cannot rewrite {type(node).__name__}")

    def _check_fields(self, node: _Fields) -> None:
        for f in node.fields:
            if f != self.default_field:
                raise SurroundParseError(
                    f"unsupported field {f!r} (single-field engine; use the "
                    "classic QueryParser for keyword columns)"
                )

    # -- distance (span) context --------------------------------------------
    def _span(self, node: _Node):
        """A SpanQuery, or _EMPTY when the node's term expansion is empty
        (DistanceQuery.getSpanNearQuery returns MatchNoDocsQuery then)."""
        if isinstance(node, _Term):
            return SpanTermQuery(node.term)
        if isinstance(node, (_Prefix, _Trunc)):
            terms = self._expand(node)
            if not terms:
                return _EMPTY
            if len(terms) == 1:
                return SpanTermQuery(terms[0])
            return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))
        if isinstance(node, _Or):
            subs = [self._span(s) for s in node.subs]
            subs = [s for s in subs if s is not _EMPTY]
            if not subs:
                return _EMPTY
            if len(subs) == 1:
                return subs[0]
            return SpanOrQuery(tuple(subs))
        if isinstance(node, _Distance):
            subs = [self._span(s) for s in node.subs]
            if any(s is _EMPTY for s in subs):
                return _EMPTY
            return SpanNearQuery(
                tuple(subs), slop=node.distance - 1, in_order=node.ordered
            )
        # unreachable after _Distance._check_subs, kept as a guard
        raise SurroundParseError(
            f"subquery not allowed in distance operator: {type(node).__name__}"
        )

    def _expand(self, node) -> list:
        if self.searcher is None:
            raise SurroundParseError(
                "truncation inside a distance operator needs a searcher "
                "to expand against the term dictionary"
            )
        from pyspark.sql import functions as F

        if isinstance(node, _Prefix):
            pred = F.col("term").startswith(node.prefix)
        else:
            from lucene_spark.search.searcher import _wildcard_to_regex

            pred = F.col("term").rlike(_wildcard_to_regex(node.pattern))
        rows = (
            self.searcher._expand_terms(pred)
            .select("term")
            .limit(self.max_basic_queries + 1)
            .collect()
        )
        if len(rows) > self.max_basic_queries:
            raise TooManyBasicQueries(
                f"more than {self.max_basic_queries} terms match "
                f"{node.pattern if isinstance(node, _Trunc) else node.prefix + '*'!r}"
            )
        return sorted(r.term for r in rows)
