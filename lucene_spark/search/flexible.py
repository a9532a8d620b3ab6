"""Flexible query parser (StandardQueryParser dialect).

≙ ``queryparser/flexible/standard``: ``StandardQueryParser.java:107`` over
``StandardSyntaxParser.jj``.  The surface is the classic parser's (this
module subclasses it) plus the dialect's three distinctive features:

* **Interval functions** — ``fn:name(...)`` expressions anywhere a term can
  appear (StandardSyntaxParser.jj:375-680, FN tokens :148-196), one per
  ``nodes/intervalfn/*.java``: ``ordered unordered or phrase atLeast
  maxwidth maxgaps before after containing notContaining containedBy
  notContainedBy within notWithin overlapping nonOverlapping
  unorderedNoOverlaps extend wildcard fuzzyTerm`` and bare/quoted analyzed
  text (AnalyzedText.java).  Each maps to the ``search.intervals`` source
  of the same name and parses to an ``IntervalQuery``.
* **Min-should-match groups** — ``(a b c)@2`` (GroupingExpr :349-368,
  MinShouldMatchNode): the group's BooleanQuery gets
  ``minimumNumberShouldMatch = 2``.
* **Points config** — numeric fields (PointsConfig / PointQueryNode /
  PointRangeQueryNodeProcessor): with ``points_config={"length": int}``,
  ``length:[30 TO 60]`` and ``length:42`` parse to column range predicates
  (the engine's PointRangeQuery analog), as score-neutral constant-score
  clauses like the keyword fields.

``fn:wildcard`` / ``fn:fuzzyTerm`` expand against the term dictionary at
parse time (Intervals.multiterm's expansion, with its too-many-terms
IllegalStateException analog) and therefore need ``searcher=``, exactly
like the surround parser's truncations.
"""

from __future__ import annotations

import re
from dataclasses import replace

from lucene_spark.search import intervals as I
from lucene_spark.search.parser import QueryParseError, QueryParser, _TOKEN_RE
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    IntervalQuery,
    RangePredicate,
)

_STD_TOKEN_RE = re.compile(
    # the classic tokens plus a field-prefixed range (the classic lexer
    # would split `length:[30 TO 60]` at the space before TO)
    r"""
    (?P<fieldrange>[_A-Za-z][\w]*:(?P<frb_lb>[\[{])\s*(?P<frb_lo>[^\s\]}]+)
        \s+TO\s+(?P<frb_hi>[^\s\]}]+)\s*(?P<frb_rb>[\]}]))
  | """
    + _TOKEN_RE.pattern,
    re.VERBOSE,
)

# interval function name (lowercased) -> argument shape
# shapes: sources+ | number sources+ | two | source number source |
#         source number number | term [numbers]
_FN_SHAPES = {
    "ordered": "sources",
    "unordered": "sources",
    "or": "sources",
    "phrase": "sources",
    "atleast": "num_sources",
    "maxwidth": "num_source",
    "maxgaps": "num_source",
    "unorderednooverlaps": "two",
    "before": "two",
    "after": "two",
    "containing": "two",
    "notcontaining": "two",
    "containedby": "two",
    "notcontainedby": "two",
    "overlapping": "two",
    "nonoverlapping": "two",
    "within": "src_num_src",
    "notwithin": "src_num_src",
    "extend": "src_num_num",
    "wildcard": "term_nums",
    "fuzzyterm": "term_nums",
}

_DEFAULT_MAX_EXPANSIONS = 128  # Intervals.DEFAULT_MAX_EXPANSIONS


class StandardQueryParser(QueryParser):
    """Classic syntax + fn: intervals + ``(…)@N`` + numeric points."""

    def __init__(
        self,
        field: str = "text",
        default_operator: str = "OR",
        analyzer=None,
        synonyms=None,
        keyword_fields: tuple = ("role", "tool"),
        fuzzy_prefix_length: int = 0,
        points_config: dict | None = None,
        searcher=None,
    ):
        super().__init__(
            field=field,
            default_operator=default_operator,
            analyzer=analyzer,
            synonyms=synonyms,
            keyword_fields=keyword_fields,
            fuzzy_prefix_length=fuzzy_prefix_length,
        )
        # PointsConfigMap: column -> value parser (int or float)
        self.points_config = dict(points_config or {})
        self.searcher = searcher

    # -- lexer ------------------------------------------------------------
    def _lex(self, s: str):
        out = []
        i = 0
        while i < len(s):
            m = _STD_TOKEN_RE.match(s, i)
            if not m:
                raise QueryParseError(f"cannot lex at {s[i:]!r}")
            i = m.end()
            kind = "word"
            for k in (
                "space",
                "fieldrange",
                "lparen",
                "rparen",
                "plus",
                "minus",
                "phrase",
                "regexp",
                "range",
                "word",
                "caret",
            ):
                if m.group(k):
                    kind = k
                    break
            if kind == "space":
                continue
            out.append((kind, m))
        return out

    # -- atoms ------------------------------------------------------------
    def _parse_atom(self, toks, pos):
        kind, m = toks[pos]
        if kind == "fieldrange":
            return self._boost_suffix(toks, pos + 1, self._point_range(m))
        if kind == "word":
            w = m.group("word")
            fld, base = None, w
            if ":" in w and not w.startswith("fn:"):
                f, rest = w.split(":", 1)
                if rest.startswith("fn:") or rest == "fn":
                    fld, base = f, rest
            if base.startswith("fn:") or base == "fn":
                if fld is not None and fld != self.field:
                    raise QueryParseError(f"unknown field {fld!r}")
                src, pos = self._interval_fun(toks, pos, base)
                return self._boost_suffix(toks, pos, IntervalQuery(src))
            if ":" in w:
                f, rest = w.split(":", 1)
                if f in self.points_config:
                    q = self._point_exact(f, rest)
                    return self._boost_suffix(toks, pos + 1, q)
        if kind == "lparen":
            q, pos = self._parse_clauses(toks, pos + 1, stop_at_rparen=True)
            return self._group_suffix(toks, pos, q)
        return super()._parse_atom(toks, pos)

    # GroupingExpr ::= '(' Query ')' ('^' NUMBER)? ('@' NUMBER)?
    def _group_suffix(self, toks, pos, q):
        msm = None
        if pos < len(toks) and toks[pos][0] == "caret":
            if pos + 1 >= len(toks) or toks[pos + 1][0] != "word":
                raise QueryParseError("^ must be followed by a number")
            word = toks[pos + 1][1].group("word")
            if "@" in word:  # fused '^2@3'
                word, msm_s = word.split("@", 1)
                msm = self._parse_msm(msm_s)
            q = BoostQuery(q, float(word)).rewrite()
            pos += 2
        if msm is None and pos < len(toks) and toks[pos][0] == "word":
            mm = re.fullmatch(r"@(\d+)", toks[pos][1].group("word"))
            if mm:
                msm = int(mm.group(1))
                pos += 1
        if msm is not None:
            q = self._apply_msm(q, msm)
        return q, pos

    @staticmethod
    def _parse_msm(s: str) -> int:
        if not re.fullmatch(r"\d+", s):
            raise QueryParseError(f"@ must be followed by an integer, got {s!r}")
        return int(s)

    @staticmethod
    def _apply_msm(q, n: int):
        # MinShouldMatchProcessor: applies to the group's BooleanQuery
        if isinstance(q, BooleanQuery):
            return replace(q, min_should_match=n)
        if isinstance(q, BoostQuery) and isinstance(q.query, BooleanQuery):
            return replace(q, query=replace(q.query, min_should_match=n))
        raise QueryParseError(
            "minimumShouldMatch can only be applied to a boolean group "
            "(MinShouldMatchProcessor)"
        )

    # -- points (PointsConfig) ---------------------------------------------
    def _point_value(self, field: str, text: str):
        typ = self.points_config[field]
        try:
            return typ(text)
        except ValueError:
            raise QueryParseError(
                f"field {field!r} expects {typ.__name__} values, got {text!r}"
            ) from None

    def _point_exact(self, field: str, text: str):
        v = self._point_value(field, text)
        # PointQueryNodeProcessor: an exact numeric term is the degenerate
        # [v TO v] range; score-neutral like the engine's keyword fields
        return ConstantScoreQuery(
            RangePredicate(column=field, lower=v, upper=v), boost=0.0
        )

    def _point_range(self, m):
        field = m.group("fieldrange").split(":", 1)[0]
        if field == self.field:
            # the analyzed text field keeps classic term-range semantics
            from lucene_spark.search.query import TermRangeQuery

            lo = None if m.group("frb_lo") == "*" else m.group("frb_lo").lower()
            hi = None if m.group("frb_hi") == "*" else m.group("frb_hi").lower()
            return TermRangeQuery(
                lo,
                hi,
                include_lower=m.group("frb_lb") == "[",
                include_upper=m.group("frb_rb") == "]",
            )
        if field not in self.points_config:
            raise QueryParseError(
                f"range syntax on non-point field {field!r} "
                "(configure points_config)"
            )
        lo = None if m.group("frb_lo") == "*" else self._point_value(field, m.group("frb_lo"))
        hi = None if m.group("frb_hi") == "*" else self._point_value(field, m.group("frb_hi"))
        return ConstantScoreQuery(
            RangePredicate(
                column=field,
                lower=lo,
                upper=hi,
                include_lower=m.group("frb_lb") == "[",
                include_upper=m.group("frb_rb") == "]",
            ),
            boost=0.0,
        )

    # -- interval functions -------------------------------------------------
    def _interval_fun(self, toks, pos, word: str):
        """Parse one fn:…(…) expression starting at ``pos`` (whose word
        token is ``word``, beginning with 'fn:'); returns (source, pos)."""
        name = word[3:].lower()
        if word == "fn":  # 'fn:' split oddly — never produced by our lexer
            raise QueryParseError("dangling fn: prefix")
        if name == "":
            raise QueryParseError("fn: must name an interval function")
        shape = _FN_SHAPES.get(name)
        if shape is None:
            raise QueryParseError(f"unknown interval function fn:{word[3:]}")
        pos += 1
        if pos >= len(toks) or toks[pos][0] != "lparen":
            raise QueryParseError(f"fn:{name} requires (...) arguments")
        pos += 1
        if shape == "sources":
            srcs, pos = self._fn_sources(toks, pos)
            if not srcs:
                raise QueryParseError(f"fn:{name} needs at least one source")
            ctor = {
                "ordered": I.ordered,
                "unordered": I.unordered,
                "or": I.or_,
                "phrase": I.phrase,
            }[name]
            return ctor(*srcs), pos
        if shape == "num_sources":
            n, pos = self._fn_number(toks, pos, name)
            srcs, pos = self._fn_sources(toks, pos)
            if not srcs:
                raise QueryParseError("fn:atLeast needs at least one source")
            return I.atleast(n, *srcs), pos
        if shape == "num_source":
            n, pos = self._fn_number(toks, pos, name)
            src, pos = self._fn_one_source(toks, pos, name)
            pos = self._fn_rparen(toks, pos, name)
            return (I.maxwidth if name == "maxwidth" else I.maxgaps)(n, src), pos
        if shape == "two":
            a, pos = self._fn_one_source(toks, pos, name)
            b, pos = self._fn_one_source(toks, pos, name)
            pos = self._fn_rparen(toks, pos, name)
            ctor = {
                "unorderednooverlaps": I.unordered_no_overlaps,
                "before": I.before_,
                "after": I.after_,
                "containing": I.containing,
                "notcontaining": I.not_containing,
                "containedby": I.contained_by,
                "notcontainedby": I.not_contained_by,
                "overlapping": I.overlapping,
                "nonoverlapping": I.non_overlapping,
            }[name]
            return ctor(a, b), pos
        if shape == "src_num_src":
            a, pos = self._fn_one_source(toks, pos, name)
            n, pos = self._fn_number(toks, pos, name)
            b, pos = self._fn_one_source(toks, pos, name)
            pos = self._fn_rparen(toks, pos, name)
            ctor = I.within if name == "within" else I.not_within
            return ctor(a, n, b), pos
        if shape == "src_num_num":
            a, pos = self._fn_one_source(toks, pos, name)
            n1, pos = self._fn_number(toks, pos, name)
            n2, pos = self._fn_number(toks, pos, name)
            pos = self._fn_rparen(toks, pos, name)
            return I.extend(a, n1, n2), pos
        if shape == "term_nums":
            return self._fn_multiterm(toks, pos, name)
        raise AssertionError(shape)

    def _fn_sources(self, toks, pos):
        srcs = []
        while pos < len(toks) and toks[pos][0] != "rparen":
            src, pos = self._fn_one_source(toks, pos, "sources")
            srcs.append(src)
        if pos >= len(toks):
            raise QueryParseError("unterminated fn:(...) expression")
        return srcs, pos + 1  # consume rparen

    def _fn_one_source(self, toks, pos, name):
        if pos >= len(toks):
            raise QueryParseError(f"fn:{name}: missing argument")
        kind, m = toks[pos]
        if kind == "word":
            w = m.group("word")
            if w.startswith("fn:"):
                return self._interval_fun(toks, pos, w)
            return self._analyzed_text(w), pos + 1
        if kind == "phrase":
            # AnalyzedText over a quoted string: Intervals.analyzedText with
            # gaps=0, ordered=true — a phrase block over the analyzed tokens
            return self._analyzed_text(m.group("phrase_body")), pos + 1
        raise QueryParseError(f"fn:{name}: unexpected {kind} argument")

    def _analyzed_text(self, text: str):
        """AnalyzedText.toIntervalSource — Intervals.analyzedText(term,
        analyzer, field, gaps=0, ordered=true): one token → term interval,
        several → a zero-gap ordered block."""
        terms = [t for t, _ in self._analyze_phrase(text)]
        if not terms:
            raise QueryParseError(f"text {text!r} analyzes to no tokens")
        if len(terms) == 1:
            return I.Term(terms[0])
        return I.phrase(*terms)

    def _fn_number(self, toks, pos, name):
        if pos >= len(toks) or toks[pos][0] != "word":
            raise QueryParseError(f"fn:{name}: expected a number")
        w = toks[pos][1].group("word")
        if not re.fullmatch(r"-?\d+", w):
            raise QueryParseError(f"fn:{name}: expected a number, got {w!r}")
        return int(w), pos + 1

    def _fn_rparen(self, toks, pos, name):
        if pos >= len(toks) or toks[pos][0] != "rparen":
            raise QueryParseError(f"fn:{name}: expected )")
        return pos + 1

    def _fn_multiterm(self, toks, pos, name):
        """fn:wildcard(pat [maxExpansions]) / fn:fuzzyTerm(term [maxEdits]
        [maxExpansions]) — Wildcard.java / FuzzyTerm.java: the multiterm
        expands against the dictionary (Intervals.multiterm / fuzzyTerm) to
        an Or of term sources; more matches than maxExpansions raise (the
        reference's too-many-terms IllegalStateException)."""
        if pos >= len(toks):
            raise QueryParseError(f"fn:{name}: missing term")
        kind, m = toks[pos]
        if kind == "word":
            term = m.group("word")
        elif kind == "phrase":
            term = m.group("phrase_body")
        else:
            raise QueryParseError(f"fn:{name}: unexpected {kind} argument")
        pos += 1
        nums = []
        while pos < len(toks) and toks[pos][0] == "word" and re.fullmatch(
            r"\d+", toks[pos][1].group("word")
        ):
            nums.append(int(toks[pos][1].group("word")))
            pos += 1
        pos = self._fn_rparen(toks, pos, name)
        if name == "wildcard":
            max_exp = nums[0] if nums else _DEFAULT_MAX_EXPANSIONS
            terms = self._expand_wildcard(term.lower(), max_exp)
        else:
            max_edits = nums[0] if len(nums) >= 1 else 2
            max_exp = nums[1] if len(nums) >= 2 else _DEFAULT_MAX_EXPANSIONS
            terms = self._expand_fuzzy(term.lower(), max_edits, max_exp)
        if not terms:
            return I.NoMatch(f"no dictionary term matches {term!r}"), pos
        if len(terms) == 1:
            return I.Term(terms[0]), pos
        return I.or_(*terms), pos

    def _need_searcher(self, what: str):
        if self.searcher is None:
            raise QueryParseError(
                f"{what} needs a searcher to expand against the term "
                "dictionary (pass searcher=)"
            )

    def _expand_wildcard(self, pattern: str, max_expansions: int) -> list:
        self._need_searcher("fn:wildcard")
        from pyspark.sql import functions as F

        from lucene_spark.search.searcher import _wildcard_to_regex

        rows = (
            self.searcher._expand_terms(F.col("term").rlike(_wildcard_to_regex(pattern)))
            .select("term")
            .limit(max_expansions + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise QueryParseError(
                f"fn:wildcard({pattern}) matches more than "
                f"{max_expansions} terms"
            )
        return sorted(r.term for r in rows)

    def _expand_fuzzy(self, term: str, max_edits: int, max_expansions: int) -> list:
        self._need_searcher("fn:fuzzyTerm")
        from pyspark.sql import functions as F

        pred = F.abs(F.length("term") - F.lit(len(term))) <= max_edits
        pred = pred & (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
        rows = (
            self.searcher._expand_terms(pred)
            .select("term")
            .limit(max_expansions + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise QueryParseError(
                f"fn:fuzzyTerm({term}) matches more than {max_expansions} terms"
            )
        return sorted(r.term for r in rows)
