"""SimpleQueryParser: the never-throws, user-safe query dialect.

≙ ``queryparser/.../simple/SimpleQueryParser.java`` (the parser
applications expose directly to end users): ``+`` AND, ``|`` OR, ``-``
NOT, ``"..."`` phrase (``~N`` slop), trailing ``*`` prefix, ``~N`` fuzzy,
``(...)`` precedence, ``\\`` escape — each individually toggleable via
``flags``.  ANY input parses: malformed syntax degrades to the closest
sensible interpretation (unclosed parens/quotes become extraneous
characters, dangling operators are ignored), exactly like the reference's
state machine.

This is a behavioral port of SimpleQueryParser.java:160-566 (the parse
state machine IS the contract — the reference's tests assert specific
degradations for garbage input, ported in tests/test_simpleparser.py);
restructured Python, single-field engine (the reference's multi-field
weights map reduces to one createBooleanQuery per token).  Analyzed
token/phrase construction — including query-time synonyms — reuses
search.querybuilder.QueryBuilder, the analog of the reference's
QueryBuilder base class.
"""

from __future__ import annotations

from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PrefixQuery,
    Query,
)
from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

# operator flags (SimpleQueryParser.java:111-138)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_MAX_FUZZY = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WS = (" ", "\t", "\n", "\r")


class _State:
    """SimpleQueryParser.State:642-660."""

    __slots__ = ("data", "index", "length", "current_op", "previous_op", "nots", "top")

    def __init__(self, data: str, index: int, length: int):
        self.data = data
        self.index = index
        self.length = length
        self.current_op: Occur | None = None
        self.previous_op: Occur | None = None
        self.nots = 0
        self.top: Query | None = None


class SimpleQueryParser:
    """parse(text) -> Query; NEVER raises on query-text content."""

    def __init__(self, field: str = "text", flags: int = ALL_OPERATORS,
                 default_operator: str = "SHOULD", analyzer=None,
                 synonyms: QueryTimeSynonyms | None = None):
        if default_operator not in ("SHOULD", "MUST", "OR", "AND"):
            raise ValueError("default_operator must be OR/SHOULD or AND/MUST")
        self.field = field
        self.flags = flags
        self.default_occur = (
            Occur.MUST if default_operator in ("MUST", "AND") else Occur.SHOULD
        )
        self.builder = QueryBuilder(analyzer, synonyms)

    # -- factory methods (SimpleQueryParser.java:556-625, single field) --
    def _new_default_query(self, text: str) -> Query | None:
        q = self.builder.create_boolean_query(text, self.default_occur)
        return None if isinstance(q, MatchNoDocsQuery) else q

    def _new_phrase_query(self, text: str, slop: int) -> Query | None:
        q = self.builder.create_phrase_query(text, slop)
        return None if isinstance(q, MatchNoDocsQuery) else q

    def _new_fuzzy_query(self, text: str, fuzziness: int) -> Query:
        return FuzzyQuery(text.lower(), max_edits=fuzziness)

    def _new_prefix_query(self, text: str) -> Query:
        return PrefixQuery(text.lower())

    # -- the state machine (parse:160-175) ------------------------------
    def parse(self, text: str) -> Query:
        if text.strip() == "*":
            return MatchAllDocsQuery()
        state = _State(text, 0, len(text))
        self._parse_sub_query(state)
        return state.top if state.top is not None else MatchNoDocsQuery()

    def _parse_sub_query(self, state: _State) -> None:
        """parseSubQuery:177-237."""
        flags = self.flags
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and flags & PRECEDENCE_OPERATORS:
                self._consume_sub_query(state)
            elif c == ")" and flags & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous
            elif c == '"' and flags & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and flags & AND_OPERATOR:
                # ignored if an operation is already set or nothing precedes
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.MUST
                state.index += 1
            elif c == "|" and flags & OR_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.SHOULD
                state.index += 1
            elif c == "-" and flags & NOT_OPERATOR:
                # two NOTs in a row negate each other; even whitespace
                # resets the pending NOT (the `continue` skips the reset)
                state.nots += 1
                state.index += 1
                continue
            elif c in _WS and flags & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.nots = 0

    def _consume_sub_query(self, state: _State) -> None:
        """consumeSubQuery:239-296."""
        flags = self.flags
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opening one was extraneous
            state.index = start
        elif state.index == start:
            # "()": resets the pending operation
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        """consumePhrase:298-366."""
        flags = self.flags
        state.index += 1
        start = state.index
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (
                        state.length > state.index + 1
                        and state.data[state.index + 1] == "~"
                        and flags & NEAR_OPERATOR
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unclosed quote: extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase resets the operation
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        """consumeToken:368-434."""
        flags = self.flags
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and bool(flags & PREFIX_OPERATOR)
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if buf:
            if fuzzy:
                token = "".join(buf)
                fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZY)
                if fuzziness == 0:
                    branch = self._new_default_query(token)
                else:
                    branch = self._new_fuzzy_query(token, fuzziness)
            elif prefix:
                branch = self._new_prefix_query("".join(buf[:-1]))
            else:
                branch = self._new_default_query("".join(buf))
            self._build_query_tree(state, branch)

    def _build_query_tree(self, state: _State, branch: Query | None) -> None:
        """buildQueryTree:449-490 over the immutable BooleanQuery."""
        if branch is None:
            return
        if state.nots % 2 == 1:
            branch = BooleanQuery.of(
                (branch, Occur.MUST_NOT), (MatchAllDocsQuery(), Occur.SHOULD)
            )
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_occur
            if state.previous_op != state.current_op:
                # operation change: current top becomes a clause of a new
                # parent that the new operation owns
                state.top = BooleanQuery(
                    (BooleanClause(state.top, state.current_op),), 0
                )
            state.top = BooleanQuery(
                state.top.clauses + (BooleanClause(branch, state.current_op),),
                state.top.min_should_match,
            )
            state.previous_op = state.current_op
        state.current_op = None

    def _parse_fuzziness(self, state: _State) -> int:
        """parseFuzziness:497-536 — 0 on any non-numeric/negative slop."""
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        digits: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                digits.append(state.data[state.index])
        text = "".join(digits)
        if not text:
            return 2  # bare '~' = automatic fuzziness
        try:
            fuzziness = int(text)
        except ValueError:
            fuzziness = 0
        return max(fuzziness, 0)

    def _token_finished(self, state: _State) -> bool:
        """tokenFinished:538-554."""
        c = state.data[state.index]
        flags = self.flags
        return bool(
            (c == '"' and flags & PHRASE_OPERATOR)
            or (c == "|" and flags & OR_OPERATOR)
            or (c == "+" and flags & AND_OPERATOR)
            or (c == "(" and flags & PRECEDENCE_OPERATORS)
            or (c == ")" and flags & PRECEDENCE_OPERATORS)
            or (c in _WS and flags & WHITESPACE_OPERATOR)
        )
