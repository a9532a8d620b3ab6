"""WordDelimiterGraphFilter — intra-word split / catenate token graph.

Transliterates ``analysis/common/.../miscellaneous/WordDelimiterIterator
.java`` (the subword boundary scanner over LOWER/UPPER/DIGIT/DELIM char
classes, :29-401) and ``WordDelimiterGraphFilter.java`` (the part
buffering, catenation runs, position-sorted graph emission,
:95-716).  Flag values match the reference exactly.

The filter is TOKEN-CONTEXT-FREE: each input token maps to a fixed list
of graph emissions ``(text, start_pos, end_pos, start_part, end_part)``
plus the number of graph positions it consumes — so the Spark lowering
is a *vocabulary-stage* transform exactly like the dictionary stemmers
(one Arrow pass over DISTINCT tokens, broadcast join back, positions by
per-doc prefix sum of widths), never per-posting Python.

Position semantics are the filter's own ``posIncAttribute`` stream (what
the indexer consumes — Lucene's IndexingChain reads position increments
and DROPS posLength): parts advance one position each, catenations span
``end_pos - start_pos``, an all-delimiter token is swallowed leaving a
position hole (``accumPosInc``), a PRESERVE_ORIGINAL token occupies
position 0 spanning every part.
"""

from __future__ import annotations

import unicodedata

# WordDelimiterGraphFilter.java:95-149 — flag bits
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256
IGNORE_KEYWORDS = 512

#: WordDelimiterGraphFilterFactory's defaults (generateWordParts=1,
#: generateNumberParts=1, splitOnCaseChange=1, splitOnNumerics=1,
#: stemEnglishPossessive=1; catenate*/preserveOriginal off)
DEFAULT_FLAGS = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)

_ALL_FLAGS = (
    DEFAULT_FLAGS
    | CATENATE_WORDS
    | CATENATE_NUMBERS
    | CATENATE_ALL
    | PRESERVE_ORIGINAL
    | IGNORE_KEYWORDS
)

# WordDelimiterIterator.java:29-39 — char classes
LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03
_DONE = -1

_CAT_MAP = {
    "Lu": UPPER,
    "Ll": LOWER,
    "Lt": ALPHA,
    "Lm": ALPHA,
    "Lo": ALPHA,
    "Mn": ALPHA,
    "Me": ALPHA,
    "Mc": ALPHA,
    "Nd": DIGIT,
    "Nl": DIGIT,
    "No": DIGIT,
    "Cs": ALPHA | DIGIT,  # surrogate: prevent splitting
}


def _char_type(ch: str) -> int:
    """WordDelimiterIterator.getType:313-360 via unicodedata categories;
    for the Latin-1 range this reproduces DEFAULT_WORD_DELIM_TABLE."""
    return _CAT_MAP.get(unicodedata.category(ch), SUBWORD_DELIM)


class _Iterator:
    """WordDelimiterIterator (``next``/``type``/``setBounds`` :146-300)."""

    def __init__(self, text: str, split_case: bool, split_num: bool, stem_poss: bool):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        self._set_bounds()

    def _t(self, i: int) -> int:
        return _char_type(self.text[i])

    def _set_bounds(self):
        while self.start_bounds < self.length and (
            self._t(self.start_bounds) & SUBWORD_DELIM
        ):
            self.start_bounds += 1
        while self.end_bounds > self.start_bounds and (
            self._t(self.end_bounds - 1) & SUBWORD_DELIM
        ):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        return (
            self.stem_poss
            and pos > 2
            and self.text[pos - 2] == "'"
            and self.text[pos - 1] in ("s", "S")
            and (self._t(pos - 3) & ALPHA) != 0
            and (pos == self.end_bounds or (self._t(pos) & SUBWORD_DELIM) != 0)
        )

    def _is_break(self, last_type: int, typ: int) -> bool:
        if (typ & last_type) != 0:
            return False
        if not self.split_case and (last_type & ALPHA) and (typ & ALPHA):
            return False
        if (last_type & UPPER) and (typ & ALPHA):
            return False  # UPPER->letter: don't split
        if not self.split_num and (
            ((last_type & ALPHA) and (typ & DIGIT))
            or ((last_type & DIGIT) and (typ & ALPHA))
        ):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = self._t(self.current)
            if not (last_type & SUBWORD_DELIM):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            typ = self._t(self.end)
            if self._is_break(last_type, typ):
                break
            last_type = typ
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        typ = self._t(self.current)
        return ALPHA if typ in (LOWER, UPPER) else typ

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return self.current == self.start_bounds and self.end == self.end_bounds - 2
        return self.current == self.start_bounds and self.end == self.end_bounds


class _Concat:
    """WordDelimiterConcatenation (.java:598-643)."""

    __slots__ = ("buffer", "start_part", "end_part", "start_pos", "type", "subword_count")

    def __init__(self):
        self.clear()

    def clear(self):
        self.buffer = ""
        self.start_part = self.end_part = self.type = self.subword_count = 0

    def append(self, text: str):
        self.buffer += text
        self.subword_count += 1

    @property
    def is_empty(self):
        return not self.buffer


def wdg_token(token: str, flags: int = DEFAULT_FLAGS, prot_words=frozenset()):
    """One input token → (emissions, width).

    ``emissions``: list of ``(text, start_pos, end_pos, start_part,
    end_part)`` in the filter's emission order (the PositionSorter:
    start_part asc, end_part DESC; a PRESERVE_ORIGINAL token pinned
    first).  ``width``: graph positions this token consumes (what the
    next token's base advances by); ``None`` emissions with width 1 means
    the token passed through unchanged.  An all-delimiter token returns
    ``([], 1)`` — a position hole (or the original under
    PRESERVE_ORIGINAL)."""
    if flags & ~_ALL_FLAGS:
        raise ValueError(f"flags contains unrecognized flag: {flags}")
    if token in prot_words:
        return [(token, 0, 1, 0, len(token))], 1
    it = _Iterator(
        token,
        bool(flags & SPLIT_ON_CASE_CHANGE),
        bool(flags & SPLIT_ON_NUMERICS),
        bool(flags & STEM_ENGLISH_POSSESSIVE),
    )
    it.next()
    term_length = len(token)
    # word of no delimiters: just return it (incrementToken:370-376)
    if it.current == 0 and it.end == term_length:
        return [(token, 0, 1, 0, term_length)], 1
    # word of simply delimiters: swallow, creating a hole (:378-386)
    if it.end == _DONE:
        if flags & PRESERVE_ORIGINAL:
            return [(token, 0, 1, 0, term_length)], 1
        return [], 1

    # bufferWordParts (:253-341)
    buffered: list = []  # [text_or_None, start_pos, end_pos, start_part, end_part]
    word_pos = 0
    concat = _Concat()
    concat_all = _Concat()
    last_concat_count = 0

    def _concatenate(c: _Concat):
        if c.is_empty:
            c.type = it.type()
            c.start_part = it.current
            c.start_pos = word_pos
        c.append(token[it.current : it.end])
        c.end_part = it.end

    def _should_concatenate(word_type: int) -> bool:
        return bool(
            ((flags & CATENATE_WORDS) and (word_type & ALPHA))
            or ((flags & CATENATE_NUMBERS) and (word_type & DIGIT))
        )

    def _should_generate(word_type: int) -> bool:
        return bool(
            ((flags & GENERATE_WORD_PARTS) and (word_type & ALPHA))
            or ((flags & GENERATE_NUMBER_PARTS) and (word_type & DIGIT))
        )

    def _flush(c: _Concat):
        nonlocal word_pos, last_concat_count
        if word_pos == c.start_pos:
            word_pos += 1
        last_concat_count = c.subword_count
        if c.subword_count != 1 or not _should_generate(c.type):
            buffered.append([c.buffer, c.start_pos, word_pos, c.start_part, c.end_part])
        c.clear()

    if flags & PRESERVE_ORIGINAL:
        buffered.append([None, 0, 1, 0, term_length])

    if it.is_single_word():
        buffered.append([None, word_pos, word_pos + 1, it.current, it.end])
        word_pos += 1
        it.next()
    else:
        while it.end != _DONE:
            word_type = it.type()
            if not concat.is_empty and (concat.type & word_type) == 0:
                _flush(concat)
            if _should_concatenate(word_type):
                _concatenate(concat)
            if flags & CATENATE_ALL:
                _concatenate(concat_all)
            if _should_generate(word_type):
                buffered.append([None, word_pos, word_pos + 1, it.current, it.end])
                word_pos += 1
            it.next()
        if not concat.is_empty:
            _flush(concat)
        if not concat_all.is_empty:
            if concat_all.subword_count > last_concat_count:
                if word_pos == concat_all.start_pos:
                    word_pos += 1
                buffered.append(
                    [
                        concat_all.buffer,
                        concat_all.start_pos,
                        word_pos,
                        concat_all.start_part,
                        concat_all.end_part,
                    ]
                )
            concat_all.clear()

    if flags & PRESERVE_ORIGINAL:
        if word_pos == 0:
            word_pos += 1
        buffered[0][2] = word_pos

    # PositionSorter (:447-476): start_part asc, end_part desc; the
    # PRESERVE_ORIGINAL head entry is excluded from the sort
    head = 1 if flags & PRESERVE_ORIGINAL else 0
    tail = sorted(buffered[head:], key=lambda b: (b[3], -b[4]))
    buffered = buffered[:head] + tail

    emissions = [
        (token[sp:ep] if text is None else text, s, e, sp, ep)
        for text, s, e, sp, ep in buffered
    ]
    width = max((s for _, s, _, _, _ in emissions), default=0) + 1
    return emissions, width


def wdg_stream(tokens, flags: int = DEFAULT_FLAGS, prot_words=frozenset()):
    """Run the filter over a whole token stream: [(term, position)] with
    the filter's exact posInc chaining (incrementToken:344-432 —
    ``accumPosInc`` holes from swallowed tokens included)."""
    out = []
    base = 0
    for tok in tokens:
        emissions, width = wdg_token(tok, flags, prot_words)
        for text, s, _e, _sp, _ep in emissions:
            out.append((text, base + s))
        base += width
    return out
