"""Snowball stemmer runtime (SnowballProgram analog).

Python port of the reference's public-domain Snowball runtime
(`analysis/common/src/java/org/tartarus/snowball/SnowballProgram.java`,
`Among.java` — BSD-licensed, (c) Dr Martin Porter / Richard Boulton /
Olly Betts; generated-code runtime of the Snowball compiler,
https://snowballstem.org/).  The cursor/limit/bra/ket string machine,
bit-set groupings, and the two-phase ``find_among`` binary search are
the EXECUTION CONTRACT of every generated Snowball stemmer: the
per-language modules in this package (``danish.py`` …) are mechanical
translations of the reference's generated ``ext/*Stemmer.java`` programs
and replay vocabulary archives produced by the reference's own compiled
stemmers exactly, so this runtime must match SnowballProgram.java
operation-for-operation (including the UTF-16-code-unit comparison
order, which for these languages coincides with code-point order).

Stemmers run at the DICTIONARY stage of the index build
(`builder.apply_dict_stemmer`): one Arrow batch over the distinct
vocabulary, never per token — the mutable-string machine below is
therefore off the per-row hot path by construction.
"""

from __future__ import annotations


class Lab(Exception):
    """Labeled-break signal for the generated modules: Java's
    ``break labN`` / ``break golabN`` becomes ``raise Lab(N)`` caught at
    the handler the translator emits for that label's block."""

    __slots__ = ("n",)

    def __init__(self, n: int):
        self.n = n


class Among:
    """One row of a Snowball ``among`` table (Among.java:40-80).

    ``s`` is the search string, ``substring_i`` the index of the longest
    proper matching substring within the same table (-1 = none),
    ``result`` the value ``find_among`` returns on a match, and
    ``method`` an optional condition routine name (resolved against the
    stemmer instance) that must return True for the row to be accepted.
    """

    __slots__ = ("s", "substring_i", "result", "method")

    def __init__(self, s: str, substring_i: int, result: int, method: str | None = None):
        self.s = s
        self.substring_i = substring_i
        self.result = result
        self.method = method


class SnowballProgram:
    """The Snowball string machine (SnowballProgram.java:40-389).

    ``current`` is held as a Python ``str`` (the Java char[] + length
    pair); all indices — cursor, limit, limit_backward, bra, ket — have
    the exact Java semantics.  Groupings are the same packed bitsets the
    generated tables ship (``char[]`` of 8-bit rows, min/max bounds).
    """

    def __init__(self):
        self.set_current("")

    # -- string state ------------------------------------------------
    def set_current(self, value: str) -> None:
        self.current = value
        self.cursor = 0
        self.limit = len(value)
        self.limit_backward = 0
        self.bra = self.cursor
        self.ket = self.limit

    def get_current(self) -> str:
        return self.current

    # -- groupings (bitset rows, SnowballProgram.java:128-176) --------
    def in_grouping(self, s, mn: int, mx: int) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if ch > mx or ch < mn:
            return False
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 0x7))) == 0:
            return False
        self.cursor += 1
        return True

    def in_grouping_b(self, s, mn: int, mx: int) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if ch > mx or ch < mn:
            return False
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 0x7))) == 0:
            return False
        self.cursor -= 1
        return True

    def out_grouping(self, s, mn: int, mx: int) -> bool:
        if self.cursor >= self.limit:
            return False
        ch = ord(self.current[self.cursor])
        if ch > mx or ch < mn:
            self.cursor += 1
            return True
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 0x7))) == 0:
            self.cursor += 1
            return True
        return False

    def out_grouping_b(self, s, mn: int, mx: int) -> bool:
        if self.cursor <= self.limit_backward:
            return False
        ch = ord(self.current[self.cursor - 1])
        if ch > mx or ch < mn:
            self.cursor -= 1
            return True
        ch -= mn
        if (s[ch >> 3] & (1 << (ch & 0x7))) == 0:
            self.cursor -= 1
            return True
        return False

    # -- literal matches (SnowballProgram.java:178-196) ----------------
    def eq_s(self, s: str) -> bool:
        if self.limit - self.cursor < len(s):
            return False
        if self.current[self.cursor : self.cursor + len(s)] != s:
            return False
        self.cursor += len(s)
        return True

    def eq_s_b(self, s: str) -> bool:
        if self.cursor - self.limit_backward < len(s):
            return False
        if self.current[self.cursor - len(s) : self.cursor] != s:
            return False
        self.cursor -= len(s)
        return True

    # -- among search (SnowballProgram.java:198-327) --------------------
    def find_among(self, v) -> int:
        i, j = 0, len(v)
        c, l = self.cursor, self.limit
        common_i = common_j = 0
        first_key_inspected = False
        cur = self.current
        while True:
            k = i + ((j - i) >> 1)
            diff = 0
            common = common_i if common_i < common_j else common_j
            w = v[k]
            ws = w.s
            for i2 in range(common, len(ws)):
                if c + common == l:
                    diff = -1
                    break
                diff = ord(cur[c + common]) - ord(ws[i2])
                if diff != 0:
                    break
                common += 1
            if diff < 0:
                j = k
                common_j = common
            else:
                i = k
                common_i = common
            if j - i <= 1:
                if i > 0 or j == i or first_key_inspected:
                    break
                first_key_inspected = True
        while True:
            w = v[i]
            if common_i >= len(w.s):
                self.cursor = c + len(w.s)
                if w.method is None:
                    return w.result
                res = getattr(self, w.method)()
                self.cursor = c + len(w.s)
                if res:
                    return w.result
            i = w.substring_i
            if i < 0:
                return 0

    def find_among_b(self, v) -> int:
        i, j = 0, len(v)
        c, lb = self.cursor, self.limit_backward
        common_i = common_j = 0
        first_key_inspected = False
        cur = self.current
        while True:
            k = i + ((j - i) >> 1)
            diff = 0
            common = common_i if common_i < common_j else common_j
            w = v[k]
            ws = w.s
            for i2 in range(len(ws) - 1 - common, -1, -1):
                if c - common == lb:
                    diff = -1
                    break
                diff = ord(cur[c - 1 - common]) - ord(ws[i2])
                if diff != 0:
                    break
                common += 1
            if diff < 0:
                j = k
                common_j = common
            else:
                i = k
                common_i = common
            if j - i <= 1:
                if i > 0 or j == i or first_key_inspected:
                    break
                first_key_inspected = True
        while True:
            w = v[i]
            if common_i >= len(w.s):
                self.cursor = c - len(w.s)
                if w.method is None:
                    return w.result
                res = getattr(self, w.method)()
                self.cursor = c - len(w.s)
                if res:
                    return w.result
            i = w.substring_i
            if i < 0:
                return 0

    # -- slicing (SnowballProgram.java:329-389) --------------------------
    def replace_s(self, c_bra: int, c_ket: int, s: str) -> int:
        adjustment = len(s) - (c_ket - c_bra)
        self.current = self.current[:c_bra] + s + self.current[c_ket:]
        self.limit += adjustment
        if self.cursor >= c_ket:
            self.cursor += adjustment
        elif self.cursor > c_bra:
            self.cursor = c_bra
        return adjustment

    def slice_from(self, s: str) -> None:
        assert 0 <= self.bra <= self.ket <= self.limit <= len(self.current)
        self.replace_s(self.bra, self.ket, s)

    def slice_del(self) -> None:
        self.slice_from("")

    def insert(self, c_bra: int, c_ket: int, s: str) -> None:
        adjustment = self.replace_s(c_bra, c_ket, s)
        if c_bra <= self.bra:
            self.bra += adjustment
        if c_bra <= self.ket:
            self.ket += adjustment

    def slice_to(self) -> str:
        """Java's slice_to(StringBuilder) — returns the slice instead of
        filling a caller-owned buffer (the generated modules assign it to
        the S_* attribute the Java kept as a field)."""
        assert 0 <= self.bra <= self.ket <= self.limit <= len(self.current)
        return self.current[self.bra : self.ket]

    def assign_to(self) -> str:
        return self.current[: self.limit]

    def stem(self) -> bool:  # pragma: no cover - overridden
        raise NotImplementedError


def make_stem_fn(stemmer_cls):
    """Wrap a stemmer class as the (str) -> str dictionary-stage function
    DICT_STEMMERS expects (SnowballFilter.java:77-89: set the token,
    run stem(), read the buffer back)."""
    inst = stemmer_cls()

    def stem(w: str) -> str:
        inst.set_current(w)
        inst.stem()
        return inst.get_current()

    return stem
