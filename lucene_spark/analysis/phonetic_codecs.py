"""The full PhoneticFilterFactory encoder registry, in Python.

≙ the reference's phonetic analysis module: PhoneticFilterFactory.java:48
registers "DoubleMetaphone", "Metaphone", "Soundex", "RefinedSoundex",
"Caverphone" (v2.0), "ColognePhonetic" and "Nysiis" — every one a thin
wrapper over Apache Commons Codec — and the module additionally ships
DoubleMetaphoneFilter.java and DaitchMokotoffSoundexFilter.java.

These are faithful transliterations of the commons-codec 1.19 encoders
(public Apache-2.0 algorithms).  Parity evidence: every function here
replays lucene_spark/analysis/data/phonetic_vectors.tsv.gz — 23k words
(testdata vocabulary + name/edge sets + seeded random strings) encoded
by the REAL commons-codec 1.19 via the JVM (scripts/dev/
gen_phonetic_vectors.py) — with exact string equality
(tests/test_phonetic_codecs.py).

Execution model: these run at the DICTIONARY stage only — once per
distinct vocabulary term inside an Arrow batch (same scale posture as
the KStem dictionary stemmer), never per posting.  Soundex itself stays
pure column algebra in phonetic.py.
"""

from __future__ import annotations

import functools
import gzip
import os
import re

# ---------------------------------------------------------------------------
# Metaphone (commons-codec language/Metaphone.java, Lawrence Philips 1990)
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS = "AEIOU"


def metaphone(txt: str, max_code_len: int = 4) -> str:
    """Classic Metaphone with commons-codec semantics (maxCodeLen=4)."""
    if not txt:
        return ""
    if len(txt) == 1:
        return txt.upper()
    inwd = txt.upper()

    # handle initial 2 characters
    first, second = inwd[0], inwd[1]
    if first in "KGP":
        local = inwd[1:] if second == "N" else inwd
    elif first == "A":
        local = inwd[1:] if second == "E" else inwd
    elif first == "W":
        if second == "R":
            local = inwd[1:]
        elif second == "H":
            local = "W" + inwd[2:]
        else:
            local = inwd
    elif first == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd

    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_last(i: int) -> bool:
        return i == wdsz - 1

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, s: str) -> bool:
        return local[i : i + len(s)] == s and i + len(s) <= wdsz

    def vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (is_last(n) and prev_is(n, "M")):
                code.append("B")
        elif symb == "C":
            if (
                prev_is(n, "S")
                and not is_last(n)
                and local[n + 1] in _FRONTV
            ):
                pass  # SCE/SCI/SCY: silent
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and local[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and vowel(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (
                not is_last(n + 1)
                and next_is(n, "G")
                and local[n + 2] in _FRONTV
            ):
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            if is_last(n + 1) and next_is(n, "H"):
                pass
            elif not is_last(n + 1) and next_is(n, "H") and not vowel(n + 2):
                pass
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                pass
            else:
                hard = prev_is(n, "G")
                if not is_last(n) and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if is_last(n):
                pass
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n > 0:
                if not prev_is(n, "C"):
                    code.append("K")
            else:
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not is_last(n) and vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1

    return "".join(code)[:max_code_len]


# ---------------------------------------------------------------------------
# Double Metaphone (commons-codec language/DoubleMetaphone.java,
# Lawrence Philips 2000)
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def append(self, pri: str, alt: str | None = None) -> None:
        self.append_primary(pri)
        self.append_alternate(pri if alt is None else alt)

    def append_primary(self, s: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def double_metaphone(
    value: str, max_code_len: int = 4, alternate: bool = False
) -> str:
    """Double Metaphone, primary or alternate encoding."""
    value = (value or "").strip().upper()
    if not value:
        return ""

    def char_at(i: int) -> str:
        return value[i] if 0 <= i < len(value) else "\0"

    def contains(start: int, length: int, *criteria: str) -> bool:
        if start < 0 or start + length > len(value):
            return False
        return value[start : start + length] in criteria

    def is_vowel(c: str) -> bool:
        return c in _DM_VOWELS

    slavo = (
        "W" in value or "K" in value or "CZ" in value or "WITZ" in value
    )
    index = 1 if value.startswith(_SILENT_START) else 0
    r = _DMResult(max_code_len)

    def handle_c(index: int) -> int:
        def condition_c0() -> bool:
            if contains(index, 4, "CHIA"):
                return True
            if index <= 1:
                return False
            if is_vowel(char_at(index - 2)):
                return False
            if not contains(index - 1, 3, "ACH"):
                return False
            c = char_at(index + 2)
            return (c != "I" and c != "E") or contains(
                index - 2, 6, "BACHER", "MACHER"
            )

        if condition_c0():
            r.append("K")
            return index + 2
        if index == 0 and contains(index, 6, "CAESAR"):
            r.append("S")
            return index + 2
        if contains(index, 2, "CH"):
            return handle_ch(index)
        if contains(index, 2, "CZ") and not contains(index - 2, 4, "WICZ"):
            r.append("S", "X")
            return index + 2
        if contains(index + 1, 3, "CIA"):
            r.append("X")
            return index + 3
        if contains(index, 2, "CC") and not (
            index == 1 and char_at(0) == "M"
        ):
            return handle_cc(index)
        if contains(index, 2, "CK", "CG", "CQ"):
            r.append("K")
            return index + 2
        if contains(index, 2, "CI", "CE", "CY"):
            if contains(index, 3, "CIO", "CIE", "CIA"):
                r.append("S", "X")
            else:
                r.append("S")
            return index + 2
        r.append("K")
        if contains(index + 1, 2, " C", " Q", " G"):
            return index + 3
        if contains(index + 1, 1, "C", "K", "Q") and not contains(
            index + 1, 2, "CE", "CI"
        ):
            return index + 2
        return index + 1

    def handle_ch(index: int) -> int:
        if index > 0 and contains(index, 4, "CHAE"):
            r.append("K", "X")
            return index + 2

        def condition_ch0() -> bool:
            if index != 0:
                return False
            if not contains(index + 1, 5, "HARAC", "HARIS") and not contains(
                index + 1, 3, "HOR", "HYM", "HIA", "HEM"
            ):
                return False
            return not contains(0, 5, "CHORE")

        def condition_ch1() -> bool:
            return (
                contains(0, 4, "VAN ", "VON ")
                or contains(0, 3, "SCH")
                or contains(index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                or contains(index + 2, 1, "T", "S")
                or (
                    (
                        contains(index - 1, 1, "A", "O", "U", "E")
                        or index == 0
                    )
                    and (
                        contains(index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                        or index + 1 == len(value) - 1
                    )
                )
            )

        if condition_ch0():
            r.append("K")
            return index + 2
        if condition_ch1():
            r.append("K")
            return index + 2
        if index > 0:
            if contains(0, 2, "MC"):
                r.append("K")
            else:
                r.append("X", "K")
        else:
            r.append("X")
        return index + 2

    def handle_cc(index: int) -> int:
        if contains(index + 2, 1, "I", "E", "H") and not contains(
            index + 2, 2, "HU"
        ):
            if (index == 1 and char_at(index - 1) == "A") or contains(
                index - 1, 5, "UCCEE", "UCCES"
            ):
                r.append("KS")
            else:
                r.append("X")
            return index + 3
        r.append("K")
        return index + 2

    def handle_d(index: int) -> int:
        if contains(index, 2, "DG"):
            if contains(index + 2, 1, "I", "E", "Y"):
                r.append("J")
                return index + 3
            r.append("TK")
            return index + 2
        if contains(index, 2, "DT", "DD"):
            r.append("T")
            return index + 2
        r.append("T")
        return index + 1

    def handle_g(index: int) -> int:
        if char_at(index + 1) == "H":
            return handle_gh(index)
        if char_at(index + 1) == "N":
            if index == 1 and is_vowel(char_at(0)) and not slavo:
                r.append("KN", "N")
            elif (
                not contains(index + 2, 2, "EY")
                and char_at(index + 1) != "Y"
                and not slavo
            ):
                r.append("N", "KN")
            else:
                r.append("KN")
            return index + 2
        if contains(index + 1, 2, "LI") and not slavo:
            r.append("KL", "L")
            return index + 2
        if index == 0 and (
            char_at(index + 1) == "Y"
            or contains(index + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
        ):
            r.append("K", "J")
            return index + 2
        if (
            contains(index + 1, 2, "ER") or char_at(index + 1) == "Y"
        ) and not contains(0, 6, "DANGER", "RANGER", "MANGER") and not contains(
            index - 1, 1, "E", "I"
        ) and not contains(index - 1, 3, "RGY", "OGY"):
            r.append("K", "J")
            return index + 2
        if contains(index + 1, 1, "E", "I", "Y") or contains(
            index - 1, 4, "AGGI", "OGGI"
        ):
            if (
                contains(0, 4, "VAN ", "VON ")
                or contains(0, 3, "SCH")
                or contains(index + 1, 2, "ET")
            ):
                r.append("K")
            elif contains(index + 1, 3, "IER"):
                r.append("J")
            else:
                r.append("J", "K")
            return index + 2
        if char_at(index + 1) == "G":
            r.append("K")
            return index + 2
        r.append("K")
        return index + 1

    def handle_gh(index: int) -> int:
        if index > 0 and not is_vowel(char_at(index - 1)):
            r.append("K")
            return index + 2
        if index == 0:
            if char_at(index + 2) == "I":
                r.append("J")
            else:
                r.append("K")
            return index + 2
        if (
            (index > 1 and contains(index - 2, 1, "B", "H", "D"))
            or (index > 2 and contains(index - 3, 1, "B", "H", "D"))
            or (index > 3 and contains(index - 4, 1, "B", "H"))
        ):
            return index + 2
        if (
            index > 2
            and char_at(index - 1) == "U"
            and contains(index - 3, 1, "C", "G", "L", "R", "T")
        ):
            r.append("F")
        elif index > 0 and char_at(index - 1) != "I":
            r.append("K")
        return index + 2

    def handle_h(index: int) -> int:
        if (index == 0 or is_vowel(char_at(index - 1))) and is_vowel(
            char_at(index + 1)
        ):
            r.append("H")
            return index + 2
        return index + 1

    def handle_j(index: int) -> int:
        if contains(index, 4, "JOSE") or contains(0, 4, "SAN "):
            if (
                index == 0 and char_at(index + 4) == " "
            ) or len(value) == 4 or contains(0, 4, "SAN "):
                r.append("H")
            else:
                r.append("J", "H")
            return index + 1
        if index == 0 and not contains(index, 4, "JOSE"):
            r.append("J", "A")
        elif (
            is_vowel(char_at(index - 1))
            and not slavo
            and (char_at(index + 1) == "A" or char_at(index + 1) == "O")
        ):
            r.append("J", "H")
        elif index == len(value) - 1:
            r.append("J", " ")
        elif not contains(index + 1, 1, *_L_T_K_S_N_M_B_Z) and not contains(
            index - 1, 1, "S", "K", "L"
        ):
            r.append("J")
        return index + 2 if char_at(index + 1) == "J" else index + 1

    def handle_l(index: int) -> int:
        def condition_l0() -> bool:
            if index == len(value) - 3 and contains(
                index - 1, 4, "ILLO", "ILLA", "ALLE"
            ):
                return True
            return (
                contains(len(value) - 2, 2, "AS", "OS")
                or contains(len(value) - 1, 1, "A", "O")
            ) and contains(index - 1, 4, "ALLE")

        if char_at(index + 1) == "L":
            if condition_l0():
                r.append_primary("L")
            else:
                r.append("L")
            return index + 2
        r.append("L")
        return index + 1

    def condition_m0(index: int) -> bool:
        if char_at(index + 1) == "M":
            return True
        return contains(index - 1, 3, "UMB") and (
            index + 1 == len(value) - 1 or contains(index + 2, 2, "ER")
        )

    def handle_p(index: int) -> int:
        if char_at(index + 1) == "H":
            r.append("F")
            return index + 2
        r.append("P")
        return index + 2 if contains(index + 1, 1, "P", "B") else index + 1

    def handle_r(index: int) -> int:
        if (
            index == len(value) - 1
            and not slavo
            and contains(index - 2, 2, "IE")
            and not contains(index - 4, 2, "ME", "MA")
        ):
            r.append_alternate("R")
        else:
            r.append("R")
        return index + 2 if char_at(index + 1) == "R" else index + 1

    def handle_s(index: int) -> int:
        if contains(index - 1, 3, "ISL", "YSL"):
            return index + 1
        if index == 0 and contains(index, 5, "SUGAR"):
            r.append("X", "S")
            return index + 1
        if contains(index, 2, "SH"):
            if contains(index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                r.append("S")
            else:
                r.append("X")
            return index + 2
        if contains(index, 3, "SIO", "SIA") or contains(index, 4, "SIAN"):
            if slavo:
                r.append("S")
            else:
                r.append("S", "X")
            return index + 3
        if (
            index == 0 and contains(index + 1, 1, "M", "N", "L", "W")
        ) or contains(index + 1, 1, "Z"):
            r.append("S", "X")
            return index + 2 if contains(index + 1, 1, "Z") else index + 1
        if contains(index, 2, "SC"):
            return handle_sc(index)
        if index == len(value) - 1 and contains(index - 2, 2, "AI", "OI"):
            r.append_alternate("S")
        else:
            r.append("S")
        return index + 2 if contains(index + 1, 1, "S", "Z") else index + 1

    def handle_sc(index: int) -> int:
        if char_at(index + 2) == "H":
            if contains(index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                if contains(index + 3, 2, "ER", "EN"):
                    r.append("X", "SK")
                else:
                    r.append("SK")
            else:
                if index == 0 and not is_vowel(char_at(3)) and char_at(3) != "W":
                    r.append("X", "S")
                else:
                    r.append("X")
            return index + 3
        if contains(index + 2, 1, "I", "E", "Y"):
            r.append("S")
            return index + 3
        r.append("SK")
        return index + 3

    def handle_t(index: int) -> int:
        if contains(index, 4, "TION"):
            r.append("X")
            return index + 3
        if contains(index, 3, "TIA", "TCH"):
            r.append("X")
            return index + 3
        if contains(index, 2, "TH") or contains(index, 3, "TTH"):
            if (
                contains(index + 2, 2, "OM", "AM")
                or contains(0, 4, "VAN ", "VON ")
                or contains(0, 3, "SCH")
            ):
                r.append("T")
            else:
                r.append("0", "T")
            return index + 2
        r.append("T")
        return index + 2 if contains(index + 1, 1, "T", "D") else index + 1

    def handle_w(index: int) -> int:
        if contains(index, 2, "WR"):
            r.append("R")
            return index + 2
        if index == 0 and (
            is_vowel(char_at(index + 1)) or contains(index, 2, "WH")
        ):
            if is_vowel(char_at(index + 1)):
                r.append("A", "F")
            else:
                r.append("A")
            return index + 1
        if (
            (index == len(value) - 1 and is_vowel(char_at(index - 1)))
            or contains(index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or contains(0, 3, "SCH")
        ):
            r.append_alternate("F")
            return index + 1
        if contains(index, 4, "WICZ", "WITZ"):
            r.append("TS", "FX")
            return index + 4
        return index + 1

    def handle_x(index: int) -> int:
        if index == 0:
            r.append("S")
            return index + 1
        if not (
            index == len(value) - 1
            and (
                contains(index - 3, 3, "IAU", "EAU")
                or contains(index - 2, 2, "AU", "OU")
            )
        ):
            r.append("KS")
        return index + 2 if contains(index + 1, 1, "C", "X") else index + 1

    def handle_z(index: int) -> int:
        if char_at(index + 1) == "H":
            r.append("J")
            return index + 2
        if contains(index + 1, 2, "ZO", "ZI", "ZA") or (
            slavo and index > 0 and char_at(index - 1) != "T"
        ):
            r.append("S", "TS")
        else:
            r.append("S")
        return index + 2 if char_at(index + 1) == "Z" else index + 1

    while not r.complete() and index <= len(value) - 1:
        c = value[index]
        if c in _DM_VOWELS:
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if char_at(index + 1) == "B" else 1
        elif c == "Ç":
            r.append("S")
            index += 1
        elif c == "C":
            index = handle_c(index)
        elif c == "D":
            index = handle_d(index)
        elif c == "F":
            r.append("F")
            index += 2 if char_at(index + 1) == "F" else 1
        elif c == "G":
            index = handle_g(index)
        elif c == "H":
            index = handle_h(index)
        elif c == "J":
            index = handle_j(index)
        elif c == "K":
            r.append("K")
            index += 2 if char_at(index + 1) == "K" else 1
        elif c == "L":
            index = handle_l(index)
        elif c == "M":
            r.append("M")
            index += 2 if condition_m0(index) else 1
        elif c == "N":
            r.append("N")
            index += 2 if char_at(index + 1) == "N" else 1
        elif c == "Ñ":
            r.append("N")
            index += 1
        elif c == "P":
            index = handle_p(index)
        elif c == "Q":
            r.append("K")
            index += 2 if char_at(index + 1) == "Q" else 1
        elif c == "R":
            index = handle_r(index)
        elif c == "S":
            index = handle_s(index)
        elif c == "T":
            index = handle_t(index)
        elif c == "V":
            r.append("F")
            index += 2 if char_at(index + 1) == "V" else 1
        elif c == "W":
            index = handle_w(index)
        elif c == "X":
            index = handle_x(index)
        elif c == "Z":
            index = handle_z(index)
        else:
            index += 1

    out = r.alternate if alternate else r.primary
    return "".join(out)


# ---------------------------------------------------------------------------
# Refined Soundex (commons-codec language/RefinedSoundex.java)
# ---------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    t = "".join(c for c in word if c.isalpha()).upper()
    if not t:
        return t
    out = [t[0]]
    last = None
    for c in t:
        i = ord(c) - 65
        code = _REFINED_MAP[i] if 0 <= i < 26 else None
        if code == last:
            continue
        if code is not None:
            out.append(code)
        last = code
    return "".join(out)


# ---------------------------------------------------------------------------
# Caverphone 2.0 (commons-codec language/Caverphone2.java; David Hood 2004)
# ---------------------------------------------------------------------------

_CAVERPHONE_STEPS: list[tuple[str, str]] = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]


def caverphone2(word: str) -> str:
    txt = re.sub("[^a-z]", "", (word or "").lower())
    for pat, rep in _CAVERPHONE_STEPS:
        txt = re.sub(pat, rep, txt)
    return (txt + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# NYSIIS (commons-codec language/Nysiis.java; strict=true default)
# ---------------------------------------------------------------------------

_NY_VOWELS = "AEIOU"


def _nysiis_clean(word: str) -> str:
    return "".join(c for c in word if c.isalpha()).upper()


def nysiis(word: str, strict: bool = True) -> str:
    s = _nysiis_clean(word)
    if not s:
        return ""
    # 1. initial-letter transcodes
    s = re.sub("^MAC", "MCC", s)
    s = re.sub("^KN", "NN", s)
    s = re.sub("^K", "C", s)
    s = re.sub("^PH", "FF", s)
    s = re.sub("^PF", "FF", s)
    s = re.sub("^SCH", "SSS", s)
    # 2. terminal-letter transcodes
    s = re.sub("(EE|IE)$", "Y", s)
    s = re.sub("(DT|RT|RD|NT|ND)$", "D", s)
    # 3. first character of key = first character of name
    key = [s[0]]
    chars = list(s)
    n = len(chars)
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        aft = chars[i + 2] if i < n - 2 else " "
        prev = chars[i - 1]
        curr = chars[i]
        if curr == "E" and nxt == "V":
            t = "AF"
        elif curr in _NY_VOWELS:
            t = "A"
        elif curr == "Q":
            t = "G"
        elif curr == "Z":
            t = "S"
        elif curr == "M":
            t = "N"
        elif curr == "K":
            t = "N" if nxt == "N" else "C"
        elif curr == "S" and nxt == "C" and aft == "H":
            t = "SSS"
        elif curr == "P" and nxt == "H":
            t = "FF"
        elif curr == "H" and (prev not in _NY_VOWELS or nxt not in _NY_VOWELS):
            t = prev
        elif curr == "W" and prev in _NY_VOWELS:
            t = prev
        else:
            t = curr
        # write the transcode back (multi-char codes overwrite lookahead)
        for j, tc in enumerate(t):
            if i + j < n:
                chars[i + j] = tc
        if chars[i] != key[-1]:
            key.append(chars[i])
    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            key[-2:] = ["Y"]
        if key and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Cologne Phonetic (commons-codec language/ColognePhonetic.java;
# Postel 1969, "Kölner Phonetik")
# ---------------------------------------------------------------------------

def cologne_phonetic(word: str) -> str:
    """Kölner Phonetik with commons-codec context semantics (probed
    against the real encoder, tests replay the 23k archive): the NEXT
    context is the raw adjacent character (a digit shadows it), the PREV
    context for the C/X special cases is the previous LETTER (non-letters
    transparent), C takes its word-onset rule when no letter precedes,
    'H' emits nothing but breaks the duplicate-collapse run, non-letters
    are fully transparent, codes dedup per emitted character, and '0'
    survives only at the head of the emitted code."""
    # Java String.toUpperCase(GERMAN): ß -> SS; then umlaut fold
    s = (word or "").upper()
    s = s.replace("ß", "SS")
    s = s.replace("Ä", "A").replace("Ö", "O").replace("Ü", "U")
    n = len(s)
    out: list[str] = []
    last = "/"  # last emitted code char; '/' = broken run
    prev = ""  # previous A-Z letter (H included; non-letters transparent)
    for i, c in enumerate(s):
        if not ("A" <= c <= "Z"):
            continue
        nxt = s[i + 1] if i < n - 1 else ""
        if c in "AEIJOUY":
            code = "0"
        elif c == "B":
            code = "1"
        elif c == "P":
            code = "3" if nxt == "H" else "1"
        elif c in "DT":
            code = "8" if nxt and nxt in "CSZ" else "2"
        elif c in "FVW":
            code = "3"
        elif c in "GKQ":
            code = "4"
        elif c == "C":
            if not out:
                # word-onset rule: nothing coded yet
                code = "4" if nxt and nxt in "AHKLOQRUX" else "8"
            elif prev and prev in "SZ":
                code = "8"
            else:
                code = "4" if nxt and nxt in "AHKOQUX" else "8"
        elif c == "X":
            code = "8" if prev and prev in "CKQ" else "48"
        elif c == "L":
            code = "5"
        elif c in "MN":
            code = "6"
        elif c == "R":
            code = "7"
        elif c in "SZ":
            code = "8"
        else:  # H: no code, breaks the dedup run, counts as prev context
            prev = c
            last = "/"
            continue
        prev = c
        for ch in code:
            if ch != last:
                out.append(ch)
            last = ch
    raw = "".join(out)
    if not raw:
        return ""
    return raw[0] + raw[1:].replace("0", "")


# ---------------------------------------------------------------------------
# Daitch-Mokotoff Soundex (commons-codec language/DaitchMokotoffSoundex.java
# + the dmrules.txt resource, vendored verbatim as package data)
# ---------------------------------------------------------------------------

_DM_MAX_LENGTH = 6


@functools.lru_cache(maxsize=1)
def _dm_rules() -> tuple[dict[str, list[tuple[str, list[str], list[str], list[str]]]], dict[str, str]]:
    path = os.path.join(os.path.dirname(__file__), "data", "dmrules.txt.gz")
    rules: dict[str, list] = {}
    folds: dict[str, str] = {}
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.split("//")[0].strip()
            if not line:
                continue
            if "=" in line and not line.startswith('"'):
                k, v = line.split("=", 1)
                folds[k.strip()] = v.strip()
                continue
            m = re.match(r'"([^"]*)"\s+"([^"]*)"\s+"([^"]*)"\s+"([^"]*)"', line)
            if not m:
                continue
            pat, at_start, before_vowel, other = m.groups()
            rules.setdefault(pat[0], []).append(
                (
                    pat,
                    at_start.split("|"),
                    before_vowel.split("|"),
                    other.split("|"),
                )
            )
    for lst in rules.values():
        lst.sort(key=lambda r: -len(r[0]))
    return rules, folds


def daitch_mokotoff(word: str) -> str:
    """'|'-joined set of 6-digit D-M codes (all branches), commons-codec
    semantics (branching=true, as DaitchMokotoffSoundexFilter uses)."""
    rules, folds = _dm_rules()
    # cleanup keeps ONLY letters (Character.isLetter) — digits/punct are
    # deleted before matching ("us2cr" == "uscr", multi-char patterns match
    # across them) — then lowercases and applies the folding table.  A letter
    # with no fold and no rule ('ü') survives cleanup: it blocks lookahead
    # and multi-char patterns positionally but never updates last_char.
    s = "".join(
        folds.get(c, c) for c in (word or "").lower() if c.isalpha()
    )
    # branches: list of (code_chars, last_replacement)
    branches: list[tuple[str, str | None]] = [("", None)]
    index = 0
    last_char = ""
    while index < len(s):
        c = s[index]
        rule_list = rules.get(c)
        if rule_list is None:
            index += 1
            continue
        matched = None
        for pat, at_start, before_vowel, other in rule_list:
            if s.startswith(pat, index):
                matched = (pat, at_start, before_vowel, other)
                break
        if matched is None:
            index += 1
            continue
        pat, at_start, before_vowel, other = matched
        if last_char == "":
            # "at start" = no rule has matched yet (commons: lastChar == 0)
            replacements = at_start
        elif index + len(pat) < len(s) and s[index + len(pat)] in "aeiou":
            replacements = before_vowel
        else:
            replacements = other
        force = (last_char == "m" and c == "n") or (
            last_char == "n" and c == "m"
        )
        new_branches: list[tuple[str, str | None]] = []
        # the engine's branch set is a LinkedHashSet whose Branch.equals
        # compares the CODE ONLY — branches that converge on the same code
        # merge, keeping the first insertion's lastReplacement
        seen: set[str] = set()
        for code, last_rep in branches:
            for rep in replacements:
                append = force or last_rep is None or not last_rep.endswith(rep)
                new_code = code
                if append and len(code) < _DM_MAX_LENGTH:
                    new_code = (code + rep)[:_DM_MAX_LENGTH]
                if new_code not in seen:
                    seen.add(new_code)
                    new_branches.append((new_code, rep))
        branches = new_branches
        last_char = c
        index += len(pat)
    out: list[str] = []
    seen_codes: set[str] = set()
    for code, _ in branches:
        padded = (code + "0" * _DM_MAX_LENGTH)[:_DM_MAX_LENGTH]
        if padded not in seen_codes:
            seen_codes.add(padded)
            out.append(padded)
    return "|".join(out)


# ---------------------------------------------------------------------------
# Registry — mirrors PhoneticFilterFactory.java:89 registerEncoder names
# (Soundex itself lives in phonetic.py as pure column algebra).
# ---------------------------------------------------------------------------

ENCODERS: dict[str, callable] = {
    "Metaphone": metaphone,
    "DoubleMetaphone": double_metaphone,
    "RefinedSoundex": refined_soundex,
    "Caverphone": caverphone2,
    "ColognePhonetic": cologne_phonetic,
    "Nysiis": nysiis,
    "DaitchMokotoff": daitch_mokotoff,
}


def _codes_fn(encoder: str):
    """word -> list of ALL codes the filter would inject for the token:
    Daitch-Mokotoff emits every branch (DaitchMokotoffSoundexFilter.java),
    DoubleMetaphone emits primary + alternate (DoubleMetaphoneFilter.java),
    everything else emits its single code."""
    if encoder == "DaitchMokotoff":
        return lambda w: [c for c in daitch_mokotoff(w).split("|") if c]
    if encoder == "DoubleMetaphone":

        def dm2(w: str) -> list[str]:
            p = double_metaphone(w, 4, False)
            a = double_metaphone(w, 4, True)
            return [c for c in dict.fromkeys((p, a)) if c]

        return dm2
    fn = ENCODERS[encoder]
    return lambda w: [c for c in (fn(w),) if c]


def phonetic_encode(encoder: str, word: str) -> str:
    """PhoneticFilter.incrementToken's encode contract for one token:
    returns the replacement code, or the original token when the code is
    empty or equal to it (PhoneticFilter.java:71-80)."""
    fn = ENCODERS[encoder]
    try:
        code = fn(word)
    except Exception:
        return word
    if not code or code == word:
        return word
    return code
