"""Brazilian Portuguese stemmer — faithful transliteration of
``analysis/common/.../br/BrazilianStemmer.java`` (the Orengo-style
heuristic stemmer the BrazilianAnalyzer chain uses, distinct from both
the RSLP and the Snowball Portuguese stemmers already in the repo).

Semantics preserved verbatim, including the reference's own quirks:

* ``step1``'s ``logias`` branch discards the replaceSuffix result
  (BrazilianStemmer.java:409-412 — CT is left unchanged but the step
  still reports "altered", so step3 runs instead of step4);
* ``step2``'s first ``ira`` entry removes the suffix ``ava``
  (BrazilianStemmer.java:942-945), which never matches a CT that ends in
  ``ira`` — again "altered" with CT unchanged;
* a ``null`` stem (non-letter or out-of-bounds length) leaves the token
  untouched, and so does a stem equal to the input
  (BrazilianStemFilter.java:57-63).

The stemmer lowercases and strips the Portuguese diacritics itself
(changeTerm:216-263), so ``bôas → boas → boa`` differs from the Snowball
chain — exactly the behavior TestBrazilianAnalyzer.java:41 pins.
"""

from __future__ import annotations

_VOWELS = "aeiou"

_ACCENT_MAP = str.maketrans(
    {
        "á": "a", "â": "a", "ã": "a",
        "é": "e", "ê": "e",
        "í": "i",
        "ó": "o", "ô": "o", "õ": "o",
        "ú": "u", "ü": "u",
        "ç": "c",
        "ñ": "n",
    }
)


def _change_term(value: str) -> str:
    return value.lower().translate(_ACCENT_MAP)


def _create_ct(term: str) -> str:
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in "\"'-,;.?!":
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in "-,;.?!'\"":
        ct = ct[:-1]
    return ct


def _get_r1(value: str | None) -> str | None:
    """R1 — region after the first non-vowel following a vowel
    (getR1:113-147; note the scans stop at len-1, the reference's exact
    bounds)."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i:
        if value[j] in _VOWELS:
            break
        j += 1
    if not j < i:
        return None
    while j < i:
        if value[j] not in _VOWELS:
            break
        j += 1
    if not j < i:
        return None
    return value[j + 1 :]


def _get_rv(value: str | None) -> str | None:
    """getRV:160-211."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i:
            if value[j] in _VOWELS:
                break
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i:
            if value[j] not in _VOWELS:
                break
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 2:
        return value[3:]
    return None


def _suffix(value: str | None, suffix: str) -> bool:
    if value is None:
        return False
    return value.endswith(suffix)


def _remove(value: str, to_remove: str) -> str:
    return value[: -len(to_remove)] if value.endswith(to_remove) else value


def _replace(value: str, to_replace: str, change_to: str) -> str:
    v = _remove(value, to_replace)
    return value if v == value else v + change_to


def _suffix_preceded(value: str | None, suffix: str, preceded: str) -> bool:
    if value is None or not value.endswith(suffix):
        return False
    return _remove(value, suffix).endswith(preceded)


# step1 entries: (min CT length, suffix, region ('r1'|'r2'|'rv'),
#                 preceded-by or None, action) — action None = remove,
# (repl,) = replace with repl, 'noop' = the logias bug (report altered,
# leave CT unchanged)
_STEP1 = [
    (0, "uciones", "r2", None, ("u",)),
    (6, "imentos", "r2", None, None),
    (6, "amentos", "r2", None, None),
    (6, "adores", "r2", None, None),
    (6, "adoras", "r2", None, None),
    (6, "logias", "r2", None, "noop"),  # result discarded (.java:409-412)
    (6, "encias", "r2", None, ("ente",)),
    (6, "amente", "r1", None, None),
    (6, "idades", "r2", None, None),
    (5, "acoes", "r2", None, None),
    (5, "imento", "r2", None, None),
    (5, "amento", "r2", None, None),
    (5, "adora", "r2", None, None),
    (5, "ismos", "r2", None, None),
    (5, "istas", "r2", None, None),
    (5, "logia", "r2", None, ("log",)),
    (5, "ucion", "r2", None, ("u",)),
    (5, "encia", "r2", None, ("ente",)),
    (5, "mente", "r2", None, None),
    (5, "idade", "r2", None, None),
    (4, "acao", "r2", None, None),
    (4, "ezas", "r2", None, None),
    (4, "icos", "r2", None, None),
    (4, "icas", "r2", None, None),
    (4, "ismo", "r2", None, None),
    (4, "avel", "r2", None, None),
    (4, "ivel", "r2", None, None),
    (4, "ista", "r2", None, None),
    (4, "osos", "r2", None, None),
    (4, "osas", "r2", None, None),
    (4, "ador", "r2", None, None),
    (4, "ivas", "r2", None, None),
    (4, "ivos", "r2", None, None),
    (4, "iras", "rv", "e", ("ir",)),
    (3, "eza", "r2", None, None),
    (3, "ico", "r2", None, None),
    (3, "ica", "r2", None, None),
    (3, "oso", "r2", None, None),
    (3, "osa", "r2", None, None),
    (3, "iva", "r2", None, None),
    (3, "ivo", "r2", None, None),
    (3, "ira", "rv", "e", ("ir",)),
]

# step2 groups: (min RV length, ordered suffixes); every entry removes
# its suffix from CT, except the ('ira', 'ava') pair (see module doc).
_STEP2 = [
    (7, ["issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos"]),
    (6, ["iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
         "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
         "irieis"]),
    (5, ["irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
         "asses", "esses", "isses", "astes", "assem", "essem", "issem",
         "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
         "erias", "irias", "estes", "istes", "areis", "aveis"]),
    (4, ["aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
         "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
         "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
         "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
         "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
         "ieis"]),
    (3, ["ada", "ida", "ara", "era", ("ira", "ava"), "iam", "ado", "ido",
         "ias", "ais", "eis", "ira", "ear"]),
    (2, ["ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
         "eu", "iu", "ou"]),
]


class _State:
    __slots__ = ("ct", "r1", "r2", "rv")


def _step1(st: _State) -> bool:
    if st.ct is None:
        return False
    for min_len, suf, region, preceded, action in _STEP1:
        if min_len and len(st.ct) < min_len:
            continue
        reg = {"r1": st.r1, "r2": st.r2, "rv": st.rv}[region]
        if not (_suffix(st.ct, suf) and _suffix(reg, suf)):
            continue
        if preceded is not None and not _suffix_preceded(st.ct, suf, preceded):
            continue
        if action == "noop":
            return True
        if action is None:
            st.ct = _remove(st.ct, suf)
        else:
            st.ct = _replace(st.ct, suf, action[0])
        return True
    return False


def _step2(st: _State) -> bool:
    if st.rv is None:
        return False
    for min_len, sufs in _STEP2:
        if len(st.rv) < min_len:
            continue
        for entry in sufs:
            if isinstance(entry, tuple):
                suf, rem = entry
            else:
                suf = rem = entry
            if _suffix(st.rv, suf):
                st.ct = _remove(st.ct, rem)
                return True
    return False


def _step3(st: _State) -> None:
    if st.rv is None:
        return
    if _suffix(st.rv, "i") and _suffix_preceded(st.rv, "i", "c"):
        st.ct = _remove(st.ct, "i")


def _step4(st: _State) -> None:
    if st.rv is None:
        return
    for suf in ("os", "a", "i", "o"):
        if _suffix(st.rv, suf):
            st.ct = _remove(st.ct, suf)
            return


def _step5(st: _State) -> None:
    if st.rv is None:
        return
    if _suffix(st.rv, "e"):
        if _suffix_preceded(st.rv, "e", "gu"):
            st.ct = _remove(st.ct, "e")
            st.ct = _remove(st.ct, "u")
            return
        if _suffix_preceded(st.rv, "e", "ci"):
            st.ct = _remove(st.ct, "e")
            st.ct = _remove(st.ct, "i")
            return
        st.ct = _remove(st.ct, "e")


def _stem_raw(term: str) -> str | None:
    """BrazilianStemmer.stem:41-72 — None ≙ the reference's null."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):  # isIndexable
        return None
    if not ct.isalpha():  # isStemmable — letters only
        return ct
    st = _State()
    st.ct = ct
    st.r1 = _get_r1(ct)
    st.r2 = _get_r1(st.r1)
    st.rv = _get_rv(ct)
    altered = _step1(st)
    if not altered:
        altered = _step2(st)
    if altered:
        _step3(st)
    else:
        _step4(st)
    _step5(st)
    return st.ct


def brazilian_stem(term: str) -> str:
    """BrazilianStemFilter.incrementToken:54-63 — replace only when the
    stem is non-null and differs from the input token."""
    s = _stem_raw(term)
    if s is None or s == term:
        return term
    return s
