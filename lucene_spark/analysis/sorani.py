"""Sorani Kurdish normalization + light stemming (analysis/common ckb/).

Transliterations validated against the reference's own vector archive
(ckb/ckbtestdata.zip, 8,272 normalize→stem pairs — the reference's
TestSoraniStemFilter.testVocabulary runs "just normalization+stem"):

* ``sorani_normalize`` ≙ ckb/SoraniNormalizer.java:95-148 — Kurdish
  orthography unification: yeh variants → farsi yeh, kaf → keheh,
  heh-with-ZWNJ / final heh / teh marbuta → ae (ە), heh doachashmee →
  heh, initial reh → rreh, harakat / tatweel / format chars deleted.
* ``sorani_stem``      ≙ ckb/SoraniStemmer.java:31-100 — postposition,
  possessive-pronoun, then the first-match ezafe/definite/indefinite/
  demonstrative suffix chain.

``sorani_normalize_and_stem`` composes them as ONE dictionary-stage
stemmer (builder.apply_dict_stemmer): the reference normalizes per token
right after tokenization; running both on the distinct term dictionary is
equivalent because they are pure per-term functions.  Declared-subset
deviation (documented like the German preset's normalize-after-stop): the
reference's StopFilter sees NORMALIZED tokens while this engine matches
stopwords on raw tokens — ckb/stopwords.txt ships pre-normalized, so only
unnormalized spelling variants of stopwords slip through.
"""

from __future__ import annotations

import unicodedata

_YEH, _DOTLESS_YEH, _FARSI_YEH = "ي", "ى", "ی"
_KAF, _KEHEH = "ك", "ک"
_HEH, _AE, _ZWNJ = "ه", "ە", "‌"
_HEH_DOACHASHMEE, _TEH_MARBUTA = "ھ", "ة"
_REH, _RREH, _RREH_ABOVE = "ر", "ڕ", "ڒ"
_DELETED = frozenset(
    "ـًٌٍَُِّْ"
)

# token alphabet fragment for the preset (Arabic-block LETTERS + the marks/
# ZWNJ the normalizer consumes; excludes Arabic punctuation/digits so
# token breaks match StandardTokenizer's letter classes on this subset)
SORANI_LETTERS = (
    "ء-ْ"          # letters + harakat (normalizer deletes marks)
    "ٮ-ۓە"    # extended Arabic letters incl. Kurdish forms
    "ۥ-ۦۮ-ۯۺ-ۿ"
    "‌"                 # ZWNJ (word-internal, WB Extend)
)


def sorani_normalize(w: str) -> str:
    # in-place loop like the Java (deletions re-examine the shifted-in
    # char; the final-heh check uses the RUNNING length, so a heh followed
    # by a later-deleted tatweel stays heh — archive vector "هـ" -> "ه")
    s = list(w)
    n = len(s)
    i = 0
    while i < n:
        ch = s[i]
        if ch in (_YEH, _DOTLESS_YEH):
            s[i] = _FARSI_YEH
        elif ch == _KAF:
            s[i] = _KEHEH
        elif ch == _ZWNJ:
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            n -= 1
            continue
        elif ch == _HEH:
            if i == n - 1:
                s[i] = _AE
        elif ch == _TEH_MARBUTA:
            s[i] = _AE
        elif ch == _HEH_DOACHASHMEE:
            s[i] = _HEH
        elif ch == _REH:
            if i == 0:
                s[i] = _RREH
        elif ch == _RREH_ABOVE:
            s[i] = _RREH
        elif ch in _DELETED or unicodedata.category(ch) == "Cf":
            del s[i]
            n -= 1
            continue
        i += 1
    return "".join(s[:n])


def sorani_stem(w: str) -> str:
    n = len(w)

    def ends(suf: str) -> bool:
        return w[:n].endswith(suf)

    # postposition
    if n > 5 and ends("دا"):          # -dA
        n -= 2
    elif n > 4 and ends("نا"):        # -nA (strips one char)
        n -= 1
    elif n > 6 and ends("ەوە"):  # -awa
        n -= 3
    # possessive pronoun
    if n > 6 and (
        ends("مان") or ends("یان")
        or ends("تان")
    ):
        n -= 3
    # first-match suffix chain (ezafe / definite / indefinite / demonstrative)
    if n > 6 and ends("ێکی"):
        return w[: n - 3]
    if n > 7 and ends("یەکی"):
        return w[: n - 4]
    if n > 5 and ends("ێک"):
        return w[: n - 2]
    if n > 6 and ends("یەک"):
        return w[: n - 3]
    if n > 6 and ends("ەکە"):
        return w[: n - 3]
    if n > 5 and ends("کە"):
        return w[: n - 2]
    if n > 7 and ends("ەکان"):
        return w[: n - 4]
    if n > 6 and ends("کان"):
        return w[: n - 3]
    if n > 7 and ends("یانی"):
        return w[: n - 4]
    if n > 6 and ends("انی"):
        return w[: n - 3]
    if n > 6 and ends("یان"):
        return w[: n - 3]
    if n > 5 and ends("ان"):
        return w[: n - 2]
    if n > 7 and ends("یانە"):
        return w[: n - 4]
    if n > 6 and ends("انە"):
        return w[: n - 3]
    if n > 5 and (ends("ایە") or ends("ەیە")):
        return w[: n - 2]
    if n > 4 and ends("ە"):
        return w[: n - 1]
    if n > 4 and ends("ی"):
        return w[: n - 1]
    return w[:n]


def sorani_normalize_and_stem(w: str) -> str:
    return sorani_stem(sorani_normalize(w))
