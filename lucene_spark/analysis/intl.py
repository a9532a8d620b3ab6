"""Round-5 international analyzer wave: ar / fa / cs / bg / lv / id / no /
hi / bn normalizers and stemmers (analysis/common transliterations).

Each is a pure per-term function the IndexBuilder applies to the DISTINCT
TERM DICTIONARY (builder.apply_dict_stemmer) — one Arrow batch over the
vocabulary, never per token — and each is validated against the
reference's own test vectors (tests/test_intl.py parses the reference's
Test*.java / vocabulary files directly, same treatment as the zip-archive
stemmers):

* ``arabic_normalize``      ≙ ar/ArabicNormalizer.java:37-100 (hamza-seat
  alef fold, teh marbuta → heh, dotless yeh → yeh, harakat/tatweel
  deletion)
* ``arabic_stem``           ≙ ar/ArabicStemmer.java:39-155 (first-match
  definite-article/conjunction prefix strip, then CUMULATIVE suffix
  strips in list order)
* ``persian_normalize``     ≙ fa/PersianNormalizer.java:31-85 over
  ArabicNormalizer output (the fa/PersianAnalyzer.java:128-144 chain
  applies both); also exported as the ``PERSIAN_FOLD`` translate pair
  (both normalizers are char-for-char maps/deletions, so the preset
  lowers them to ONE pre-tokenize F.translate and the reference's
  normalize-BEFORE-stop order is preserved exactly)
* ``persian_stem``          ≙ fa/PersianStemmer.java:34-100 (cumulative
  suffix strips; the ZWNJ suffix never fires in the preset because
  fa/PersianCharFilter.java treats ZWNJ as a token break)
* ``czech_stem``            ≙ cz/CzechStemmer.java:37-158 (case +
  possessive removal, then palatalization normalize)
* ``bulgarian_stem``        ≙ bg/BulgarianStemmer.java:35-140 (Savoy:
  definite article + plural removal with rewrite rules)
* ``latvian_stem``          ≙ lv/LatvianStemmer.java:37-181 (first affix
  whose vowel budget the WHOLE word exceeds; unpalatalization when a
  II/V/VI-declension suffix fired)
* ``indonesian_stem``       ≙ id/IndonesianStemmer.java:28-270 (syllable-
  budgeted particle/possessive strip, then the ordered first/second-order
  prefix + suffix derivational machine with REMOVED_* flag gating)
* ``norwegian_light_stem``  ≙ no/NorwegianLightStemmer.java:63-183 with
  BOKMAAL flags (the no/NorwegianLightStemFilter.java:42-44 default);
  ``_nn`` variant = NYNORSK (nb_light.txt / nn_light.txt vocabularies)
* ``norwegian_minimal_stem``≙ no/NorwegianMinimalStemmer.java:81-109
  (plural + genitive -s only; nb_minimal.txt / nn_minimal.txt)
* ``hindi_normalize``       ≙ hi/HindiNormalizer.java:38-175 (dead n →
  bindu, chandrabindu → bindu, nukta fold, virama/ZW(N)J deletion,
  chandra/long-vowel shortening)
* ``hindi_stem``            ≙ hi/HindiStemmer.java:29-112 (Larkey
  lightweight suffix strip, longest class first)
* ``bengali_normalize``     ≙ bn/BengaliNormalizer.java:28-154 (Savoy:
  chandrabindu deletion, kar shortening, khio/ja-phala/ba-phalaa
  recomposition, visarga, sh/na/ra folds)
* ``bengali_stem``          ≙ bn/BengaliStemmer.java:30-163 (suffix strip,
  longest class first)

Declared-subset deviations (each documented on its preset): the hi/bn
presets skip in/IndicNormalizer.java (two-point canonical recompositions
for rare input sequences — hi/HindiNormalizer.java handles the common
nukta forms) and match stopwords on RAW tokens like the Sorani preset
(analysis/sorani.py docstring); DecimalDigitFilter is out of scope (the
token alphabets exclude non-ASCII digits).
"""

from __future__ import annotations

# -- Arabic -------------------------------------------------------------

_AR_ALEF = "ا"
_AR_HARAKAT = "ًٌٍَُِّْ"
_AR_NORM_MAP = {
    "آ": _AR_ALEF,  # alef madda
    "أ": _AR_ALEF,  # alef hamza above
    "إ": _AR_ALEF,  # alef hamza below
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
}
_AR_DELETE = frozenset("ـ" + _AR_HARAKAT)  # tatweel + harakat

# token-alphabet fragment for the Arabic preset: base Arabic letters plus
# the harakat/tatweel the normalizer deletes (tokens reach the dictionary
# stage un-normalized because ArabicAnalyzer stops BEFORE normalizing)
ARABIC_LETTERS = "ء-ي" + _AR_HARAKAT + "ـى"

_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(w: str) -> str:
    return "".join(
        _AR_NORM_MAP.get(c, c) for c in w if c not in _AR_DELETE
    )


def arabic_stem(w: str) -> str:
    # prefix: FIRST match only (ArabicStemmer.stemPrefix); the 1-char
    # waw prefix needs len >= 4, the others len >= prefix + 2
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(w) >= 4 and w.startswith(p):
                w = w[len(p):]
                break
        elif len(w) >= len(p) + 2 and w.startswith(p):
            w = w[len(p):]
            break
    # suffixes: EVERY matching suffix in list order (stemSuffix loops on),
    # each requiring >= 2 chars left after stemming
    for suf in _AR_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[: len(w) - len(suf)]
    return w


def arabic_normalize_and_stem(w: str) -> str:
    return arabic_stem(arabic_normalize(w))


# -- Persian ------------------------------------------------------------

# ArabicNormalizer ∘ PersianNormalizer as one translate pair (outputs of
# the first are not inputs of the second, so composition stays 1:1);
# deleted chars (tatweel, harakat, hamza-above) go in the unmapped tail
_FA_FOLD_MAP = dict(_AR_NORM_MAP)
_FA_FOLD_MAP.update({
    "ی": "ي",  # farsi yeh -> yeh
    "ے": "ي",  # yeh barree -> yeh
    "ک": "ك",  # keheh -> kaf
    "ۀ": "ه",  # heh yeh -> heh
    "ہ": "ه",  # heh goal -> heh
})
_FA_DELETE = "ـ" + _AR_HARAKAT + "ٔ"  # + hamza above
PERSIAN_FOLD = (
    "".join(_FA_FOLD_MAP) + _FA_DELETE,
    "".join(_FA_FOLD_MAP.values()),
)

# post-fold Persian token alphabet: base Arabic letters + the Persian
# additions the fold does NOT touch (peh/tcheh/jeh/gaf); ZWNJ excluded —
# PersianCharFilter.java maps it to a space (token break)
PERSIAN_LETTERS = "ء-يپچژگ"

_FA_SUFFIXES = ("ات", "ان",
                "ترين", "تر",
                "يي", "ي", "ها", "‌")


def persian_normalize(w: str) -> str:
    frm, to = PERSIAN_FOLD
    return w.translate(str.maketrans(frm[: len(to)], to, frm[len(to):]))


def persian_stem(w: str) -> str:
    # cumulative suffix strips in list order (PersianStemmer.stemSuffix),
    # each requiring >= 2 chars left after stemming
    for suf in _FA_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[: len(w) - len(suf)]
    return w


# -- Czech --------------------------------------------------------------

CZECH_LETTERS = "čďěňřšťůž"

_CS_CASE_5 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CS_CASE_4 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CS_VOWEL_TAIL = frozenset("aeiouůyáéíýě")


def czech_stem(w: str) -> str:
    s = list(w)
    n = len(s)
    # removeCase
    if n > 7 and w.endswith("atech"):
        n -= 5
    elif n > 6 and (w.endswith("ětem") or w.endswith("etem") or w.endswith("atům")):
        n -= 4
    elif n > 5 and w[n - 3:n] in _CS_CASE_5:
        n -= 3
    elif n > 4 and w[n - 2:n] in _CS_CASE_4:
        n -= 2
    elif n > 3 and s[n - 1] in _CS_VOWEL_TAIL:
        n -= 1
    # removePossessives
    t = "".join(s[:n])
    if n > 5 and (t.endswith("ov") or t.endswith("in") or t.endswith("ův")):
        n -= 2
    if n <= 0:
        return ""
    # normalize
    t = "".join(s[:n])
    if t.endswith("čt"):
        s[n - 2], s[n - 1] = "c", "k"
    elif t.endswith("št"):
        s[n - 2], s[n - 1] = "s", "k"
    elif s[n - 1] in ("c", "č"):
        s[n - 1] = "k"
    elif s[n - 1] in ("z", "ž"):
        s[n - 1] = "h"
    elif n > 1 and s[n - 2] == "e":
        s[n - 2] = s[n - 1]
        n -= 1
    elif n > 2 and s[n - 2] == "ů":
        s[n - 2] = "o"
    return "".join(s[:n])


# -- Bulgarian ----------------------------------------------------------

BULGARIAN_LETTERS = "а-я"


def bulgarian_stem(w: str) -> str:
    s = list(w)
    n = len(s)
    if n < 4:
        return w
    if n > 5 and w.endswith("ища"):
        return w[: n - 3]

    def ew(suf: str) -> bool:
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    # removeArticle
    if n > 6 and ew("ият"):
        n -= 3
    elif n > 5 and (ew("ът") or ew("то") or ew("те") or ew("та") or ew("ия")):
        n -= 2
    elif n > 4 and ew("ят"):
        n -= 2
    # removePlural
    if n > 6:
        if ew("овци"):
            n -= 3
        elif ew("ове"):
            n -= 3
        elif ew("еве"):
            s[n - 3] = "й"
            n -= 2
    if n > 5:
        if ew("ища"):
            n -= 3
        elif ew("та"):
            n -= 2
        elif ew("ци"):
            s[n - 2] = "к"
            n -= 1
        elif ew("зи"):
            s[n - 2] = "г"
            n -= 1
        elif s[n - 3] == "е" and s[n - 1] == "и":
            s[n - 3] = "я"
            n -= 1
    if n > 4:
        if ew("си"):
            s[n - 2] = "х"
            n -= 1
        elif ew("и"):
            n -= 1
    if n > 3:
        if ew("я"):
            n -= 1
        if ew("а") or ew("о") or ew("е"):
            n -= 1
    if n > 4 and ew("ен"):
        s[n - 2] = "н"
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]
        n -= 1
    return "".join(s[:n])


# -- Latvian ------------------------------------------------------------

LATVIAN_LETTERS = "āčēģīķļņšūž"

# (affix, vowel-count, palatalizes) in LatvianStemmer.affixes order
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False), ("am", 1, False),
    ("ēm", 1, False), ("īm", 1, False), ("im", 1, False), ("um", 1, False),
    ("us", 1, True), ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False),
    ("is", 1, False), ("ie", 1, False), ("u", 1, True), ("a", 1, True),
    ("i", 1, True), ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(s: list, n: int) -> str:
    # s[n] is the first removed char (the Java peeks past the new length)
    if s[n] == "u":
        if "".join(s[n - 2:n]) == "kš":
            s[n - 1] = "s"
            s.insert(n, "t")
            return "".join(s[: n + 1])
        if "".join(s[n - 2:n]) == "ņņ":
            s[n - 2], s[n - 1] = "n", "n"
            return "".join(s[:n])
    t = "".join(s[:n])
    if t.endswith(("pj", "bj", "mj", "vj")):
        return t[: n - 1]
    for pat, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if t.endswith(pat):
            return t[: n - 2] + rep
    if t.endswith("č"):
        return t[: n - 1] + "c"
    if t.endswith("ļ"):
        return t[: n - 1] + "l"
    if t.endswith("ņ"):
        return t[: n - 1] + "n"
    return t


def latvian_stem(w: str) -> str:
    num_vowels = sum(1 for c in w if c in _LV_VOWELS)
    n = len(w)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if num_vowels > vc and n >= len(affix) + 3 and w.endswith(affix):
            m = n - len(affix)
            return _lv_unpalatalize(list(w), m) if palatalizes else w[:m]
    return w


# -- Indonesian ---------------------------------------------------------

_ID_VOWELS = frozenset("aeiou")
_REM_KE, _REM_PENG, _REM_DI, _REM_MENG, _REM_TER, _REM_BER, _REM_PE = (
    1, 2, 4, 8, 16, 32, 64)


def indonesian_stem(w: str, derivational: bool = True) -> str:
    s = list(w)
    syl = sum(1 for c in s if c in _ID_VOWELS)
    flags = 0

    def t() -> str:
        return "".join(s)

    # removeParticle
    if syl > 2 and t().endswith(("kah", "lah", "pun")):
        syl -= 1
        del s[-3:]
    # removePossessivePronoun
    if syl > 2:
        if t().endswith(("ku", "mu")):
            syl -= 1
            del s[-2:]
        elif t().endswith("nya"):
            syl -= 1
            del s[-3:]

    def remove_first_order_prefix() -> bool:
        nonlocal syl, flags
        w = t()
        if w.startswith("meng"):
            flags |= _REM_MENG; syl -= 1; del s[:4]; return True
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= _REM_MENG; s[3] = "s"; syl -= 1; del s[:3]; return True
        if w.startswith(("men", "mem")):
            flags |= _REM_MENG; syl -= 1; del s[:3]; return True
        if w.startswith("me"):
            flags |= _REM_MENG; syl -= 1; del s[:2]; return True
        if w.startswith("peng"):
            flags |= _REM_PENG; syl -= 1; del s[:4]; return True
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= _REM_PENG; s[3] = "s"; syl -= 1; del s[:3]; return True
        if w.startswith("peny"):
            flags |= _REM_PENG; syl -= 1; del s[:4]; return True
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            flags |= _REM_PENG; s[2] = "t"; syl -= 1; del s[:2]; return True
        if w.startswith("pen"):
            flags |= _REM_PENG; syl -= 1; del s[:3]; return True
        if w.startswith("pem"):
            flags |= _REM_PENG; syl -= 1; del s[:3]; return True
        if w.startswith("di"):
            flags |= _REM_DI; syl -= 1; del s[:2]; return True
        if w.startswith("ter"):
            flags |= _REM_TER; syl -= 1; del s[:3]; return True
        if w.startswith("ke"):
            flags |= _REM_KE; syl -= 1; del s[:2]; return True
        return False

    def remove_second_order_prefix() -> None:
        nonlocal syl, flags
        w = t()
        if w.startswith("ber"):
            flags |= _REM_BER; syl -= 1; del s[:3]; return
        if w == "belajar":
            flags |= _REM_BER; syl -= 1; del s[:3]; return
        if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
                and w[3] == "e" and w[4] == "r"):
            flags |= _REM_BER; syl -= 1; del s[:2]; return
        if w.startswith("per"):
            syl -= 1; del s[:3]; return
        if w == "pelajar":
            syl -= 1; del s[:3]; return
        if w.startswith("pe"):
            flags |= _REM_PE; syl -= 1; del s[:2]; return

    def remove_suffix() -> None:
        nonlocal syl
        w = t()
        if (w.endswith("kan") and not flags & _REM_KE
                and not flags & _REM_PENG and not flags & _REM_PE):
            syl -= 1; del s[-3:]; return
        if (w.endswith("an") and not flags & _REM_DI
                and not flags & _REM_MENG and not flags & _REM_TER):
            syl -= 1; del s[-2:]; return
        if (w.endswith("i") and not w.endswith("si")
                and not flags & _REM_BER and not flags & _REM_KE
                and not flags & _REM_PENG):
            syl -= 1; del s[-1:]; return

    if derivational:
        fired = syl > 2 and remove_first_order_prefix()
        if fired:
            old = len(s)
            if syl > 2:
                remove_suffix()
            if len(s) != old and syl > 2:
                remove_second_order_prefix()
        else:
            if syl > 2:
                remove_second_order_prefix()
            if syl > 2:
                remove_suffix()
    return t()


# -- Norwegian ----------------------------------------------------------

def _norwegian_light(w: str, bokmaal: bool, nynorsk: bool) -> str:
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
    t = w[:n]
    if n > 7 and ((t.endswith(("heter", "heten")) and bokmaal)
                  or (t.endswith("heita") and nynorsk)):
        return t[: n - 5]
    if n > 8 and nynorsk and t.endswith(("heiter", "leiken", "leikar")):
        return t[: n - 6]
    if n > 5 and (t.endswith("dom") or (t.endswith("het") and bokmaal)):
        return t[: n - 3]
    if n > 6 and nynorsk and t.endswith(("heit", "semd", "leik")):
        return t[: n - 4]
    if n > 7 and t.endswith(("elser", "elsen")):
        return t[: n - 5]
    if n > 6 and ((t.endswith("ende") and bokmaal)
                  or (t.endswith("ande") and nynorsk)
                  or t.endswith("else")
                  or (t.endswith("este") and bokmaal)
                  or (t.endswith("aste") and nynorsk)
                  or (t.endswith("eren") and bokmaal)
                  or (t.endswith("aren") and nynorsk)):
        return t[: n - 4]
    if n > 5 and ((t.endswith("ere") and bokmaal)
                  or (t.endswith("are") and nynorsk)
                  or (t.endswith("est") and bokmaal)
                  or (t.endswith("ast") and nynorsk)
                  or t.endswith("ene")
                  or (t.endswith("ane") and nynorsk)):
        return t[: n - 3]
    if n > 4 and (t.endswith(("er", "en", "et", "te"))
                  or (t.endswith("ar") and nynorsk)
                  or (t.endswith("st") and bokmaal)):
        return t[: n - 2]
    if n > 3 and t[n - 1] in ("a", "e", "n"):
        return t[: n - 1]
    return t


def norwegian_light_stem(w: str) -> str:
    """BOKMAAL flags — the NorwegianLightStemFilter default."""
    return _norwegian_light(w, True, False)


def norwegian_light_stem_nn(w: str) -> str:
    return _norwegian_light(w, False, True)


def _norwegian_minimal(w: str, nynorsk: bool) -> str:
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
    t = w[:n]
    if n > 5 and (t.endswith("ene") or (t.endswith("ane") and nynorsk)):
        return t[: n - 3]
    if n > 4 and (t.endswith(("er", "en", "et"))
                  or (t.endswith("ar") and nynorsk)):
        return t[: n - 2]
    if n > 3 and t[n - 1] in ("a", "e"):
        return t[: n - 1]
    return t


def norwegian_minimal_stem(w: str) -> str:
    return _norwegian_minimal(w, False)


def norwegian_minimal_stem_nn(w: str) -> str:
    return _norwegian_minimal(w, True)


# -- IndicNormalizer subset (Devanagari + Bengali) ------------------------

# in/IndicNormalizer.java:246-291 restricted to the two scripts the hi/bn
# presets use: single left-to-right pass; at each position the FIRST
# matching decomposition row (table order = longest first) composes 2-3
# chars into the standard form.  Rows transliterated from
# IndicNormalizer.decompositions filtered by flag(DEVANAGARI)/flag(BENGALI)
# ("\uFF" sentinel = ZWJ as in the Java table).
# (ch1, ch2, ch3, res) codepage offsets exactly as in the Java table
# (0xFF = ZWJ, -1 = no third char); built with chr() so no source-editor
# unicode normalization can corrupt the composed/decomposed distinction
_INDIC_DEV_ROWS = (
    (0x05, 0x3E, 0x45, 0x11), (0x05, 0x3E, 0x46, 0x12),
    (0x05, 0x3E, 0x47, 0x13), (0x05, 0x3E, 0x48, 0x14),
    (0x05, 0x3E, -1, 0x06), (0x05, 0x45, -1, 0x72),
    (0x05, 0x46, -1, 0x04), (0x05, 0x49, -1, 0x11),
    (0x05, 0x4A, -1, 0x12), (0x05, 0x4B, -1, 0x13),
    (0x05, 0x4C, -1, 0x14), (0x06, 0x45, -1, 0x11),
    (0x06, 0x46, -1, 0x12), (0x06, 0x47, -1, 0x13),
    (0x06, 0x48, -1, 0x14), (0x09, 0x41, -1, 0x0A),
    (0x0F, 0x45, -1, 0x0D), (0x0F, 0x46, -1, 0x0E),
    (0x0F, 0x47, -1, 0x10), (0x15, 0x3C, -1, 0x58),
    (0x16, 0x3C, -1, 0x59), (0x17, 0x3C, -1, 0x5A),
    (0x1C, 0x3C, -1, 0x5B), (0x21, 0x3C, -1, 0x5C),
    (0x22, 0x3C, -1, 0x5D), (0x28, 0x3C, -1, 0x29),
    (0x2B, 0x3C, -1, 0x5E), (0x2F, 0x3C, -1, 0x5F),
    (0x30, 0x3C, -1, 0x31), (0x33, 0x3C, -1, 0x34),
    (0x3E, 0x45, -1, 0x49), (0x3E, 0x46, -1, 0x4A),
    (0x3E, 0x47, -1, 0x4B), (0x3E, 0x48, -1, 0x4C),
)
_INDIC_BN_ROWS = (
    (0x05, 0x3E, -1, 0x06), (0x21, 0x3C, -1, 0x5C),
    (0x22, 0x3C, -1, 0x5D), (0x24, 0x4D, 0xFF, 0x4E),
    (0x2F, 0x3C, -1, 0x5F), (0x47, 0x3E, -1, 0x4B),
    (0x47, 0x57, -1, 0x4C),
)


def _indic_rows(rows: tuple, base: int) -> tuple:
    out = []
    for c1, c2, c3, res in rows:
        seq = chr(base + c1) + chr(base + c2)
        if c3 == 0xFF:
            seq += "\u200d"
        elif c3 != -1:
            seq += chr(base + c3)
        out.append((seq, chr(base + res)))
    return tuple(out)


_INDIC_DEVANAGARI = _indic_rows(_INDIC_DEV_ROWS, 0x0900)
_INDIC_BENGALI = _indic_rows(_INDIC_BN_ROWS, 0x0980)


def _indic_compose(w: str, rows: tuple) -> str:
    s = list(w)
    i = 0
    while i < len(s):
        for seq, res in rows:
            n = len(seq)
            if s[i] == seq[0] and "".join(s[i:i + n]) == seq:
                s[i:i + n] = [res]
                break
        i += 1
    return "".join(s)


# -- Hindi --------------------------------------------------------------

# Devanagari block + ZW(N)J (word-internal Extend/Format per UAX#29; the
# normalizer deletes them)
HINDI_LETTERS = "ऀ-ॿ‌‍"

_HI_SIMPLE = {
    "ँ": "ं",  # candrabindu -> bindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ", "आ": "अ", "ई": "इ",
    "ऊ": "उ", "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = frozenset("़‍‌्")

_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
             "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
             "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_normalize(w: str) -> str:
    s = list(w)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c == "न" and i + 1 < n and s[i + 1] == "्":
            # dead n -> bindu (consumes the virama)
            s[i] = "ं"
            del s[i + 1]
            n -= 1
        elif c in _HI_DELETE:
            del s[i]
            n -= 1
            continue
        elif c in _HI_SIMPLE:
            s[i] = _HI_SIMPLE[c]
        i += 1
    return "".join(s)


def hindi_stem(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith(_HI_SUF_5):
        return w[: n - 5]
    if n > 5 and w.endswith(_HI_SUF_4):
        return w[: n - 4]
    if n > 4 and w.endswith(_HI_SUF_3):
        return w[: n - 3]
    if n > 3 and w.endswith(_HI_SUF_2):
        return w[: n - 2]
    if n > 2 and w.endswith(_HI_SUF_1):
        return w[: n - 1]
    return w


def hindi_normalize_and_stem(w: str) -> str:
    """IndicNormalization -> HindiNormalization -> HindiStem, the
    hi/HindiAnalyzer.java:121-131 filter order."""
    return hindi_stem(hindi_normalize(_indic_compose(w, _INDIC_DEVANAGARI)))


# -- Bengali ------------------------------------------------------------

BENGALI_LETTERS = "ঀ-৿‌‍"


def bengali_normalize(w: str) -> str:
    s = list(w)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c == "ঁ":  # chandrabindu: delete
            del s[i]
            n -= 1
            continue
        elif c == "ী":
            s[i] = "ি"
        elif c == "ূ":
            s[i] = "ু"
        elif c == "ক":  # khio
            if i + 2 < n and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                    n -= 2
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
                    n -= 1
        elif c == "ঙ":
            s[i] = "ং"
        elif c == "য":  # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < n and s[i + 1] == "া":
                    del s[i + 1]
                    n -= 1
                del s[i]
                n -= 1
                continue
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1
                continue
        elif c == "ব":  # ba phalaa
            if i == 0 or s[i - 1] != "্":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                n -= 1
                continue
        elif c == "ঃ":  # visarga
            if i == n - 1:
                if n <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    n -= 1
                    continue
            else:
                s[i] = s[i + 1]
        elif c in ("শ", "ষ"):
            s[i] = "স"
        elif c == "ণ":
            s[i] = "ন"
        elif c in ("\u09dc", "\u09dd"):  # precomposed rra/rha
            s[i] = "র"
        elif c == "ৎ":
            s[i] = "ত"
        i += 1
    return "".join(s)


_BN_SUF_8 = ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
             "ইয়াছিলেন")
_BN_SUF_7 = ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা",
             "িয়াছিলি", "য়েদেরকে")
_BN_SUF_6 = ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
             "েদেরকে")
_BN_SUF_5 = ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি",
             "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")
_BN_SUF_4 = ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে",
             "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি",
             "য়েরা", "েদের")
_BN_SUF_3 = ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা",
             "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা",
             "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন",
             "য়ের", "েরা", "দের")
_BN_SUF_2 = ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে",
             "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের",
             "রা", "কে")
_BN_SUF_1 = ("ি", "ী", "া", "ো", "ে", "ব", "ত")


def _bn_composed(suffixes: tuple) -> tuple:
    # the Java stemmer's suffix literals are COMPOSED (U+09DC/DD/DF); fold
    # any editor-decomposed (consonant + nukta) pairs in ours to match
    return tuple(_indic_compose(s, _INDIC_BENGALI) for s in suffixes)


_BN_SUF_8 = _bn_composed(_BN_SUF_8)
_BN_SUF_7 = _bn_composed(_BN_SUF_7)
_BN_SUF_6 = _bn_composed(_BN_SUF_6)
_BN_SUF_5 = _bn_composed(_BN_SUF_5)
_BN_SUF_4 = _bn_composed(_BN_SUF_4)
_BN_SUF_3 = _bn_composed(_BN_SUF_3)
_BN_SUF_2 = _bn_composed(_BN_SUF_2)
_BN_SUF_1 = _bn_composed(_BN_SUF_1)


def bengali_stem(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith(_BN_SUF_8):
        return w[: n - 8]
    if n > 8 and w.endswith(_BN_SUF_7):
        return w[: n - 7]
    if n > 7 and w.endswith(_BN_SUF_6):
        return w[: n - 6]
    if n > 6 and w.endswith(_BN_SUF_5):
        return w[: n - 5]
    if n > 5 and w.endswith(_BN_SUF_4):
        return w[: n - 4]
    if n > 4 and w.endswith(_BN_SUF_3):
        return w[: n - 3]
    if n > 3 and w.endswith(_BN_SUF_2):
        return w[: n - 2]
    if n > 2 and w.endswith(_BN_SUF_1):
        return w[: n - 1]
    return w


def bengali_normalize_and_stem(w: str) -> str:
    """IndicNormalization -> BengaliNormalization -> BengaliStem, the
    bn/BengaliAnalyzer.java:119-130 filter order."""
    return bengali_stem(bengali_normalize(_indic_compose(w, _INDIC_BENGALI)))


# -- Telugu ---------------------------------------------------------------

# Telugu block + ZW(N)J (the normalizer deletes them)
TELUGU_LETTERS = "ఀ-౿‌‍"

# in/IndicNormalizer.java decompositions filtered by flag(TELUGU),
# base 0x0C00 (table lines 136/138/168/180/202/204)
_INDIC_TE_ROWS = (
    (0x12, 0x4C, -1, 0x14), (0x12, 0x55, -1, 0x13),
    (0x2C, 0x41, 0x41, 0x0B), (0x35, 0x41, -1, 0x2E),
    (0x46, 0x55, -1, 0x47), (0x46, 0x56, -1, 0x48),
)
_INDIC_TELUGU = _indic_rows(_INDIC_TE_ROWS, 0x0C00)

_TE_SIMPLE = {
    "ఀ": "ం", "ఁ": "ం",  # candrabindu -> bindu
    "ఔ": "ఓ", "ఐ": "ఏ",  # long -> short vowels
    "ఆ": "అ", "ఈ": "ఇ", "ఊ": "ఉ",
    "ీ": "ి", "ూ": "ు",  # long -> short matras
    "ే": "ె", "ో": "ొ",
}
_TE_DELETE = frozenset("ః‌‍")  # visarga + ZW(N)J


def telugu_normalize(w: str) -> str:
    """te/TeluguNormalizer.java:35-121: candrabindu -> bindu, visarga and
    ZW(N)J deletion, long -> short vowels/matras, and the two-char
    compositions (decomposed diphthong and composed oo/au) — one in-place
    left-to-right pass; a composed/substituted result is never revisited
    (the Java switch advances past it)."""
    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c in _TE_DELETE:
            del s[i]
            continue
        if c == "ె" and i + 1 < len(s) and s[i + 1] == "ౖ":
            s[i] = "ై"  # decomposed diphthong -> precomposed ai sign
            del s[i + 1]
        elif c == "ఒ" and i + 1 < len(s) and s[i + 1] == "ౕ":
            s[i] = "ఓ"  # o + length mark -> oo
            del s[i + 1]
        elif c == "ఒ" and i + 1 < len(s) and s[i + 1] == "ౌ":
            s[i] = "ఔ"  # o + au length mark -> au
            del s[i + 1]
        elif c in _TE_SIMPLE:
            s[i] = _TE_SIMPLE[c]
        i += 1
    return "".join(s)


_TE_SUF_4 = ("ళ్ళు", "డ్లు")
_TE_SUF_2 = ("డు", "ము", "వు", "లు", "ని", "ను", "చే",
             "కై", "లో", "ది", "కి", "సు", "వై", "పై")
_TE_SUF_1 = tuple("ిీుూెేొోా")


def telugu_stem(w: str) -> str:
    """te/TeluguStemmer.java:26-63: longest class first — the two 4-char
    plural clusters, then the 2-char case/number suffixes, then single
    matras, each with its minimum-length guard."""
    n = len(w)
    if n > 5 and w.endswith(_TE_SUF_4):
        return w[: n - 4]
    if n > 3 and w.endswith(_TE_SUF_2):
        return w[: n - 2]
    if n > 2 and w.endswith(_TE_SUF_1):
        return w[: n - 1]
    return w


def telugu_normalize_and_stem(w: str) -> str:
    """IndicNormalization(Telugu) -> TeluguNormalization -> TeluguStem,
    the te/TeluguAnalyzer.java:117-127 filter order."""
    return telugu_stem(telugu_normalize(_indic_compose(w, _INDIC_TELUGU)))


# DecimalDigitFilter's Telugu digit row (te/TeluguAnalyzer.java applies
# DecimalDigitFilter first; pre-tokenize fold like the Tamil preset)
TELUGU_DIGIT_FOLD = ("౦౧౨౩౪౫౬౭౮౯", "0123456789")
