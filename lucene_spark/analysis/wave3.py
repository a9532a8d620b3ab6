"""Round-5 wave-3 language analyzers: the Snowball-stemmed chains.

Per-language normalizers + composed dictionary-stage stem functions for
the thirteen reference analyzers whose stem slot is a Snowball program
(analysis/snowball/ — translations validated against 503k vectors from
the compiled reference stemmers):

- Danish / Lithuanian / Armenian / Basque / Estonian / Catalan:
  StandardTokenizer + LowerCase + Stop + SnowballFilter
  (da/DanishAnalyzer.java:104-111 and siblings) — the stem IS the
  Snowball program.
- Dutch (nl/DutchAnalyzer.java:146-155): + StemmerOverrideFilter with
  DEFAULT_STEM_DICT (:80-84, fiets/bromfiets/ei/kind) before Snowball.
- Romanian (ro/RomanianAnalyzer.java:123-131): Stop runs BEFORE
  RomanianNormalizationFilter (cedilla s/t -> comma-below, ro/
  RomanianNormalizer.java:36-49), then Snowball — composing norm+stem at
  the dictionary stage replays that order exactly (stop sees raw tokens).
- Irish (ga/IrishAnalyzer.java:127-134): hyphenation fragments h/n/t
  stopped, elision d'/m'/b', IrishLowerCaseFilter, Stop, Snowball.
- Nepali / Tamil (ne/NepaliAnalyzer.java:117-126,
  ta/TamilAnalyzer.java:117-126): LowerCase + DecimalDigitFilter +
  IndicNormalizationFilter + Stop + Snowball.
- Turkish (tr/TurkishAnalyzer.java:108-116): ApostropheFilter +
  TurkishLowerCaseFilter + Stop + Snowball.
- Serbian (sr/SerbianAnalyzer.java:118-126): Stop + Snowball +
  SerbianNormalizationFilter (normalization runs AFTER the stemmer).
"""

from __future__ import annotations

from lucene_spark.analysis.intl import _INDIC_DEVANAGARI, _indic_compose, _indic_rows
from lucene_spark.analysis.snowball import stem_fn as _sb

# ---------------------------------------------------------------------------
# token alphabets (regex char-class fragments appended to the tokenizer's
# base class — the declared per-script subset of StandardTokenizer's
# all-Unicode-letters contract, like the earlier waves)

ROMANIAN_LETTERS = "ăşţșț"
LITHUANIAN_LETTERS = "ąčęėįšųūž"
ESTONIAN_LETTERS = "šž"
TURKISH_LETTERS = "ğış"  # ç/ö/ü come from the latin1 base class
ARMENIAN_LETTERS = "ա-և"
TAMIL_LETTERS = "஀-௿"
SERBIAN_LETTERS = "а-яђјљњћџđžčćš"

# DecimalDigitFilter (in/DecimalDigitFilter.java) folds every Unicode
# decimal digit to 0-9 via Character.digit; the ne/ta presets lower the
# SCRIPT'S OWN digit row as a pre-tokenize char_fold (declared subset:
# other scripts' digits are out of scope for those corpora)
DEVANAGARI_DIGIT_FOLD = ("०१२३४५६७८९", "0123456789")
TAMIL_DIGIT_FOLD = ("௦௧௨௩௪௫௬௭௮௯", "0123456789")

# TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.java:44-77): dotted
# capital I-with-dot -> i, dotless capital I -> dotless i, BEFORE the
# generic lowercase — a 1:1 pre-tokenize char_fold.  The combining-dot-
# above (U+0307) branch handles NFD input; declared subset: NFC input
# (the common encoding), documented like the width-fold subset.
TURKISH_I_FOLD = ("İI", "iı")

# ApostropheFilter (tr/ApostropheFilter.java:36-48): truncate each token
# at the first apostrophe (U+0027 or U+2019).  Lowered pre-tokenize: the
# apostrophe and everything after it up to whitespace never reaches the
# tokenizer (same effect — the suffix would otherwise tokenize as its
# own term).  Shared regex subset of Python re / Java / RE2 (no
# lookaround, \1 backrefs only).
APOSTROPHE_SUB = (r"['’][^\s]*", " ")

# Irish eclipsis (ga/IrishLowerCaseFilter.java:38-48 inserts "n-"/"t-"
# before an uppercase vowel; ga/IrishAnalyzer.java:56-57 HYPHENATIONS
# stops the bare h/n/t fragments StandardTokenizer splits off
# pre-hyphenated words).  Lowered as: split the eclipsis prefix off
# pre-tokenize, then stop it with the h/n/t stop entries — "tAthair" and
# "t-athair" both index as "athair" (declared subset: the reference
# keeps the joined form as one "t-athair" token; its own comment calls
# the two position-compatible).
IRISH_ECLIPSIS_SUB = (r"\b([nt])([AEIOUÁÉÍÓÚ])", r"\1 \2")
IRISH_HYPHENATIONS = frozenset(("h", "n", "t"))

# ---------------------------------------------------------------------------
# RomanianNormalizer (ro/RomanianNormalizer.java:36-49): cedilla -> comma

_RO_TRANS = str.maketrans("ŞşŢţ", "ȘșȚț")


def romanian_normalize(w: str) -> str:
    return w.translate(_RO_TRANS)


# ---------------------------------------------------------------------------
# SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:43-150):
# Cyrillic -> "bald" Latin, with the digraph expansions dj/lj/nj/dz and
# the Latin diacritic folds đ->dj, ž->z, č/ć->c, š->s

_SR_1TO1 = str.maketrans(
    "абвгдежзијклмнопрстћуфхцчшžčćš",
    "abvgdezzijklmnoprstcufhccszccs",
)
_SR_MULTI = {"ђ": "dj", "đ": "dj", "љ": "lj", "њ": "nj", "џ": "dz"}


def serbian_normalize(w: str) -> str:
    if any(c in _SR_MULTI for c in w):
        w = "".join(_SR_MULTI.get(c, c) for c in w)
    return w.translate(_SR_1TO1)


# ---------------------------------------------------------------------------
# IndicNormalizer Tamil block (in/IndicNormalizer.java decompositions
# carrying flag(TAMIL), base U+0B80) — same row format as the
# Devanagari/Bengali subsets in intl.py

_INDIC_TA_ROWS = (
    (0x09, 0x57, -1, 0x0A),  # letter UU
    (0x12, 0x57, -1, 0x14),  # letter AU
    (0x46, 0x3E, -1, 0x4A),  # vowel sign O
    (0x46, 0x57, -1, 0x4C),  # vowel sign AU
    (0x47, 0x3E, -1, 0x4B),  # vowel sign OO
)
_INDIC_TAMIL = _indic_rows(_INDIC_TA_ROWS, 0x0B80)


def tamil_normalize(w: str) -> str:
    return _indic_compose(w, _INDIC_TAMIL)


# ---------------------------------------------------------------------------
# composed dictionary-stage stem functions (DICT_STEMMERS entries)

# DutchAnalyzer.DEFAULT_STEM_DICT (nl/DutchAnalyzer.java:80-84):
# StemmerOverrideFilter marks these as keywords so Snowball skips them
_NL_STEM_DICT = {"fiets": "fiets", "bromfiets": "bromfiets", "ei": "eier", "kind": "kinder"}


def danish_stem(w: str) -> str:
    return _sb("danish")(w)


def dutch_stem(w: str) -> str:
    o = _NL_STEM_DICT.get(w)
    return o if o is not None else _sb("dutch")(w)


def romanian_stem(w: str) -> str:
    return _sb("romanian")(romanian_normalize(w))


def catalan_stem(w: str) -> str:
    return _sb("catalan")(w)


def lithuanian_stem(w: str) -> str:
    return _sb("lithuanian")(w)


def irish_stem(w: str) -> str:
    return _sb("irish")(w)


def armenian_stem(w: str) -> str:
    return _sb("armenian")(w)


def basque_stem(w: str) -> str:
    return _sb("basque")(w)


def nepali_stem(w: str) -> str:
    return _sb("nepali")(_indic_compose(w, _INDIC_DEVANAGARI))


def estonian_stem(w: str) -> str:
    return _sb("estonian")(w)


def tamil_stem(w: str) -> str:
    return _sb("tamil")(tamil_normalize(w))


def turkish_stem(w: str) -> str:
    return _sb("turkish")(w)


def serbian_stem(w: str) -> str:
    return serbian_normalize(_sb("serbian")(w))


def english_snowball_stem(w: str) -> str:
    """Porter2 (org.tartarus.snowball.ext.EnglishStemmer) — the
    SnowballPorterFilterFactory(language="English") stem slot."""
    return _sb("english")(w)
