"""RSLP rule-engine stemmers: Portuguese (Orengo) and Galician.

Transliteration of ``analysis/common/.../pt/RSLPStemmerBase.java`` — the
rule-file parser and Step/Rule machinery for RSLP (Removedor de Sufixos da
Lingua Portuguesa, Orengo & Huyck, "A Stemming Algorithm for the Portuguese
Language", SPIRE 2001) — plus the two concrete stemmers that drive it:

* ``portuguese_rslp_stem`` ≙ pt/PortugueseStemmer.java:46-68 (step flow
  plural → adverb → feminine → augmentative → noun → [verb → [vowel]] →
  accent fold; rules: pt/portuguese.rslp).
* ``galician_stem``        ≙ gl/GalicianStemmer.java:47-68 (plural →
  unification → adverb → augmentative* (to fixpoint) → noun → [verb] →
  vowel → RSLG accent fold; rules: gl/galician.rslp — the DEFAULT stemmer
  of gl/GalicianAnalyzer.java:103-116).

The rule tables ARE the scoring contract, so the reference's own resource
files are vendored verbatim as gzipped package data
(``data/portuguese.rslp.gz``, ``data/galician.rslp.gz`` — same treatment as
the KStem head dictionary) and both stemmers are validated exactly against
the reference's vector archives: pt/ptrslptestdata.zip (32,016 pairs) and
gl/gltestdata.zip (9,416 pairs) — tests/test_rslp.py.

Rule semantics (RSLPStemmerBase.java:96-185):

* a Rule fires when the word ends with ``suffix`` AND the candidate stem
  (word minus suffix, BEFORE appending the replacement) is >= ``min`` chars;
* exceptions are either whole-word (step flag 1, equality on the current
  word) or suffix patterns (flag 0, ends-with);
* a Step applies the FIRST matching rule only, gated by a min word size
  (auto-derived when 0) and an optional list of entry suffixes.

Like every other stemmer here these are pure per-term functions applied on
the distinct term dictionary (builder.apply_dict_stemmer) — one Arrow batch
over the vocabulary, never per token.
"""

from __future__ import annotations

import gzip
import os
import re

_HEADER_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC_RE = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class _Rule:
    __slots__ = ("suffix", "min", "replacement", "exc_words", "exc_suffixes")

    def __init__(self, suffix, min_, replacement, exc_words=(), exc_suffixes=()):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exc_words = frozenset(exc_words)
        self.exc_suffixes = tuple(exc_suffixes)

    def matches(self, w: str) -> bool:
        if len(w) - len(self.suffix) < self.min or not w.endswith(self.suffix):
            return False
        if self.exc_words and w in self.exc_words:
            return False
        for e in self.exc_suffixes:
            if w.endswith(e):
                return False
        return True

    def replace(self, w: str) -> str:
        return w[: len(w) - len(self.suffix)] + self.replacement


class _Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name, rules, min_, suffixes):
        self.name = name
        self.rules = rules
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min = min_
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for r in self.rules:
            if r.matches(w):
                return r.replace(w)
        return w


def _parse_list(s: str):
    if not s:
        return None
    return [t.strip()[1:-1] for t in s.split(",")]


def parse_rslp(text: str) -> dict:
    """Parse an .rslp resource into {step_name: _Step}
    (RSLPStemmerBase.parse, java:243-345)."""
    lines = [
        ln.strip()
        for ln in text.splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]
    steps: dict = {}
    i = 0
    while i < len(lines):
        m = _HEADER_RE.match(lines[i])
        if not m:
            raise ValueError(f"illegal step header: {lines[i]!r}")
        name, min_, flag = m.group(1), int(m.group(2)), int(m.group(3))
        suffixes = _parse_list(m.group(4))
        rules = []
        i += 1
        while i < len(lines):
            ln = lines[i]
            ms = _STRIP_RE.match(ln)
            if ms:
                rules.append(_Rule(ms.group(1), int(ms.group(2)), ""))
            else:
                mr = _REP_RE.match(ln)
                if mr:
                    rules.append(_Rule(mr.group(1), int(mr.group(2)), mr.group(3)))
                else:
                    me = _EXC_RE.match(ln)
                    if not me:
                        raise ValueError(f"illegal step rule: {ln!r}")
                    exc = _parse_list(me.group(4)) or []
                    for e in exc:
                        if not e.endswith(me.group(1)):
                            raise ValueError(f"useless exception {e!r}")
                    if flag == 1:
                        rules.append(
                            _Rule(me.group(1), int(me.group(2)), me.group(3), exc_words=exc)
                        )
                    else:
                        rules.append(
                            _Rule(me.group(1), int(me.group(2)), me.group(3), exc_suffixes=exc)
                        )
            i += 1
            if ln.endswith(";"):
                break
        steps[name] = _Step(name, rules, min_, suffixes)
    return steps


def _load(resource: str) -> dict:
    path = os.path.join(os.path.dirname(__file__), "data", resource)
    with gzip.open(path, "rt", encoding="utf-8") as f:
        return parse_rslp(f.read())


_PT_STEPS: dict | None = None
_GL_STEPS: dict | None = None

_PT_FOLD_RSLP = {
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "ç": "c",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ñ": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ý": "y", "ÿ": "y",
}
_GL_FOLD = {"á": "a", "é": "e", "ê": "e", "í": "i", "ó": "o", "ú": "u"}


def portuguese_rslp_stem(w: str) -> str:
    """pt/PortugueseStemmer.java:46-68 — the original Orengo RSLP flow."""
    global _PT_STEPS
    if _PT_STEPS is None:
        _PT_STEPS = _load("portuguese.rslp.gz")
    st = _PT_STEPS
    w = st["Plural"].apply(w)
    w = st["Adverb"].apply(w)
    w = st["Feminine"].apply(w)
    w = st["Augmentative"].apply(w)
    old = w
    w = st["Noun"].apply(w)
    if w == old:
        old = w
        w = st["Verb"].apply(w)
        if w == old:
            w = st["Vowel"].apply(w)
    return "".join(_PT_FOLD_RSLP.get(c, c) for c in w)


def galician_stem(w: str) -> str:
    """gl/GalicianStemmer.java:47-68 — RSLG flow (augmentative to fixpoint)."""
    global _GL_STEPS
    if _GL_STEPS is None:
        _GL_STEPS = _load("galician.rslp.gz")
    st = _GL_STEPS
    w = st["Plural"].apply(w)
    w = st["Unification"].apply(w)
    w = st["Adverb"].apply(w)
    while True:
        old = w
        w = st["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = st["Noun"].apply(w)
    if w == old:
        w = st["Verb"].apply(w)
    w = st["Vowel"].apply(w)
    return "".join(_GL_FOLD.get(c, c) for c in w)


def portuguese_minimal_stem(w: str) -> str:
    """pt/PortugueseMinimalStemmer.java:36-44 — RSLP-S: the Plural step of
    portuguese.rslp only (ptminimaltestdata.zip)."""
    global _PT_STEPS
    if _PT_STEPS is None:
        _PT_STEPS = _load("portuguese.rslp.gz")
    return _PT_STEPS["Plural"].apply(w)


def galician_minimal_stem(w: str) -> str:
    """gl/GalicianMinimalStemmer.java:30-38 — the Plural step of
    galician.rslp only."""
    global _GL_STEPS
    if _GL_STEPS is None:
        _GL_STEPS = _load("galician.rslp.gz")
    return _GL_STEPS["Plural"].apply(w)
