"""Phonetic codec parity: every encoder replays the full vector archive
produced by the REAL Apache Commons Codec 1.19 via the JVM
(scripts/dev/gen_phonetic_vectors.py — the exact library the reference's
analysis/phonetic module delegates to: PhoneticFilterFactory.java:48
registers Metaphone/DoubleMetaphone/Soundex/RefinedSoundex/Caverphone/
ColognePhonetic/Nysiis; DaitchMokotoffSoundexFilter.java wraps
DaitchMokotoffSoundex).  Exact string parity on 23k words: testdata
vocabulary, the reference's own filter-test inputs, surname/edge sets,
and 20k seeded random strings."""

import gzip
import os

import pytest

from lucene_spark.analysis.phonetic_codecs import (
    ENCODERS,
    caverphone2,
    cologne_phonetic,
    daitch_mokotoff,
    double_metaphone,
    metaphone,
    nysiis,
    phonetic_encode,
    refined_soundex,
)

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_spark",
    "analysis",
    "data",
)
ARCHIVE = os.path.join(DATA, "phonetic_vectors.tsv.gz")

COLS = {
    "metaphone4": lambda w: metaphone(w, 4),
    "metaphone8": lambda w: metaphone(w, 8),
    "dm_primary4": lambda w: double_metaphone(w, 4, False),
    "dm_alternate4": lambda w: double_metaphone(w, 4, True),
    "dm_primary8": lambda w: double_metaphone(w, 8, False),
    "dm_alternate8": lambda w: double_metaphone(w, 8, True),
    "refined_soundex": refined_soundex,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
    "cologne": cologne_phonetic,
    "daitch_mokotoff": daitch_mokotoff,
}


def _rows():
    with gzip.open(ARCHIVE, "rt", encoding="utf-8") as f:
        header = f.readline().rstrip("\n").split("\t")
        idx = {name: header.index(name) for name in COLS}
        for line in f:
            cols = line.rstrip("\n").split("\t")
            yield cols, idx


@pytest.mark.parametrize("name", sorted(COLS))
def test_archive_parity(name):
    fn = COLS[name]
    n = 0
    for cols, idx in _rows():
        w = cols[0]
        expect = cols[idx[name]]
        got = fn(w)
        assert got == expect, f"{name}: {w!r} -> {got!r}, commons-codec {expect!r}"
        n += 1
    assert n > 20000


# --- targeted engine semantics (each pinned against a JVM probe run) ------


def test_dm_digits_deleted_before_matching():
    # cleanup keeps isLetter chars only: multi-char patterns match ACROSS
    # deleted digits, and the m/n force-append survives an intervening one
    assert daitch_mokotoff("us2cr") == daitch_mokotoff("uscr") == "049000"
    assert daitch_mokotoff("m2n") == daitch_mokotoff("mn") == "660000"


def test_dm_unfoldable_letter_blocks_lookahead():
    # 'ü' survives cleanup (a letter, no fold, no rule): it blocks the
    # before-vowel lookahead and multi-char patterns but never updates
    # last_char
    assert daitch_mokotoff("svhüi") == "470000"  # h NOT before-vowel
    assert daitch_mokotoff("ávoeüj") == "070000|074000"


def test_dm_branch_merge_is_code_only():
    # branches converging on the same code merge keeping the FIRST
    # insertion's lastReplacement (LinkedHashSet<Branch>, equals on code)
    assert daitch_mokotoff("jjsxpkhuu") == "145475|445475"
    assert daitch_mokotoff("2tel2us2cr") == "384900"


def test_dm_y_is_not_a_vowel_for_context():
    assert daitch_mokotoff("AHY") == "000000"  # h before y -> default ctx


def test_registry_and_filter_contract():
    assert set(ENCODERS) == {
        "Metaphone",
        "DoubleMetaphone",
        "RefinedSoundex",
        "Caverphone",
        "ColognePhonetic",
        "Nysiis",
        "DaitchMokotoff",
    }
    # PhoneticFilter.java:71-80: empty/identical codes leave the token
    assert phonetic_encode("Metaphone", "12345") == "12345"
    assert phonetic_encode("Metaphone", "knight") == "NT"
    assert phonetic_encode("DaitchMokotoff", "Moskowitz") == "645740"
