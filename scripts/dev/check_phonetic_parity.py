#!/usr/bin/env python3
"""Diff the Python phonetic encoders against the commons-codec archive.

Prints per-encoder mismatch counts and the first few diffs; exits 0 only
at exact parity. Used while converging the transliterations."""

from __future__ import annotations

import gzip
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from lucene_spark.analysis.phonetic_codecs import (  # noqa: E402
    caverphone2,
    cologne_phonetic,
    daitch_mokotoff,
    double_metaphone,
    metaphone,
    nysiis,
    refined_soundex,
)

ARCHIVE = os.path.join(REPO, "lucene_spark", "analysis", "data", "phonetic_vectors.tsv.gz")

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


def main() -> int:
    only = sys.argv[1:] or list(COLS)
    with gzip.open(ARCHIVE, "rt", encoding="utf-8") as f:
        header = f.readline().rstrip("\n").split("\t")
        idx = {name: header.index(name) for name in COLS}
        rows = [line.rstrip("\n").split("\t") for line in f]
    total_bad = 0
    for name in only:
        fn = COLS[name]
        bad = []
        for cols in rows:
            w = cols[0]
            expect = cols[idx[name]]
            got = fn(w)
            if got != expect:
                bad.append((w, expect, got))
        total_bad += len(bad)
        print(f"{name}: {len(rows) - len(bad)}/{len(rows)} exact, {len(bad)} diffs")
        for w, e, g in bad[:8]:
            print(f"    {w!r}: expect {e!r} got {g!r}")
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
