#!/usr/bin/env python3
"""Generate Snowball parity-vector archives from the REFERENCE's own code.

The earlier analyzer waves validated each light stemmer against the
vector archives the reference ships (fr 20,403 / de 35,033 / ... pairs).
The reference ships NO such archives for its Snowball stemmers, so this
script manufactures equivalent evidence: it compiles the reference's
public-domain org.tartarus.snowball package (pure JDK, no Lucene deps)
plus scripts/dev/Gen.java, synthesizes a rule-covering vocabulary per
language, runs the COMPILED REFERENCE stemmer over it, and stores the
(word, stem) pairs under lucene_spark/analysis/data/snowball_<code>.tsv.gz.
tests/test_snowball.py then replays every archive through the Python
translations — exact string parity, same bar as the shipped archives.

Vocabulary construction (deterministic, seed fixed per language):
  - every `among` search string from the generated tables, alone and
    appended to random stems of length 1-8 (drives every rule arm and
    both sides of every region/length precondition),
  - random suffix CHAINS (stem + among + among) for derivational rules,
  - 20,000 random words over the language's own alphabet (the among
    alphabet + stopword-list alphabet), lengths 1-12,
  - the language's stopword list and the reference analyzer test words.

Run:  python scripts/dev/gen_snowball_vectors.py   (re-generates all)
"""

from __future__ import annotations

import gzip
import importlib
import os
import random
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference/lucene/analysis/common/src/java"
WORK = "/tmp/snowball_gen"
DATA = os.path.join(REPO, "lucene_spark", "analysis", "data")

# (java class prefix, python module, archive code, extra seed words)
LANGS = [
    ("Danish", "danish", "da"),
    ("Dutch", "dutch", "nl"),
    ("Romanian", "romanian", "ro"),
    ("Catalan", "catalan", "ca"),
    ("Lithuanian", "lithuanian", "lt"),
    ("Irish", "irish", "ga"),
    ("Armenian", "armenian", "hy"),
    ("Basque", "basque", "eu"),
    ("Nepali", "nepali", "ne"),
    ("Estonian", "estonian", "et"),
    ("Tamil", "tamil", "ta"),
    ("Turkish", "turkish", "tr"),
    ("Serbian", "serbian", "sr"),
    ("English", "english_sb", "en2"),
]


def compile_reference() -> None:
    os.makedirs(WORK, exist_ok=True)
    if os.path.exists(os.path.join(WORK, "Gen.class")):
        return
    srcs = []
    for root, _, files in os.walk(os.path.join(REF, "org", "tartarus")):
        srcs += [os.path.join(root, f) for f in files if f.endswith(".java")]
    subprocess.run(
        ["javac", "-d", WORK, os.path.join(REPO, "scripts", "dev", "Gen.java"), *srcs],
        check=True,
    )


def vocabulary(pymod: str, code: str) -> list[str]:
    mod = importlib.import_module(f"lucene_spark.analysis.snowball.{pymod}")
    amongs: list[str] = []
    for name in dir(mod):
        if re.fullmatch(r"_a_\d+", name):
            amongs += [a.s for a in getattr(mod, name) if a.s]
    alphabet = sorted({ch for s in amongs for ch in s})
    if all(ord(c) < 0x250 for c in alphabet):
        alphabet = sorted(set(alphabet) | set("abcdefghijklmnopqrstuvwxyz"))
    rng = random.Random(f"snowball-{code}")
    words: set[str] = set(amongs)
    for s in amongs:
        for _ in range(40):
            stem = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            words.add(stem + s)
    for _ in range(4000):
        stem = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        words.add(stem + rng.choice(amongs) + rng.choice(amongs))
    for _ in range(20000):
        words.add(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        )
    return sorted(words)


def main() -> None:
    compile_reference()
    only = set(sys.argv[1:])
    for java, pymod, code in LANGS:
        if only and code not in only:
            continue
        words = vocabulary(pymod, code)
        proc = subprocess.run(
            ["java", "-cp", WORK, "Gen", java],
            input="\n".join(words).encode(),
            capture_output=True,
            check=True,
        )
        out = os.path.join(DATA, f"snowball_{code}.tsv.gz")
        with gzip.open(out, "wb", compresslevel=9) as f:
            f.write(proc.stdout)
        n = proc.stdout.count(b"\n")
        print(f"{code}: {n} pairs -> {out}")


if __name__ == "__main__":
    main()
