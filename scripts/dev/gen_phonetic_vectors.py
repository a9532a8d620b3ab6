#!/usr/bin/env python3
"""Generate phonetic parity-vector archives from commons-codec itself.

The reference's phonetic module (analysis/phonetic/.../PhoneticFilter.java,
PhoneticFilterFactory.java, DoubleMetaphoneFilter.java,
DaitchMokotoffSoundexFilter.java) delegates every encoding to Apache
Commons Codec.  The sandbox ships the REAL commons-codec (1.19.0) inside
pyspark's jar directory, so — exactly like gen_snowball_vectors.py did
with the compiled reference Snowball classes — we run a deterministic
vocabulary through the genuine encoders via the JVM gateway and store
(word, code...) rows.  tests/test_phonetic_codecs.py then replays the
archive through the Python transliterations: exact string parity.

Vocabulary (deterministic):
  - the distinct [a-z0-9]+ tokens of the sf0.001/sf0.01 documents tables
    and of the synthetic transcripts fixture (what the gates tokenize),
  - the reference's own TestPhoneticFilter/TestDoubleMetaphoneFilter
    inputs,
  - classic surname/spelling-variant sets exercising each algorithm's
    edge rules (kn-, wr-, gh, tio, sch, -mb, umlauts ...),
  - 20,000 seeded random letter strings (incl. umlaut/ß/accents rows for
    ColognePhonetic and the y/vowel rules of Caverphone),
  - digit/punct tokens (the non-encodable path).

Columns: word, metaphone4, metaphone8, dm_primary4, dm_alternate4,
dm_primary8, dm_alternate8, refined_soundex, caverphone2, nysiis,
cologne, daitch_mokotoff ('|'-joined branch set).

Run:  python scripts/dev/gen_phonetic_vectors.py
"""

from __future__ import annotations

import gzip
import os
import random
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "lucene_spark", "analysis", "data")
OUT = os.path.join(DATA, "phonetic_vectors.tsv.gz")

EDGE_WORDS = [
    # reference test inputs (TestPhoneticFilter / TestDoubleMetaphoneFilter)
    "aaa", "bbb", "ccc", "easgasg", "Darda", "Karleen", "Datha", "Carlene",
    "international", "Kuczewski", "hello", "12345", "#$%@#^%&",
    # classic phonetic edge sets
    "Thompson", "Thomson", "Smith", "Smythe", "Schmidt", "Schneider",
    "Knight", "Night", "Wright", "Rite", "Pneumonia", "Gnome", "Aegean",
    "Xavier", "Czech", "Chianti", "Chair", "Chris", "Character", "Cough",
    "Rough", "Tough", "Enough", "Trough", "Laugh", "Dumb", "Lamb", "Comb",
    "Judge", "Edge", "Budget", "Nation", "Spatial", "Mission", "Vision",
    "Jose", "San Jose", "Yankelovich", "Jankelowicz", "Peters", "Peterson",
    "Moskowitz", "Moskovitz", "Auerbach", "Uhrbach", "Lipshitz", "Lewinsky",
    "Szlamawicz", "Shlamovitz", "Ceniza", "Tsenyuv", "Holubica", "Golubitsa",
    "Przemysl", "Pshemeshil", "Rosochowaciec", "Rosokhovatsets",
    "Mueller", "Müller", "Mueller-Luedenscheidt", "Müller-Lüdenscheidt",
    "Breschnew", "Wikipedia", "Meier", "Mayr", "Meyer", "Maier", "Mair",
    "Straße", "Strasse", "Großmann", "Grossmann", "François", "Renée",
    "O'Brien", "D'Angelo", "McDonald", "MacDonald", "Knuth", "Kant",
    "Lloyd", "Ladd", "Phillip", "Filip", "Wachs", "Vax", "Caesar",
    "Tymczak", "Jonathan", "Johnathan", "Gough", "Ghost", "Ghoul",
    "Island", "Isle", "Sugar", "Sure", "Ocean", "Michael", "Michelle",
    "Jesus", "Bajador", "Cabrillo", "Gallegos", "Wewski", "Zhao", "Xiao",
    "Filipowicz", "Filipowitz", "Aleksander", "Alexander", "Wheaton",
    "Whirl", "Why", "Hugh", "Huw", "Hew", "Yehudi", "Eugene", "Agnes",
    "Signature", "Resignation", "Designed", "Campbell", "Raspberry",
    "Subtle", "Doubt", "Debt", "Tchaikovsky", "Stschedrin", "Catherine",
    "Katherine", "Kathryn",
]


def _vocab() -> list[str]:
    import duckdb

    words: set[str] = set(EDGE_WORDS)
    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if os.path.exists(path):
            words |= {
                r[0]
                for r in con.execute(
                    "SELECT DISTINCT unnest(regexp_extract_all("
                    f"lower(text), '[a-z0-9]+')) FROM read_parquet('{path}')"
                ).fetchall()
            }
    try:
        from lucene_spark.fixtures.transcripts import generate_transcripts

        import re as _re

        for row in generate_transcripts(n_convs=500):
            words |= set(_re.findall(r"[a-z0-9]+", row["text"].lower()))
    except Exception as exc:  # pragma: no cover
        print("transcripts fixture skipped:", exc)

    rng = random.Random(20260820)
    letters = string.ascii_lowercase
    specials = "äöüßáéèêçñy"
    for _ in range(14000):
        n = rng.randint(1, 12)
        words.add("".join(rng.choice(letters) for _ in range(n)))
    for _ in range(3000):
        n = rng.randint(2, 10)
        words.add(
            "".join(
                rng.choice(letters if rng.random() < 0.8 else specials)
                for _ in range(n)
            )
        )
    for _ in range(3000):
        # vowel/y-dense rows for the Caverphone group rules
        n = rng.randint(2, 10)
        words.add("".join(rng.choice("aeiouywh23rlmnstkgc") for _ in range(n)))
    # mixed-case variants
    out = sorted(words)
    for w in list(out[::7]):
        words.add(w.capitalize())
        words.add(w.upper())
    return sorted(words)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm = spark._jvm
    lang = jvm.org.apache.commons.codec.language
    met4 = lang.Metaphone()
    met8 = lang.Metaphone()
    met8.setMaxCodeLen(8)
    dm4 = lang.DoubleMetaphone()
    dm8 = lang.DoubleMetaphone()
    dm8.setMaxCodeLen(8)
    refined = lang.RefinedSoundex()
    caver = lang.Caverphone2()
    nysiis = lang.Nysiis()
    cologne = lang.ColognePhonetic()
    dmsdx = lang.DaitchMokotoffSoundex()

    def enc(fn, w):
        try:
            return fn(w) or ""
        except Exception:
            return "<ERR>"

    words = _vocab()
    print(f"{len(words)} words")
    os.makedirs(DATA, exist_ok=True)
    rows = 0
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        f.write(
            "word\tmetaphone4\tmetaphone8\tdm_primary4\tdm_alternate4"
            "\tdm_primary8\tdm_alternate8\trefined_soundex\tcaverphone2"
            "\tnysiis\tcologne\tdaitch_mokotoff\n"
        )
        for w in words:
            if "\t" in w or "\n" in w:
                continue
            cols = [
                w,
                enc(met4.metaphone, w),
                enc(met8.metaphone, w),
                enc(lambda x: dm4.doubleMetaphone(x, False), w),
                enc(lambda x: dm4.doubleMetaphone(x, True), w),
                enc(lambda x: dm8.doubleMetaphone(x, False), w),
                enc(lambda x: dm8.doubleMetaphone(x, True), w),
                enc(refined.soundex, w),
                enc(caver.encode, w),
                enc(nysiis.encode, w),
                enc(cologne.encode, w),
                enc(dmsdx.soundex, w),
            ]
            f.write("\t".join(cols) + "\n")
            rows += 1
    print(f"wrote {rows} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
