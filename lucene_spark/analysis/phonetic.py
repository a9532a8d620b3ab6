"""Phonetic encoding (American Soundex) as pure column algebra.

≙ the reference's phonetic analysis module
(analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java:33 with the commons-codec Soundex encoder): tokens
that sound alike encode to the same 4-character key, enabling
sounds-like matching over noisy transcripts (ASR output, typos).

The encoder is implemented twice with the SAME algebra — a Spark Column
expression here and a DuckDB SQL twin in the gate — so phonetic matches
are cross-engine certifiable.  Algorithm (classic American Soundex, the
commons-codec semantics):

1. keep the first letter;
2. delete h/w AFTER the first letter (same-code consonants separated by
   h/w therefore collapse — the commons-codec HW rule);
3. code the letters (b f p v→1, c g j k q s x z→2, d t→3, l→4, m n→5,
   r→6, vowels→0);
4. collapse adjacent equal codes (vowels break adjacency, and the first
   letter's code participates in the collapse);
5. drop the vowel zeros, take three digits, right-pad with '0'.

Everything is JVM-side: translate + regexp + higher-order array
functions — no UDF, safe in a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz"
CODES = "01230120022455012623010202"


def soundex_expr(col: Column) -> Column:
    """Soundex key of a token (lowercase letter + 3 digits; '' for tokens
    with no letters)."""
    t = F.regexp_replace(F.lower(col), "[^a-z]", "")
    first = F.substring(t, 1, 1)
    rest = F.regexp_replace(F.substring(t, 2, 1_000_000), "[hw]", "")
    coded = F.translate(F.concat(first, rest), ALPHABET, CODES)
    chars = F.regexp_extract_all(coded, F.lit("[0-9]"), 0)
    dedup = F.filter(
        chars,
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            F.coalesce(x != F.get(chars, i - 1), F.lit(True))
        ),
    )
    digits = F.array_join(
        F.filter(F.slice(dedup, 2, 1_000_000), lambda x: x != "0"), ""
    )
    return F.when(F.length(t) == 0, F.lit("")).otherwise(
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


def soundex_py(word: str) -> str:
    """Driver-side reference of the same algorithm (for query literals and
    tests)."""
    t = "".join(c for c in word.lower() if c.isalpha() and c.isascii())
    if not t:
        return ""
    first = t[0]
    rest = "".join(c for c in t[1:] if c not in "hw")
    coded = "".join(CODES[ord(c) - 97] for c in first + rest)
    dedup = [c for i, c in enumerate(coded) if i == 0 or c != coded[i - 1]]
    digits = "".join(c for c in dedup[1:] if c != "0")
    return first + (digits[:3].ljust(3, "0"))


def soundex_sql(expr: str) -> str:
    """The same algebra in DuckDB SQL (1-based list lambdas)."""
    return f"""(
  WITH _s AS (
    SELECT regexp_replace(lower({expr}), '[^a-z]', '', 'g') AS t
  ), _c AS (
    SELECT t,
      substr(t, 1, 1) AS first,
      translate(substr(t, 1, 1) ||
                regexp_replace(substr(t, 2), '[hw]', '', 'g'),
                '{ALPHABET}', '{CODES}') AS coded
    FROM _s
  ), _l AS (
    SELECT t, first, regexp_extract_all(coded, '[0-9]') AS l FROM _c
  ), _d AS (
    SELECT t, first,
      list_filter(l, (x, i) -> i = 1 OR x <> l[i - 1]) AS d
    FROM _l
  )
  SELECT CASE WHEN length(t) = 0 THEN ''
         ELSE first || rpad(substr(COALESCE(array_to_string(
                list_filter(d[2:], x -> x <> '0'), ''), ''), 1, 3), 3, '0')
         END
  FROM _d
)"""
