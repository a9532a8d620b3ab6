"""Payloads: per-position float metadata carried through the index.

≙ the reference's payload stack:

* ``analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:39-71`` —
  characters before the FIRST delimiter are the token, those after are the
  payload ("foo|bar" -> term "foo", payload "bar"); a token without the
  delimiter carries a null payload.  The reference warns the tokenizer must
  not split on the delimiter (its tests use WhitespaceTokenizer), so the
  payload index path tokenizes on whitespace (Character.isWhitespace ≙
  ``str.split()``).
* ``FloatEncoder.java`` / ``IntegerEncoder.java`` — payload characters
  parsed as float32 / int32.  The engine stores decoded payloads as a
  float32 array column aligned with the positions array (SURVEY.md data
  model: "BinaryType for payloads" is narrowed to numeric payloads — the
  two encoders PayloadDecoder/PayloadMatcherFactory score and compare by
  value; the raw-bytes IdentityEncoder is out of scope, documented).
* ``queries/.../payloads/PayloadDecoder.java:29`` — a NULL payload decodes
  to factor 1.

Spark-first: the split happens inside the existing Arrow invert pass
(builder._arrow_base), so payloads cost zero extra shuffles — they ride the
same ``_entries`` struct as positions.
"""

from __future__ import annotations

__all__ = [
    "DEFAULT_DELIMITER",
    "split_payload_token",
    "encode_payload",
    "PAYLOAD_ENCODERS",
]

DEFAULT_DELIMITER = "|"


def split_payload_token(raw: str, delimiter: str = DEFAULT_DELIMITER):
    """(term, payload_str|None) — split at the FIRST delimiter occurrence
    (DelimitedPayloadTokenFilter.java:54-67 scans forward and stops at the
    first match; everything after it, including later delimiters, is the
    payload)."""
    i = raw.find(delimiter)
    if i < 0:
        return raw, None
    return raw[:i], raw[i + len(delimiter):]


def _encode_float(s: str) -> float:
    # FloatEncoder.java: Float.parseFloat — malformed payloads raise
    return float(s)


def _encode_int(s: str) -> float:
    # IntegerEncoder.java: ArrayUtil.parseInt; stored in the same float32
    # column (exact for |v| < 2^24 — the realistic payload range)
    return float(int(s))


PAYLOAD_ENCODERS = {"float": _encode_float, "int": _encode_int}


def encode_payload(s, encoder: str = "float"):
    """Decode one payload string to its float factor; None stays None
    (a null payload — PayloadDecoder gives it factor 1 at SCORE time, but
    the index stores the absence, SpanPayloadCheckQuery treats it as
    non-matching)."""
    if s is None:
        return None
    return PAYLOAD_ENCODERS[encoder](s)


def delimited_payload_entries(
    text: str, delimiter: str = DEFAULT_DELIMITER, encoder: str = "float"
):
    """Whitespace-tokenize ``text`` and split each token at the delimiter:
    returns (n_tokens, {term: (positions, payloads)}) — the per-document
    inverted entries the Arrow invert pass emits.  Pure python; runs inside
    mapInPandas batches (never per-row UDF)."""
    toks = text.split() if text else []
    inv: dict = {}
    for pos, raw in enumerate(toks):
        term, pay = split_payload_token(raw, delimiter)
        pv = encode_payload(pay, encoder)
        slot = inv.get(term)
        if slot is None:
            inv[term] = ([pos], [pv])
        else:
            slot[0].append(pos)
            slot[1].append(pv)
    return len(toks), inv
