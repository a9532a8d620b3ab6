"""DictionaryCompoundWordTokenFilter — dictionary-based decompounding.

Reference: analysis/common/src/java/org/apache/lucene/analysis/compound/
DictionaryCompoundWordTokenFilter.java:58 (decompose(): for every start
position, every dictionary word of length [minSubwordSize,
maxSubwordSize] found in the token is emitted as a subword at the
token's position alongside the ORIGINAL; onlyLongestMatch keeps only
the longest match per start position) and CompoundWordTokenFilterBase
(tokens shorter than minWordSize pass through untouched; subwords carry
posInc 0 — overlap-discounted, so dl/norms stay the surface counts, the
same argument as keyword_repeat).

The German/Swedish/Dutch decompounding layout: "Vindrutetorkare" is
indexed under itself plus Vind/rute/torkare, so queries for the parts
recall the compound.  Dictionary matching is case-insensitive (the
reference's CharArraySet(ignoreCase)); emitted subwords keep the
original token's characters.

Integration: a MULTI-OUTPUT dictionary-stage function (like hunspell
all_stems) — runs once per distinct term over the vocabulary, never per
token.  Declared subset: a subword repeated inside one compound is
indexed once (the dictionary-stage expansion is a set per term; the
reference emits each occurrence — only tf of the subword within that
single compound differs).

The HyphenationCompoundWordTokenFilter variant (TeX hyphenation-pattern
XML grammars) is out of scope — the dictionary variant is the
deterministic subset the fixtures can pin.
"""

from __future__ import annotations


def decompound_fn(
    dictionary,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """term -> [term, subword...] multi-output function
    (DictionaryCompoundWordTokenFilter.decompose, emission order
    preserved: start position ascending, then subword length)."""
    if min_word_size <= 0:
        raise ValueError("minWordSize must be > 0")
    if min_subword_size <= 0 or max_subword_size < min_subword_size:
        raise ValueError("bad subword size range")
    folded = frozenset(w.lower() for w in dictionary)

    def fn(term: str):
        out = [term]
        n = len(term)
        if n < min_word_size:
            return out
        lower = term.lower()
        for i in range(0, n - min_subword_size + 1):
            longest = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > n:
                    break
                if lower[i : i + j] in folded:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = term[i : i + j]
                    else:
                        out.append(term[i : i + j])
            if only_longest_match and longest is not None:
                out.append(longest)
        return out

    fn.emits_multiple = True
    return fn


def register_decompounder(
    name: str,
    dictionary,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
) -> str:
    """Register a decompounder in the dictionary-stage stemmer slot
    (``Analyzer(stemmer=name)``) — the DictionaryCompoundWordTokenFilter-
    Factory plug point.  Session-scoped, like hunspell.register_stemmer."""
    from lucene_spark.analysis.analyzer import DICT_STEMMERS

    DICT_STEMMERS[name] = decompound_fn(
        dictionary,
        min_word_size=min_word_size,
        min_subword_size=min_subword_size,
        max_subword_size=max_subword_size,
        only_longest_match=only_longest_match,
    )
    return name
