"""Randomized-corpus parity sweep (≙ RandomIndexWriter-style testing,
SURVEY.md §5): fresh seeded corpora, queries derived from each corpus's own
vocabulary (head/mid/rare df bands), engine must be rank- and
score-identical to the oracle on every one."""

import random

import pytest

from lucene_spark.fixtures import generate_transcripts, transcripts_df
from lucene_spark.index import IndexBuilder
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, PhraseQuery, TermQuery


def _topk(searcher, q, k):
    return [
        (r.conv_id, r.turn_idx, float(r.score))
        for r in searcher.search(q, k).collect()
    ]


def _oracle_topk(oracle, hits):
    return [(c, t, float(s)) for c, t, s in oracle.topk_keys(hits)]


@pytest.mark.parametrize("seed", [2024, 31337, 777])
def test_randomized_corpus_parity(spark, seed):
    rows = generate_transcripts(n_convs=12, seed=seed)
    oracle = OracleIndex.build(rows)
    idx = IndexBuilder(num_segments=3).build(transcripts_df(spark, rows=rows))
    searcher = IndexSearcher(idx)

    # derive query terms from THIS corpus: head / mid / rare df bands
    by_df = sorted(oracle.postings, key=lambda t: (-oracle.doc_freq(t), t))
    rng = random.Random(seed)
    head = by_df[0]
    mid = by_df[len(by_df) // 2]
    rare = by_df[-1]
    extra = rng.sample(by_df, min(4, len(by_df)))

    cases = [
        ("or", [head, mid]),
        ("or", [mid, rare] + extra[:2]),
        ("and", [head, extra[0]]),
        ("not", [head, extra[1]]),
        ("phrase", [head, mid]),
    ]
    for kind, terms in cases:
        if kind == "or":
            got = _topk(
                searcher,
                BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms]),
                10,
            )
            want = _oracle_topk(oracle, oracle.search_or(terms, 10))
        elif kind == "and":
            got = _topk(
                searcher,
                BooleanQuery.of(*[(TermQuery(t), Occur.MUST) for t in terms]),
                10,
            )
            want = _oracle_topk(oracle, oracle.search_and(terms, 10))
        elif kind == "not":
            got = _topk(
                searcher,
                BooleanQuery.of(
                    (TermQuery(terms[0]), Occur.MUST),
                    (TermQuery(terms[1]), Occur.MUST_NOT),
                ),
                10,
            )
            want = _oracle_topk(oracle, oracle.search_not(terms[:1], terms[1:], 10))
        else:
            got = _topk(searcher, PhraseQuery(tuple(terms)), 10)
            want = _oracle_topk(oracle, oracle.search_phrase(terms, 10))
        assert got == want, f"seed={seed} {kind} {terms}"

    # pruned path agrees too (packed over this random corpus)
    idx.with_packed(chunk_bits=4)
    q = BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in [head, mid, rare]])
    assert _topk(searcher, q, 10) == [
        (r.conv_id, r.turn_idx, float(r.score))
        for r in searcher.search(q, 10, prune=True).collect()
    ]
    idx.unpersist_all()


@pytest.mark.parametrize("seed", [11, 97])
def test_randomized_pack_parity(spark, seed):
    """Greedy packing == the sequential python reference on random
    length sequences and random caps (exact reset semantics)."""
    from lucene_spark.pipeline.pack import pack_sequences

    rng = random.Random(seed)
    rows = []
    for c in range(8):
        for t in range(rng.randint(1, 25)):
            rows.append((f"c{c}", t, rng.randint(0, 40)))
    cap = rng.randint(5, 60)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")
    got = {
        (r.conv_id, r.turn_idx): r.bin
        for r in pack_sequences(df, cap=cap).collect()
    }
    by_conv = {}
    for c, t, n in rows:
        by_conv.setdefault(c, []).append((t, n))
    for c, turns in by_conv.items():
        running, b = 0, 0
        for t, n in sorted(turns):
            if running > 0 and running + n > cap:
                b, running = b + 1, n
            else:
                running += n
            assert got[(c, t)] == b, (seed, cap, c, t)


@pytest.mark.parametrize("seed", [5, 41])
def test_randomized_diversified_parity(spark, tiny_index, seed):
    """search_diversified == brute force for random caps and random
    vocabulary-derived OR queries."""
    from lucene_spark.search import IndexSearcher

    searcher = IndexSearcher(tiny_index)
    vocab = sorted(
        {r.term for r in tiny_index.term_stats.limit(500).collect()}
    )
    rng = random.Random(seed)
    terms = rng.sample(vocab, min(3, len(vocab)))
    q = BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
    scored = {r.doc_id: r.score for r in searcher._scored(q).collect()}
    if not scored:
        pytest.skip("random terms matched nothing")
    keys = {r.doc_id: r.conv_id for r in tiny_index.docs.collect()}
    m = rng.randint(1, 3)
    k = rng.randint(3, 12)
    got = [r.doc_id for r in searcher.search_diversified(q, k, m).collect()]
    by_key = {}
    for d in sorted(scored, key=lambda d: (-scored[d], d)):
        by_key.setdefault(keys[d], []).append(d)
    surv = [d for ds in by_key.values() for d in ds[:m]]
    want = sorted(surv, key=lambda d: (-scored[d], d))[:k]
    assert got == want, (seed, m, k)
