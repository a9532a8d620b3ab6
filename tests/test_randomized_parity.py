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
