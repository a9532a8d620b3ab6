"""BM25NBClassifier (classification/BM25NBClassifier.java) vs a
brute-force python simulation built from the raw corpus."""

import math
import re

import pytest


def _simulate(rows, test_keys, k1=1.2, b=0.75):
    """Independent simulation from raw text: plain BM25 with
    byte4-quantized dl, per-class top-1 semantics."""
    from lucene_spark.util.smallfloat import NUM_FREE_VALUES

    def byte4(dl):
        if dl < NUM_FREE_VALUES:
            return dl
        v = dl - NUM_FREE_VALUES
        if v < 8:
            return dl
        nbits = v.bit_length()
        shift = nbits - 4
        enc = ((v >> shift) & 7) | 8
        q = enc << shift
        return NUM_FREE_VALUES + q

    from lucene_spark.analysis.tokenizer import tokenize_text

    docs = {}
    for r in rows:
        toks = tokenize_text(r["text"])
        docs[(r["conv_id"], r["turn_idx"])] = (r["role"], toks)
    n = sum(1 for _, t in docs.values() if t)
    sttf = sum(len(t) for _, t in docs.values())
    avgdl = sttf / n
    df = {}
    for _, toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    # per (class, term) max bm25
    mx = {}
    for (_, _), (cls, toks) in docs.items():
        dl = byte4(len(toks))
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t, f in tf.items():
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * f / (f + k1 * ((1 - b) + b * dl / avgdl))
            key = (cls, t)
            if s > mx.get(key, -1):
                mx[key] = s
    cdf = {}
    for cls, _ in docs.values():
        cdf[cls] = cdf.get(cls, 0) + 1
    nc = sum(cdf.values())
    cs = {
        c: math.log(1 + (nc - d + 0.5) / (d + 0.5)) / (1 + k1)
        for c, d in cdf.items()
    }
    out = {}
    for key in test_keys:
        _, toks = docs[key]
        best = None
        for c in sorted(cs):
            score = math.log(cs[c])
            for t in toks:
                score += math.log(cs[c] + mx.get((c, t), 0.0))
            if best is None or score > best[1] + 1e-12:
                best = (c, score)
        out[key] = best
    return out


def test_bm25_nb_matches_simulation(spark, tiny_corpus, tiny_index):
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.pipeline.classify import bm25_nb_classify

    df = transcripts_df(spark, rows=tiny_corpus)
    test = df.filter("turn_idx = 0")
    got = {
        (r.conv_id, r.turn_idx): (r.assigned, r.log_score)
        for r in bm25_nb_classify(tiny_index, test).collect()
    }
    keys = list(got)
    exp = _simulate(tiny_corpus, keys)
    assert set(got) == set(exp)
    for k in keys:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-9), k
