"""BooleanPerceptronClassifier
(classification/BooleanPerceptronClassifier.java:59-240): hand-computed
sequential-update cases incl. the stale-FST batch semantics."""

import math

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    from lucene_spark.fixtures.transcripts import transcripts_df

    return transcripts_df(
        spark,
        rows=[
            {
                "conv_id": c,
                "turn_idx": t,
                "role": r,
                "text": x,
                "tool": "",
                "ts": None,
            }
            for c, t, r, x in rows
        ],
    )


CORPUS = [
    ("c0", 0, "neg", "a a b"),
    ("c0", 1, "pos", "a c"),
    ("c1", 0, "neg", "b b c"),
    ("c1", 1, "neg", "d"),
]
# ttf: a=3 b=3 c=2 d=1; sttf=9, doc_count=4, bias=2.25


def _run(spark, train, batch_size=1):
    from lucene_spark.pipeline.classify import boolean_perceptron

    docs = _docs(spark, CORPUS)
    keys = docs.filter(
        F.struct("conv_id", "turn_idx").isin(
            [F.struct(F.lit(c), F.lit(t)) for c, t in train]
        )
    ).select("conv_id", "turn_idx", (F.col("role") == "pos").alias("label"))
    out = boolean_perceptron(docs, keys, "label", batch_size=batch_size)
    return {
        (r.conv_id, r.turn_idx): (r.out_w, r.assigned, r.score)
        for r in out.collect()
    }


def test_perceptron_hand_case(spark):
    # train c0/0 (neg, misclassified: 9 >= 2.25) -> a: 3-2=1, b: 3-1=2;
    # then c0/1 (pos, 1+2=3 >= 2.25 correct) -> no update
    got = _run(spark, [("c0", 0), ("c0", 1)])
    bias = 9.0 / 4.0
    exp_out = {
        ("c0", 0): 2 * 1 + 1 * 2,  # 4
        ("c0", 1): 1 + 2,          # 3
        ("c1", 0): 2 * 2 + 2,      # 6
        ("c1", 1): 1,              # 1 < bias -> False
    }
    for k, (out_w, assigned, score) in got.items():
        assert out_w == exp_out[k], k
        assert assigned == (out_w >= bias)
        assert score == pytest.approx(1 - math.exp(-abs(bias - out_w) / bias))


def test_perceptron_stale_fst_batch(spark):
    # batch_size=2: c0/0's update rebuilds the FST (batchCount 0 % 2 == 0),
    # c1/0's update does NOT (batchCount 1) — the final snapshot ignores it
    # (updateWeights reads through the stale FST and updateFST gates the
    # rebuild — BooleanPerceptronClassifier.java:170-220).
    got1 = _run(spark, [("c0", 0), ("c1", 0)], batch_size=2)
    got2 = _run(spark, [("c0", 0)], batch_size=2)
    assert got1 == got2  # the second update never became visible


def test_perceptron_batch1_sees_every_update(spark):
    got = _run(spark, [("c0", 0), ("c1", 0)], batch_size=1)
    # after c0/0: a=1 b=2; c1/0 (neg): out = 2*2+2 = 6 >= 2.25, wrong ->
    # b = max(0, 2-2) = 0, c = max(0, 2-1) = 1
    assert got[("c1", 0)][0] == 2 * 0 + 1  # 1
    assert got[("c0", 0)][0] == 2 * 1 + 0  # 2


def test_perceptron_train_cap(spark):
    from lucene_spark.pipeline.classify import boolean_perceptron

    docs = _docs(spark, CORPUS)
    keys = docs.select(
        "conv_id", "turn_idx", (F.col("role") == "pos").alias("label")
    )
    with pytest.raises(ValueError, match="max_train_docs"):
        boolean_perceptron(docs, keys, "label", max_train_docs=2).collect()
