"""Monitor / percolator: registered queries vs document batches, verified
against forward search over the same corpus."""

import pytest

from lucene_spark.search import (
    BooleanQuery,
    IndexSearcher,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_spark.streaming.monitor import Monitor

QUERIES = {
    "q_term": TermQuery("model"),
    "q_bool": BooleanQuery.of(
        (TermQuery("data"), Occur.MUST), (TermQuery("slow"), Occur.MUST_NOT)
    ),
    "q_phrase": PhraseQuery(("the", "model")),
    "q_sloppy": PhraseQuery(("model", "data"), slop=3),
    "q_prefix": PrefixQuery("mod"),
    "q_nested": BooleanQuery.of(
        (TermQuery("spark"), Occur.SHOULD), (TermQuery("query"), Occur.SHOULD),
        min_should_match=2,
    ),
}


@pytest.fixture(scope="module")
def docs(spark, tiny_corpus):
    from lucene_spark.fixtures import transcripts_df

    return transcripts_df(spark, rows=tiny_corpus)


def test_monitor_matches_forward_search(spark, docs, tiny_index):
    mon = Monitor(QUERIES)
    got = mon.match_batch(docs, id_cols=("conv_id", "turn_idx")).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add((r.conv_id, r.turn_idx))
    s = IndexSearcher(tiny_index)
    for qid, q in QUERIES.items():
        fwd = {
            (r.conv_id, r.turn_idx)
            for r in s.search(q, 100000).collect()
        }
        assert by_q.get(qid, set()) == fwd, qid


def test_pure_negation_rejected():
    with pytest.raises(ValueError):
        Monitor({"bad": BooleanQuery.of((TermQuery("x"), Occur.MUST_NOT))})


def test_monitor_streaming_attach(spark, docs, tmp_path):
    import os

    src = str(tmp_path / "src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    mon = Monitor({"q_term": TermQuery("model")})
    out = []

    def sink(matches, batch_id):
        out.extend(
            (r.conv_id, r.turn_idx) for r in matches.collect()
        )

    q = mon.attach(
        stream, sink, id_cols=("conv_id", "turn_idx"),
        checkpoint=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(300)
    batch = {
        (r.conv_id, r.turn_idx)
        for r in mon.match_batch(docs, id_cols=("conv_id", "turn_idx")).collect()
    }
    assert set(out) == batch and len(batch) > 0
