"""Deletes/updates: tombstones at read (liveDocs semantics), expunge at
merge (forceMergeDeletes semantics)."""

import numpy as np
import pytest

from lucene_spark.index.deletes import expunge, tombstones_df, with_deletes
from lucene_spark.search import IndexSearcher, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def deleted_view(spark, tiny_index):
    ts = tiny_index.docs.filter("turn_idx = 1").select("conv_id", "turn_idx")
    return with_deletes(tiny_index, ts)


def test_deleted_docs_vanish(spark, tiny_index, deleted_view):
    before = IndexSearcher(tiny_index).search(TermQuery("model"), 100).collect()
    after = IndexSearcher(deleted_view).search(TermQuery("model"), 100).collect()
    assert any(r.turn_idx == 1 for r in before)
    assert not any(r.turn_idx == 1 for r in after)


def test_surviving_scores_unchanged_until_expunge(spark, tiny_index, deleted_view):
    """Reference staleness: deleted docs still count in docFreq/avgdl, so
    survivors keep their exact pre-delete float32 scores."""
    before = {
        (r.conv_id, r.turn_idx): r.score
        for r in IndexSearcher(tiny_index).search(TermQuery("model"), 100).collect()
    }
    after = IndexSearcher(deleted_view).search(TermQuery("model"), 100).collect()
    assert len(after) > 0
    for r in after:
        assert np.float32(r.score) == np.float32(before[(r.conv_id, r.turn_idx)])


def test_no_postings_for_dead_docs(spark, tiny_index, deleted_view):
    dead = tiny_index.docs.filter("turn_idx = 1").select("doc_id")
    assert deleted_view.postings.join(dead, "doc_id", "left_semi").count() == 0
    assert deleted_view.docs.join(dead, "doc_id", "left_semi").count() == 0


def test_phrase_on_deleted_view(spark, tiny_index, deleted_view):
    q = PhraseQuery(("the", "model"))
    hits = IndexSearcher(deleted_view).search(q, 50).collect()
    assert not any(r.turn_idx == 1 for r in hits)


def test_expunge_recomputes_stats(spark, tiny_index):
    ts = tiny_index.docs.filter("turn_idx = 1").select("conv_id", "turn_idx")
    ex = expunge(tiny_index, ts)
    n_del = tiny_index.docs.filter("turn_idx = 1").count()
    assert ex.stats["max_doc"] == tiny_index.stats["max_doc"] - n_del
    assert ex.stats["doc_count"] < tiny_index.stats["doc_count"]
    assert ex.stats["sum_total_term_freq"] < tiny_index.stats["sum_total_term_freq"]
    # doc_freq no longer counts deleted docs
    dfq = {r.term: r.doc_freq for r in ex.term_stats.collect()}
    live_docs_with_model = (
        ex.postings.filter("term = 'model'").select("doc_id").distinct().count()
    )
    assert dfq.get("model", 0) == live_docs_with_model
    # expunged index can re-pack and search the packed path
    ex.with_packed()
    hits = IndexSearcher(ex).search(TermQuery("model"), 10)
    assert hits.count() > 0


def test_update_is_delete_plus_add(spark, tiny_index, tiny_corpus):
    """updateDocument analog: tombstone a key, append the replacement rows
    through a fresh build over the unioned corpus, verify the new text
    wins."""
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder

    key_conv, key_turn = tiny_corpus[0]["conv_id"], tiny_corpus[0]["turn_idx"]
    ts = tombstones_df(spark, [(key_conv, key_turn)])
    view = with_deletes(tiny_index, ts)
    assert (
        view.docs.filter(
            (view.docs.conv_id == key_conv) & (view.docs.turn_idx == key_turn)
        ).count()
        == 0
    )
    # replacement corpus row
    new_rows = [dict(tiny_corpus[0], text="entirely replacement zebra text")]
    df = transcripts_df(spark, rows=new_rows)
    idx2 = IndexBuilder(num_segments=1).build(df)
    z = IndexSearcher(idx2).search(TermQuery("zebra"), 5).collect()
    assert len(z) == 1 and z[0].conv_id == key_conv


def test_update_doc_values(spark, tiny_index):
    """updateNumericDocValue analog: the updated column is visible to
    readers (facets/sorts), scores and postings stay byte-identical, and
    non-updated docs keep their values."""
    from lucene_spark.index.deletes import update_doc_values
    from lucene_spark.search import IndexSearcher, TermQuery

    target = [r for r in tiny_index.docs.limit(3).collect()]
    upd = spark.createDataFrame(
        [(r.conv_id, r.turn_idx, "redacted") for r in target],
        "conv_id string, turn_idx int, tool string",
    )
    idx2 = update_doc_values(tiny_index, upd, "tool")

    got = {
        (r.conv_id, r.turn_idx): r.tool
        for r in idx2.docs.collect()
    }
    old = {(r.conv_id, r.turn_idx): r.tool for r in tiny_index.docs.collect()}
    for r in target:
        assert got[(r.conv_id, r.turn_idx)] == "redacted"
    unchanged = set(old) - {(r.conv_id, r.turn_idx) for r in target}
    for key in unchanged:
        assert got[key] == old[key]

    q = TermQuery("model")
    a = IndexSearcher(tiny_index).search(q, 10).collect()
    b = IndexSearcher(idx2).search(q, 10).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]

    # a one-value-column contract violation is rejected loudly
    import pytest as _pt

    bad = upd.withColumn("extra", upd.tool)
    with _pt.raises(ValueError):
        update_doc_values(tiny_index, bad, "tool")
