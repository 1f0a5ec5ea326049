"""Decontamination (operators/contamination): overlap detection,
broadcast-join plan shape, keep-side filtering."""

from __future__ import annotations


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "an entirely different document about query optimization in spark"),
        (3, "jumps over the lazy dog is a phrase shared with the benchmark"),
        (4, "short"),  # < k tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )


def test_contamination_report(spark):
    from fulltextsearchengine_spark.operators.contamination import contamination_report

    rep = {r["doc_id"]: r for r in contamination_report(_corpus(spark), _bench(spark), k=4).collect()}
    assert rep[1]["contaminated"] == 1 and rep[1]["shared_ngrams"] >= 5
    assert rep[2]["contaminated"] == 0 and rep[2]["shared_ngrams"] == 0
    assert rep[3]["contaminated"] == 1  # shares "jumps over the lazy (dog)"
    assert rep[4]["contaminated"] == 0 and rep[4]["n_ngrams"] == 0
    assert len(rep) == 4  # every corpus doc reported


def test_decontaminate_keeps_clean_docs(spark):
    from fulltextsearchengine_spark.operators.contamination import decontaminate

    kept = sorted(
        r["doc_id"] for r in decontaminate(_corpus(spark), _bench(spark), k=4).collect()
    )
    assert kept == [2, 4]


def test_broadcast_join_shape(spark):
    # the corpus side must NOT shuffle for the probe: benchmark shingles
    # broadcast
    from fulltextsearchengine_spark.operators.contamination import contamination_report

    plan = (
        contamination_report(_corpus(spark), _bench(spark), k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
