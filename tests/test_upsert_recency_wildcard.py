"""Conversation upsert (batch-rebuild identity), recency-decayed
ranking, and trigram wildcard term lookup vs brute-force oracles."""

from __future__ import annotations

import math
from datetime import datetime
from fnmatch import fnmatchcase

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.index_build import build_index, load_index
from fulltextsearchengine_spark.operators.lexicon import (
    build_trigram_index,
    wildcard_term_lookup,
)
from fulltextsearchengine_spark.operators.recency import recency_boosted_search
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.operators.upsert import upsert_conversations
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    return golden, idx, sdf


# ---------------------------------------------------------------- upsert


def _collect_index(idx):
    return {
        "docs": sorted(
            (r["doc_id"], r["conv_id"], r["turn_idx"], r["role"], r["doc_len"])
            for r in idx.docs.collect()
        ),
        "postings": sorted(
            (r["term"], r["doc_id"], r["tf"], r["doc_len"])
            for r in idx.postings.collect()
        ),
        "terms": sorted(
            (r["term"], r["df"], r["cf"]) for r in idx.terms.collect()
        ),
        "stats": idx.stats_row(),
        "conv_ranges": sorted(
            (r["conv_id"], r["from_doc_id"], r["to_doc_id"], r["n_docs"])
            for r in idx.conv_ranges.collect()
        ),
    }


def test_upsert_equals_full_rebuild(spark, small_transcripts_pdf, tmp_path):
    """Replace two convs (one text change, one turn added) + insert a
    brand-new conv; upsert output must equal a from-scratch build over
    the patched corpus, table by table."""
    pdf = small_transcripts_pdf
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    old_idx = build_index(sdf)

    patched = pdf.copy()
    # conv A: rewrite one turn's text
    a = patched["conv_id"].iloc[0]
    patched.loc[patched["conv_id"] == a, "text"] = "totally new wording here"
    # conv B: keep, but append a turn
    b = sorted(set(patched["conv_id"]))[1]
    extra = patched[patched["conv_id"] == b].iloc[-1:].copy()
    extra["turn_idx"] = extra["turn_idx"] + 1
    extra["text"] = "an appended follow up turn"
    # conv C: brand new
    new = extra.copy()
    new["conv_id"] = "conv_zzz999"
    new["turn_idx"] = 0
    new["text"] = "fresh conversation entirely"
    import pandas as pd

    patched = pd.concat([patched, extra, new], ignore_index=True)

    delta_pdf = patched[patched["conv_id"].isin([a, b, "conv_zzz999"])]
    delta = spark.createDataFrame(delta_pdf, schema=TRANSCRIPT_SCHEMA)

    out = str(tmp_path / "upserted")
    upsert_conversations(old_idx, delta, out)
    got = _collect_index(load_index(spark, out))

    exp_idx = build_index(spark.createDataFrame(patched, schema=TRANSCRIPT_SCHEMA))
    exp = _collect_index(exp_idx)
    for key in exp:
        assert got[key] == exp[key], key


def test_upsert_pure_insert(spark, tiny_transcripts_pdf, tmp_path):
    """Upserting only unseen conv_ids is a plain append."""
    import pandas as pd

    pdf = tiny_transcripts_pdf
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    old_idx = build_index(sdf)
    new = pdf.iloc[:3].copy()
    new["conv_id"] = ["conv_new_01"] * 3
    new["turn_idx"] = [0, 1, 2]
    out = str(tmp_path / "ins")
    upsert_conversations(
        old_idx, spark.createDataFrame(new, schema=TRANSCRIPT_SCHEMA), out
    )
    got = _collect_index(load_index(spark, out))
    exp = _collect_index(
        build_index(
            spark.createDataFrame(
                pd.concat([pdf, new], ignore_index=True), schema=TRANSCRIPT_SCHEMA
            )
        )
    )
    for key in exp:
        assert got[key] == exp[key], key


# ---------------------------------------------------------------- recency


def test_recency_boosted_rank_identity(setup, small_transcripts_pdf):
    golden, idx, _ = setup
    searcher = Searcher(idx)
    now = "2026-02-01 00:00:00"
    hl = 7.0
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    ts_of = {r.doc_id: r.ts for r in docs.itertuples(index=False)}
    now_dt = datetime.fromisoformat(now)
    for q in (["aa", "ahc", "auir"], ["db", "doa", "eoi"]):
        base = dict(oracle.bm25_search(golden, q, golden["num_docs"]))
        exp = sorted(
            (
                (
                    d,
                    s
                    * 2.0
                    ** (
                        -max((now_dt - ts_of[d].to_pydatetime()).total_seconds(), 0.0)
                        / 86400.0
                        / hl
                    ),
                )
                for d, s in base.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:K]
        got = [
            (r["doc_id"], r["score"])
            for r in recency_boosted_search(
                searcher, q, now, K, half_life_days=hl
            ).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in exp], q
        for (_, es), (_, gs) in zip(exp, got):
            assert gs == pytest.approx(es, rel=1e-9)


def test_recency_rejects_bad_half_life(setup):
    _, idx, _ = setup
    with pytest.raises(ValueError):
        recency_boosted_search(Searcher(idx), ["aa"], "2026-01-01 00:00:00", 5, 0.0)


# ---------------------------------------------------------------- wildcard


def _brute_wildcard(golden, pattern, k):
    cf = golden["term_to_collection_frequency"]
    df = golden["term_to_document_frequency"]
    hits = [t for t in cf if fnmatchcase(t, pattern)]
    ranked = sorted(hits, key=lambda t: (-cf[t], t))[:k]
    return [(t, df[t], cf[t]) for t in ranked]


@pytest.mark.parametrize("pattern", ["*aa*", "h*", "*oi", "*cvv*z*", "a*r"])
def test_wildcard_lookup_matches_fnmatch(setup, pattern):
    golden, idx, _ = setup
    exp = _brute_wildcard(golden, pattern, K)
    # ad-hoc trigram path
    got = [
        (r["term"], r["df"], r["cf"])
        for r in wildcard_term_lookup(idx.terms, pattern, K).collect()
    ]
    assert got == exp, pattern
    # prebuilt-sidecar path
    tri = build_trigram_index(idx.terms).cache()
    got2 = [
        (r["term"], r["df"], r["cf"])
        for r in wildcard_term_lookup(idx.terms, pattern, K, trigram_index=tri).collect()
    ]
    assert got2 == exp, pattern


def test_wildcard_short_segment_fallback(setup):
    """No segment >= 3 chars -> dictionary LIKE scan, still exact."""
    golden, idx, _ = setup
    pattern = "*a*"
    exp = _brute_wildcard(golden, pattern, K)
    got = [
        (r["term"], r["df"], r["cf"])
        for r in wildcard_term_lookup(idx.terms, pattern, K).collect()
    ]
    assert got == exp
