"""Spell-corrected search vs brute-force dictionary oracle, and the
index integrity checker on healthy + deliberately corrupted indexes."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.fsck import index_check
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.operators.spellcheck import (
    _lev1,
    spell_correct_query,
    spell_corrected_bm25_search,
)
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    return golden, idx, Searcher(idx)


# ------------------------------------------------------------ spellcheck


def test_lev1_unit():
    assert _lev1("spark", "spark")
    assert _lev1("spark", "sparc")  # substitution
    assert _lev1("spark", "spak")  # deletion
    assert _lev1("spak", "spark")  # insertion
    assert not _lev1("spark", "spk")
    assert not _lev1("ab", "ba")  # the FastSS false-positive pair


def _brute_correct(golden, term):
    """Highest-cf dictionary term within edit distance 1 (tie: asc)."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cands = [
        (t, cf)
        for t, cf in golden["term_to_collection_frequency"].items()
        if lev(t, term) <= 1
    ]
    if not cands:
        return None
    return min(cands, key=lambda kv: (-kv[1], kv[0]))[0]


def test_spell_correct_matches_brute_force(setup):
    golden, idx, _ = setup
    vocab = golden["term_to_collection_frequency"]
    some = sorted(vocab)[50]
    typo_sub = some[:-1] + ("x" if some[-1] != "x" else "y")  # substitution
    typo_ins = some + "q"  # insertion
    q = [some, typo_sub, typo_ins, "zzzzzzzzz"]
    corrected, corr = spell_correct_query(idx.terms, q)
    # in-vocab term untouched
    assert corrected[0] == some and some not in corr
    # typos resolve exactly as the brute-force dictionary oracle says
    for typo, got in ((typo_sub, corrected[1]), (typo_ins, corrected[2])):
        expected = _brute_correct(golden, typo)
        if expected is None:
            assert got == typo and typo not in corr
        else:
            assert got == expected and corr[typo] == expected
    # hopeless term stays as-is
    assert corrected[3] == "zzzzzzzzz" and "zzzzzzzzz" not in corr


def test_spell_corrected_search_equals_corrected_bm25(setup):
    golden, idx, searcher = setup
    some = sorted(golden["term_to_collection_frequency"])[80]
    typo = some + "q"
    corrected, _ = spell_correct_query(idx.terms, [typo, "aa"])
    got = [
        (r["doc_id"], r["score"])
        for r in spell_corrected_bm25_search(searcher, [typo, "aa"], 10).collect()
    ]
    expected = [
        (r["doc_id"], r["score"])
        for r in searcher.bm25_search(corrected, 10).collect()
    ]
    assert got == expected
    assert got  # corrected query actually matches something


# ------------------------------------------------------------------ fsck


def test_fsck_healthy_index_all_zero(setup):
    _, idx, _ = setup
    rows = {r["check"]: r["violations"] for r in index_check(idx).collect()}
    assert set(rows) == {
        "docid_dups",
        "docid_gaps",
        "conv_contiguity",
        "posting_doclen",
        "term_df",
        "term_cf",
        "stats_fields",
    }
    assert all(v == 0 for v in rows.values()), rows


def test_fsck_detects_corruptions(setup):
    _, idx, _ = setup

    # hole in doc_ids: drop one doc → gaps, conv break, stats mismatch
    holed = dataclasses.replace(idx, docs=idx.docs.filter("doc_id != 5"))
    r = {x["check"]: x["violations"] for x in index_check(holed).collect()}
    assert r["docid_gaps"] == 1
    assert r["conv_contiguity"] >= 1
    assert r["stats_fields"] >= 1

    # corrupt one posting's tf → cf disagrees, df still fine
    bad_tf = idx.postings.withColumn(
        "tf", F.when(F.col("doc_id") == 3, F.col("tf") + 7).otherwise(F.col("tf"))
    )
    r = {x["check"]: x["violations"] for x in index_check(
        dataclasses.replace(idx, postings=bad_tf)
    ).collect()}
    assert r["term_cf"] >= 1 and r["term_df"] == 0

    # corrupt denormalized doc_len on one posting row
    bad_len = idx.postings.withColumn(
        "doc_len",
        F.when(F.col("doc_id") == 4, F.lit(9999)).otherwise(F.col("doc_len")),
    )
    r = {x["check"]: x["violations"] for x in index_check(
        dataclasses.replace(idx, postings=bad_len)
    ).collect()}
    assert r["posting_doclen"] >= 1

    # duplicate doc row → dups and contiguity
    duped = dataclasses.replace(idx, docs=idx.docs.union(idx.docs.filter("doc_id = 7")))
    r = {x["check"]: x["violations"] for x in index_check(duped).collect()}
    assert r["docid_dups"] == 1


def test_index_term_diff(spark):
    from fulltextsearchengine_spark.operators.fsck import index_term_diff

    a = spark.createDataFrame(
        [("kept", 3, 5), ("gone", 2, 2), ("grew", 1, 1)],
        "term string, df long, cf long",
    )
    b = spark.createDataFrame(
        [("kept", 3, 5), ("grew", 4, 9), ("new", 1, 2)],
        "term string, df long, cf long",
    )
    got = {r["term"]: r.asDict() for r in index_term_diff(a, b).collect()}
    assert set(got) == {"gone", "grew", "new"}  # unchanged suppressed
    assert got["gone"]["status"] == "removed" and got["gone"]["df_delta"] == -2
    assert got["new"]["status"] == "added" and got["new"]["cf_delta"] == 2
    assert got["grew"]["status"] == "changed" and got["grew"]["df_delta"] == 3
