"""Deletes (tombstone + purge), lexicon (prefix / fuzzy lookup),
keywords (tf-idf, co-occurrence/PMI), and snippets — all vs brute-force
pandas/python recomputation from the golden oracle index."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fulltextsearchengine_spark import oracle
from fulltextsearchengine_spark.operators.deletes import (
    exclude_docs,
    purge_deletes,
    tombstones_for_convs,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.keywords import (
    conv_keywords,
    term_cooccurrence,
)
from fulltextsearchengine_spark.operators.lexicon import (
    build_fuzzy_index,
    deletion_variants,
    fuzzy_term_lookup,
    prefix_search,
)
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.operators.snippets import search_with_snippets
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

K = 10
Q = ["spark", "data", "join"]


@pytest.fixture(scope="module")
def setup(spark, small_transcripts_pdf):
    golden = oracle.build_index(small_transcripts_pdf)
    sdf = spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    idx = build_index(sdf)
    return golden, idx, Searcher(idx), sdf


# ---------------------------------------------------------------------------
# deletes


def test_tombstone_search_excludes_deleted(setup):
    golden, idx, searcher, _ = setup
    convs = sorted(golden["conv_to_doc_ids"])[:3]
    dead = {d for c in convs for d in golden["conv_to_doc_ids"][c]}
    tomb = tombstones_for_convs(idx, convs)
    assert {r["doc_id"] for r in tomb.collect()} == dead

    got = (
        Searcher.topk(exclude_docs(searcher.bm25_scores(Q), tomb), K)
        .collect()
    )
    # Lucene semantics: stats stay pre-delete; survivors keep their score
    full = oracle.bm25_search(golden, Q, golden["num_docs"])
    exp = [(d, s) for d, s in full if d not in dead][:K]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9)


def test_purge_recomputes_stats(setup):
    golden, idx, _, _ = setup
    convs = sorted(golden["conv_to_doc_ids"])[:3]
    dead = {d for c in convs for d in golden["conv_to_doc_ids"][c]}
    purged = purge_deletes(idx, tombstones_for_convs(idx, convs))

    # brute-force survivors from the golden index
    exp_df: dict[str, int] = {}
    exp_cf: dict[str, int] = {}
    for t, flat in golden["term_to_postings"].items():
        for d, tf in zip(flat[0::2], flat[1::2]):
            if d not in dead:
                exp_df[t] = exp_df.get(t, 0) + 1
                exp_cf[t] = exp_cf.get(t, 0) + tf
    got_terms = {r["term"]: (r["df"], r["cf"]) for r in purged.terms.collect()}
    assert got_terms == {t: (exp_df[t], exp_cf[t]) for t in exp_df}

    st = purged.stats_row()
    exp_docs = [d for d in golden["doc_to_length"] if d not in dead]
    assert st["num_docs"] == len(exp_docs)
    assert st["total_tokens"] == sum(golden["doc_to_length"][d] for d in exp_docs)
    assert st["unique_terms"] == len(exp_df)
    assert st["num_pairs"] == sum(exp_df.values())

    # whole-conv purge: survivors keep full contiguous spans
    ranges = {r["conv_id"]: r for r in purged.conv_ranges.collect()}
    assert set(ranges) == set(golden["conv_to_doc_ids"]) - set(convs)
    for cid, r in ranges.items():
        ids = golden["conv_to_doc_ids"][cid]
        assert (r["from_doc_id"], r["to_doc_id"], r["n_docs"]) == (
            min(ids), max(ids), len(ids),
        )


def test_purge_partial_conv_guard(setup):
    golden, idx, _, _ = setup
    # delete a single interior doc of some conv with >2 docs
    cid = next(c for c, ids in golden["conv_to_doc_ids"].items() if len(ids) > 2)
    mid = sorted(golden["conv_to_doc_ids"][cid])[1]
    tomb = idx.docs.sparkSession.createDataFrame([(mid,)], "doc_id long")

    strict = purge_deletes(idx, tomb)
    assert strict.conv_ranges.filter(f"conv_id = '{cid}'").count() == 0

    loose = purge_deletes(idx, tomb, allow_partial_convs=True)
    row = loose.conv_ranges.filter(f"conv_id = '{cid}'").collect()[0]
    assert row["n_docs"] == row["to_doc_id"] - row["from_doc_id"]  # span - 1


# ---------------------------------------------------------------------------
# lexicon


def test_prefix_search(setup):
    golden, idx, _, _ = setup
    prefix = "s"
    exp = sorted(
        (
            (t, golden["term_to_document_frequency"][t], cf)
            for t, cf in golden["term_to_collection_frequency"].items()
            if t.startswith(prefix)
        ),
        key=lambda x: (-x[2], x[0]),
    )[:K]
    got = [(r["term"], r["df"], r["cf"]) for r in prefix_search(idx.terms, prefix, K).collect()]
    assert got == exp


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_lookup_exact_vs_bruteforce(setup):
    golden, idx, _, _ = setup
    vocab = list(golden["term_to_document_frequency"])
    fidx = build_fuzzy_index(idx.terms)
    for q in ["spark", "spak", "dta", "x", "joinz"]:
        exp = sorted(
            (
                (t, golden["term_to_collection_frequency"][t])
                for t in vocab
                if _lev(t, q) <= 1
            ),
            key=lambda x: (-x[1], x[0]),
        )[:K]
        for side in (None, fidx):
            got = [
                (r["term"], r["cf"])
                for r in fuzzy_term_lookup(idx.terms, q, K, fuzzy_index=side).collect()
            ]
            assert got == exp, (q, "prebuilt" if side is not None else "adhoc")


def test_fuzzy_guard_and_variants():
    assert deletion_variants("ab") == ["a", "ab", "b"]
    assert deletion_variants("a") == ["", "a"]
    with pytest.raises(ValueError):
        fuzzy_term_lookup(None, "spark", max_edits=2)


# ---------------------------------------------------------------------------
# keywords / co-occurrence


def test_conv_keywords_vs_bruteforce(setup):
    golden, idx, _, _ = setup
    n = golden["num_docs"]
    doc_conv = {d: m["conv_id"] for d, m in golden["doc_to_meta"].items()}
    conv_tf: dict[tuple[str, str], int] = {}
    for t, flat in golden["term_to_postings"].items():
        for d, tf in zip(flat[0::2], flat[1::2]):
            key = (doc_conv[d], t)
            conv_tf[key] = conv_tf.get(key, 0) + tf
    scored: dict[str, list[tuple[int, str, int]]] = {}
    for (cid, t), tf_sum in conv_tf.items():
        micro = round(tf_sum * math.log(n / golden["term_to_document_frequency"][t]) * 1e6)
        scored.setdefault(cid, []).append((-micro, t, tf_sum))
    exp = {}
    for cid, rows in scored.items():
        for rank, (neg, t, tf_sum) in enumerate(sorted(rows)[:3], 1):
            exp[(cid, t)] = (tf_sum, -neg, rank)
    got = {
        (r["conv_id"], r["term"]): (r["tf_sum"], r["score_micro"], r["rank"])
        for r in conv_keywords(idx, k=3).collect()
    }
    assert got == exp


def test_term_cooccurrence_vs_bruteforce(setup):
    golden, idx, _, _ = setup
    n = golden["num_docs"]
    dfm = golden["term_to_document_frequency"]
    min_df, max_df = 5, 60
    banded = {t for t, df in dfm.items() if min_df <= df <= max_df}
    doc_terms: dict[int, set] = {}
    for t, flat in golden["term_to_postings"].items():
        if t in banded:
            for d in flat[0::2]:
                doc_terms.setdefault(d, set()).add(t)
    cnt: Counter = Counter()
    for ts in doc_terms.values():
        s = sorted(ts)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                cnt[(s[i], s[j])] += 1
    exp = []
    for (a, b), c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]:
        pmi = round(math.log(n * c / (dfm[a] * dfm[b])) * 1e6)
        exp.append((a, b, c, pmi))
    got = [
        (r["term_a"], r["term_b"], r["pair_count"], r["pmi_micro"])
        for r in term_cooccurrence(idx, min_df, max_df, k=20).collect()
    ]
    assert got == exp


# ---------------------------------------------------------------------------
# snippets


def test_snippets(setup, small_transcripts_pdf):
    golden, idx, searcher, sdf = setup
    got = search_with_snippets(searcher, sdf, Q, k=K, width=30).collect()
    exp = oracle.bm25_search(golden, Q, K)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    text_by_doc = {}
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    for row in docs.itertuples(index=False):
        text_by_doc[row.doc_id] = row.text
    for r in got:
        text = text_by_doc[r["doc_id"]]
        low = text.lower()
        poss = [p for p in (low.find(t) for t in sorted(set(Q))) if p >= 0]
        assert poss, "every OR-union hit must contain a query term"
        start = max(0, min(poss) - 30)
        assert r["snippet"] == text[start : start + 60]
        assert r["conv_id"] == golden["doc_to_meta"][r["doc_id"]]["conv_id"]


# ---------------------------------------------------------------------------
# more-like-this


def test_more_like_this_vs_bruteforce(setup):
    import math as _m

    from fulltextsearchengine_spark.operators.morelikethis import (
        doc_query_terms,
        more_like_this,
    )

    golden, idx, searcher, _ = setup
    n = golden["num_docs"]
    for src in (7, 123, 500):
        exp_terms = [
            t
            for _, t in sorted(
                (
                    (-(tf * _m.log(n / golden["term_to_document_frequency"][t])), t)
                    for t, tf in (
                        (t, dict(zip(f[0::2], f[1::2])).get(src))
                        for t, f in golden["term_to_postings"].items()
                    )
                    if tf
                )
            )[:5]
        ]
        assert doc_query_terms(searcher, src, 5) == exp_terms
        full = oracle.bm25_search(golden, exp_terms, n)
        exp = [(d, s) for d, s in full if d != src][:K]
        got = more_like_this(searcher, src, m=5, k=K).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]
        for r, (_, s) in zip(got, exp):
            assert math.isclose(r["score"], s, rel_tol=1e-9)


def test_index_report_vs_golden(setup):
    from fulltextsearchengine_spark.operators.report import index_report

    golden, idx, _, _ = setup
    got = {r["metric"]: r["value"] for r in index_report(idx).collect()}
    lens = golden["doc_to_length"]
    dfs = golden["term_to_document_frequency"]
    convs = golden["conv_to_doc_ids"]
    assert got == {
        "num_docs": golden["num_docs"],
        "total_tokens": golden["total_tokens"],
        "unique_terms": golden["unique_tokens"],
        "num_pairs": sum(dfs.values()),
        "max_doc_len": max(lens.values()),
        "min_doc_len": min(lens.values()),
        "empty_docs": sum(1 for v in lens.values() if v == 0),
        "max_df": max(dfs.values()),
        "hapax_terms": sum(1 for v in dfs.values() if v == 1),
        "max_cf": max(golden["term_to_collection_frequency"].values()),
        "n_convs": len(convs),
        "max_conv_turns": max(len(v) for v in convs.values()),
    }


def test_saved_fuzzy_index_prunes(setup, spark, tmp_path_factory):
    from fulltextsearchengine_spark.operators.lexicon import save_fuzzy_index

    golden, idx, _, _ = setup
    path = str(tmp_path_factory.mktemp("fuzzyidx") / "variants")
    save_fuzzy_index(build_fuzzy_index(idx.terms), path)
    loaded = spark.read.parquet(path)
    got_df = fuzzy_term_lookup(idx.terms, "spak", K, fuzzy_index=loaded)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "In(variant" in plan.split("PushedFilters", 1)[1][:300]
    vocab = list(golden["term_to_document_frequency"])
    exp = sorted(
        ((t, golden["term_to_collection_frequency"][t]) for t in vocab if _lev(t, "spak") <= 1),
        key=lambda x: (-x[1], x[0]),
    )[:K]
    assert [(r["term"], r["cf"]) for r in got_df.collect()] == exp


def test_term_trends_vs_bruteforce(setup, small_transcripts_pdf):
    from fulltextsearchengine_spark.operators.keywords import term_trends

    golden, idx, _, _ = setup
    docs = oracle.assign_doc_ids(small_transcripts_pdf)
    hour_of = {
        r.doc_id: r.ts.replace(minute=0, second=0, microsecond=0)
        for r in docs.itertuples(index=False)
    }
    agg: dict[tuple, int] = {}
    for t, flat in golden["term_to_postings"].items():
        for d, tf in zip(flat[0::2], flat[1::2]):
            key = (hour_of[d], t)
            agg[key] = agg.get(key, 0) + tf
    exp = {}
    by_bucket: dict = {}
    for (h, t), s in agg.items():
        by_bucket.setdefault(h, []).append((-s, t))
    for h, rows in by_bucket.items():
        for rank, (neg, t) in enumerate(sorted(rows)[:3], 1):
            exp[(h, t)] = (-neg, rank)
    got = {
        (r["bucket_ts"], r["term"]): (r["tf_sum"], r["rank"])
        for r in term_trends(idx, "hour", 3).collect()
    }
    assert got == exp
