"""cross_fields, rank_feature, C4 rules, unicode normalization, and
refusal/boilerplate detection vs brute-force Python reimplementations."""

from __future__ import annotations

import math
import unicodedata
from collections import Counter

import pytest

from fulltextsearchengine_spark.functions.c4 import (
    C4_BADWORDS,
    c4_clean,
    c4_rules_report,
)
from fulltextsearchengine_spark.functions.tokenize import fold_query_text
from fulltextsearchengine_spark.functions.unicode_norm import normalize_corpus
from fulltextsearchengine_spark.operators.bm25f import (
    BM25F_B,
    BM25F_K1,
    build_field_index,
    cross_fields_scores,
    cross_fields_search,
    dismax_search,
)
from fulltextsearchengine_spark.operators.index_build import build_index
from fulltextsearchengine_spark.operators.rankfeature import (
    rank_feature_scores,
    rank_feature_search,
)
from fulltextsearchengine_spark.operators.refusals import (
    conv_refusal_report,
    refusal_report,
)
from fulltextsearchengine_spark.operators.search import Searcher
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

Q = ["aa", "ahc", "auir"]


@pytest.fixture(scope="module")
def tdf(spark, small_transcripts_pdf):
    return spark.createDataFrame(small_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)


@pytest.fixture(scope="module")
def fidx(tdf):
    return build_field_index(tdf)


@pytest.fixture(scope="module")
def searcher(tdf):
    return Searcher(build_index(tdf))


# ------------------------------------------------------------ cross_fields


def _brute_cross_fields(pdf, query, tie, k1=BM25F_K1, b=BM25F_B):
    """Blended-df dismax per term over role fields, straight off the
    pandas transcripts."""
    terms = sorted({t.lower() for t in query})
    tf: dict[tuple, Counter] = {}
    flen: Counter = Counter()
    present: set[tuple] = set()
    for r in pdf.itertuples():
        toks = fold_query_text(r.text or "")
        key = (r.conv_id, r.role)
        present.add(key)
        flen[key] += len(toks)
        c = tf.setdefault(key, Counter())
        for t in toks:
            c[t] += 1
    n_f = Counter(role for (_, role) in present)
    avg = {
        role: sum(v for (c, r2), v in flen.items() if r2 == role) / n
        for role, n in n_f.items()
    }
    df_tf: Counter = Counter()
    for (conv, role), c in tf.items():
        for t in terms:
            if c.get(t):
                df_tf[(t, role)] += 1
    scores: Counter = Counter()
    for t in terms:
        d_blend = max((df_tf.get((t, role), 0) for role in n_f), default=0)
        if d_blend == 0:
            continue
        n_blend = max(n_f.values())
        idf = math.log((n_blend - d_blend + 0.5) / (d_blend + 0.5) + 1.0)
        per_conv: dict[str, list[float]] = {}
        for (conv, role), c in tf.items():
            f = c.get(t, 0)
            if not f:
                continue
            norm = 1 - b + b * flen[(conv, role)] / avg[role]
            per_conv.setdefault(conv, []).append(idf * f / (f + k1 * norm))
        for conv, ss in per_conv.items():
            mx = max(ss)
            scores[conv] += mx + tie * (sum(ss) - mx)
    return scores


@pytest.mark.parametrize("tie", [0.0, 0.4])
def test_cross_fields_matches_brute(fidx, small_transcripts_pdf, tie):
    want = _brute_cross_fields(small_transcripts_pdf, Q, tie)
    got = {
        r["conv_id"]: r["score"]
        for r in cross_fields_scores(fidx, Q, tie_breaker=tie).collect()
    }
    assert set(got) == set(want)
    for c, s in want.items():
        assert got[c] == pytest.approx(s, rel=1e-9)


def test_cross_fields_differs_from_dismax(fidx):
    """Blending the df must actually change the ranking math vs
    per-field idf dismax on at least one conversation's score."""
    cf = {r["conv_id"]: r["score"] for r in cross_fields_search(fidx, Q, k=50).collect()}
    dm = {r["conv_id"]: r["score"] for r in dismax_search(fidx, Q, k=50).collect()}
    assert any(abs(cf[c] - dm[c]) > 1e-12 for c in set(cf) & set(dm))


def test_cross_fields_guards(fidx):
    with pytest.raises(ValueError):
        cross_fields_scores(fidx, Q, tie_breaker=1.5)
    assert cross_fields_scores(fidx, []).collect() == []
    assert cross_fields_scores(fidx, ["zzznotaword"]).collect() == []


# ------------------------------------------------------------ rank_feature


@pytest.mark.parametrize(
    "function,kw",
    [
        ("saturation", dict(pivot=40.0)),
        ("log", dict(scaling_factor=2.0)),
        ("sigmoid", dict(pivot=40.0, exponent=2.0)),
    ],
)
def test_rank_feature_matches_brute(spark, searcher, function, kw):
    import pyspark.sql.functions as F

    feats = searcher.index.docs.select(
        "doc_id", F.col("doc_len").cast("double").alias("feature")
    )
    base = {r["doc_id"]: r["score"] for r in searcher.bm25_scores(Q).collect()}
    fmap = {r["doc_id"]: r["feature"] for r in feats.collect()}
    boost = 1.7

    def f(s):
        if function == "saturation":
            return s / (s + kw["pivot"])
        if function == "log":
            return math.log(kw["scaling_factor"] + s)
        e = kw["exponent"]
        return s**e / (s**e + kw["pivot"] ** e)

    want = {d: s + boost * f(fmap[d]) for d, s in base.items()}
    got = {
        r["doc_id"]: r["score"]
        for r in rank_feature_scores(
            searcher, feats, query=Q, function=function, boost=boost, **kw
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_rank_feature_missing_feature_adds_zero(spark, searcher):
    import pyspark.sql.functions as F

    feats = searcher.index.docs.select(
        "doc_id", F.col("doc_len").cast("double").alias("feature")
    ).filter(F.col("doc_id") % 2 == 0)
    base = {r["doc_id"]: r["score"] for r in searcher.bm25_scores(Q).collect()}
    got = {
        r["doc_id"]: r["score"]
        for r in rank_feature_scores(searcher, feats, query=Q, pivot=40.0).collect()
    }
    for d, s in got.items():
        if d % 2 == 1:
            assert s == pytest.approx(base[d], rel=1e-12)
        else:
            assert s > base[d]


def test_rank_feature_scores_hook_and_topk_shape(spark, searcher):
    import pyspark.sql.functions as F

    feats = searcher.index.docs.select(
        "doc_id", F.col("doc_len").cast("double").alias("feature")
    )
    pre = searcher.bm25_scores_msm(Q, 2)
    out = rank_feature_search(searcher, feats, scores=pre, k=5, pivot=40.0)
    rows = out.collect()
    assert len(rows) <= 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rank_feature_guards(searcher, spark):
    import pyspark.sql.functions as F

    feats = searcher.index.docs.select(
        "doc_id", F.col("doc_len").cast("double").alias("feature")
    )
    with pytest.raises(ValueError):
        rank_feature_scores(searcher, feats)  # neither query nor scores
    with pytest.raises(ValueError):
        rank_feature_scores(searcher, feats, query=Q, scores=feats)
    with pytest.raises(ValueError):
        rank_feature_scores(searcher, feats, query=Q, pivot=0.0)
    with pytest.raises(ValueError):
        rank_feature_scores(searcher, feats, query=Q, function="nope")
    neg = feats.withColumn("feature", F.lit(-1.0))
    with pytest.raises(Exception):
        rank_feature_scores(searcher, neg, query=Q).collect()


# ------------------------------------------------------------------- C4


_C4_DOCS = [
    # (doc_id, text, expected_keep)
    (0, "This page has five good words here.\nAnd a second proper sentence too!\nIs this a third sentence?", True),
    (1, "short line.\nno terminal punctuation on this one\nTiny.", False),  # 0 kept lines
    (2, "A perfectly fine long sentence number one.\nAnother good long sentence right here too.\nAnd one more closing sentence for luck.", True),
    (3, "This otherwise fine page mentions lorem ipsum filler.\nAnd a second proper sentence too!\nIs this a third sentence?", False),
    (4, "This page contains a { curly brace somewhere.\nAnd a second proper sentence too!\nIs this a third sentence?", False),
    (5, "This page says badwordbravo in the open.\nAnd a second proper sentence too!\nIs this a third sentence?", False),
    (6, "A line with javascript should be dropped now.\nThree good sentences remain on this page!\nAnd this is the second of them, okay?\nHere is the third and final sentence.", True),
    (7, "", False),
]


def _brute_c4(text, min_line_words=5, min_sentences=3):
    kept = []
    for line in text.split("\n"):
        lt = line.strip()
        if not lt or lt[-1] not in '.!?"':
            continue
        if len(lt.split()) < min_line_words:
            continue
        if "javascript" in fold_query_text(lt):
            continue
        kept.append(line)
    clean = "\n".join(kept)
    n_sent = sum(1 for ch in clean if ch in ".!?")
    toks = set(fold_query_text(text))
    keep = (
        n_sent >= min_sentences
        and "lorem ipsum" not in text.lower()
        and "{" not in text
        and not (toks & set(C4_BADWORDS))
    )
    return kept, clean, n_sent, keep


def test_c4_rules_match_brute(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in _C4_DOCS], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_rules_report(df).collect()}
    for i, text, want_keep in _C4_DOCS:
        kept, clean, n_sent, keep = _brute_c4(text)
        r = got[i]
        assert r["n_kept_lines"] == len(kept), (i, r)
        assert r["clean_text"] == clean, i
        assert r["n_sentences"] == n_sent, i
        assert r["c4_keep"] == keep == want_keep, (i, keep, want_keep)


def test_c4_line_rules_bite_individually(spark):
    df = spark.createDataFrame(
        [(6, _C4_DOCS[6][1])], "doc_id long, text string"
    )
    r = c4_rules_report(df).collect()[0]
    # javascript line dropped, other three kept
    assert r["n_lines"] == 4 and r["n_kept_lines"] == 3


def test_c4_clean_projects_and_filters(spark):
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t, _ in _C4_DOCS],
        "doc_id long, text string, source string",
    )
    out = c4_clean(df).collect()
    want_ids = {i for i, t, k in _C4_DOCS if k}
    assert {r["doc_id"] for r in out} == want_ids
    for r in out:
        assert r["source"] == f"s{r['doc_id'] % 2}"
        assert r["text"] == _brute_c4(dict((i, t) for i, t, _ in _C4_DOCS)[r["doc_id"]])[1]


def test_c4_guards(spark):
    df = spark.createDataFrame([(0, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_rules_report(df, min_line_words=0)
    with pytest.raises(ValueError):
        c4_rules_report(df, min_sentences=-1)


# ------------------------------------------------------- unicode normalize


def test_nfc_composes_and_strips_controls(spark):
    rows = [
        (0, "café time"),            # combining acute -> é
        (1, "plain ascii"),
        (2, "bell\x07 and zwsp​here"),
        (3, None),
        (4, "Å angstrom"),            # Å (Angstrom sign) -> Å (NFC)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_corpus(df).collect()}
    assert got[0]["text_norm"] == "café time"
    assert got[0]["changed"] and got[0]["n_chars_delta"] == -1
    assert got[1]["text_norm"] == "plain ascii" and not got[1]["changed"]
    assert got[2]["text_norm"] == "bell and zwsp" + "here"
    assert got[3]["text_norm"] == "" and got[3]["n_chars_delta"] == 0
    assert got[4]["text_norm"] == unicodedata.normalize("NFC", "Å angstrom")


def test_nfkc_and_collapse(spark):
    df = spark.createDataFrame(
        [(0, "ﬁle  \t name x")], "doc_id long, text string"
    )
    r = normalize_corpus(df, form="NFKC", collapse_whitespace=True).collect()[0]
    assert r["text_norm"] == "file name x"


def test_normalize_guard(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        normalize_corpus(df, form="NFX")


# ------------------------------------------------------- refusals


def _mk_transcripts(spark):
    rows = []
    # 4 convs; assistant turns at odd idx
    canned = "Sure! Here is the standard template answer for you today."
    for c in range(4):
        rows.append((f"c{c}", 0, "user", "please help with the thing", None, None))
        rows.append((f"c{c}", 1, "assistant", canned, None, None))
    rows.append(("c0", 2, "user", "again?", None, None))
    rows.append(("c0", 3, "assistant", "I'm sorry, but I cannot help with that request.", None, None))
    rows.append(("c1", 3, "assistant", "As an AI, I will not do that.", None, None))
    rows.append(("c2", 3, "assistant", "Talking about an airline as an airplane fan is fine.", None, None))
    rows.append(("c3", 3, "assistant", "", None, None))
    rows.append(("c3", 5, "assistant", "A unique answer with plenty of original content.", None, None))
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def test_refusal_and_boilerplate_flags(spark):
    t = _mk_transcripts(spark)
    rep = {(r["conv_id"], r["turn_idx"]): r for r in refusal_report(t).collect()}
    # canned template: dup_count 4, opener_count 4 -> boilerplate
    for c in range(4):
        r = rep[(f"c{c}", 1)]
        assert r["dup_count"] == 4 and r["opener_count"] == 4 and r["is_boilerplate"]
        assert not r["is_refusal"]
    assert rep[("c0", 3)]["is_refusal"]        # "i m sorry but" + "i cannot"
    assert rep[("c1", 3)]["is_refusal"]        # "as an ai" + "i will not"
    assert not rep[("c2", 3)]["is_refusal"]    # "as an airline" must NOT fire
    r_empty = rep[("c3", 3)]
    assert not r_empty["is_refusal"] and r_empty["dup_count"] == 0 and not r_empty["is_boilerplate"]
    assert rep[("c3", 5)]["dup_count"] == 1 and not rep[("c3", 5)]["is_boilerplate"]
    # only assistant turns appear
    assert all(k[0].startswith("c") for k in rep) and len(rep) == 9


def test_refusal_phrases_refolded(spark):
    t = _mk_transcripts(spark)
    rep = refusal_report(t, phrases=["I can't", "I'm sorry, but"])
    got = {(r["conv_id"], r["turn_idx"]): r["is_refusal"] for r in rep.collect()}
    assert got[("c0", 3)]
    assert not got[("c1", 3)]


def test_conv_refusal_rollup(spark):
    t = _mk_transcripts(spark)
    got = {r["conv_id"]: r for r in conv_refusal_report(t).collect()}
    assert got["c0"]["n_role_turns"] == 2
    assert got["c0"]["n_refusals"] == 1
    assert got["c0"]["refusal_ratio_micro"] == 500000
    assert got["c3"]["n_refusals"] == 0 and got["c3"]["n_role_turns"] == 3


def test_refusal_guards(spark):
    t = _mk_transcripts(spark)
    with pytest.raises(ValueError):
        refusal_report(t, opener_tokens=0)
    with pytest.raises(ValueError):
        refusal_report(t, opener_min_count=1)
    with pytest.raises(ValueError):
        refusal_report(t, phrases=["!!!"])
