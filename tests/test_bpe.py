"""BPE trainer/encoder: Sennrich golden, Spark/python parity, encode
round-trip, and the training-replay == encode identity."""

from __future__ import annotations

import pytest

from fulltextsearchengine_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_word_counts,
    encode_word_py,
    learn_bpe,
    learn_bpe_merges_py,
)
from fulltextsearchengine_spark.sources.rawlog import TRANSCRIPT_SCHEMA

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_golden():
    merges = learn_bpe_merges_py(SENNRICH, 4)
    # pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8, ...
    # tie on 9 broken by 'e|s' < 's|t' < 't|</w>'
    assert merges[0] == (0, "e", "s")
    # round 2: (es,t)=9, (t,</w>)=9 → 'es|t' < 't|</w>'
    assert merges[1] == (1, "es", "t")
    # round 3: (est,</w>)=9 wins
    assert merges[2] == (2, "est", END)
    # round 4: (l,o)=7, (o,w)=7, (w,i)=3... → 'l|o' wins the 7-tie
    assert merges[3] == (3, "l", "o")


def test_greedy_left_to_right():
    assert encode_word_py("xxx", [("x", "x")]) == ["xx", "x", END]
    assert encode_word_py("xxxx", [("x", "x")]) == ["xx", "xx", END]
    assert encode_word_py("abab", [("a", "b"), ("ab", "ab")]) == ["abab", END]


def test_early_stop_when_exhausted():
    merges = learn_bpe_merges_py([("ab", 1)], 50)
    # 'a b </w>' admits at most 2 merges
    assert len(merges) == 2


@pytest.fixture(scope="module")
def corpus(spark, tiny_transcripts_pdf):
    return spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)


def test_learn_bpe_spark_matches_py(corpus):
    wc = bpe_word_counts(corpus)
    got = [
        (r["rank"], r["lhs"], r["rhs"])
        for r in learn_bpe(wc, 15).orderBy("rank").collect()
    ]
    counts = [(r["word"], r["cnt"]) for r in wc.collect()]
    assert got == learn_bpe_merges_py(counts, 15)
    assert len(got) == 15


def test_encode_round_trip_and_replay(corpus):
    wc = [(r["word"], r["cnt"]) for r in bpe_word_counts(corpus).collect()]
    merges = [(l, r) for _, l, r in learn_bpe_merges_py(wc, 20)]
    for w, _ in wc[:50]:
        units = encode_word_py(w, merges)
        assert "".join(units) == w + END  # lossless
    # applying the merges in rank order reproduces the training replay
    seqs = {w: list(w) + [END] for w, _ in wc}
    for l, r in merges:
        from fulltextsearchengine_spark.operators.bpe import _merge_seq

        seqs = {w: _merge_seq(s, l, r) for w, s in seqs.items()}
    for w, _ in wc[:50]:
        assert encode_word_py(w, merges) == seqs[w]


def test_bpe_encode_spark_matches_py(corpus):
    wc = [(r["word"], r["cnt"]) for r in bpe_word_counts(corpus).collect()]
    merges = [(l, r) for _, l, r in learn_bpe_merges_py(wc, 10)]
    got = {
        (r["conv_id"], r["turn_idx"]): (list(r["units"]), r["n_units"])
        for r in bpe_encode(corpus, merges).collect()
    }
    from fulltextsearchengine_spark.functions.tokenize import tokenize_texts
    import pandas as pd

    pdf = corpus.toPandas()
    for _, row in pdf.iterrows():
        toks = tokenize_texts(pd.Series([row["text"]]))[0]
        expect = [u for t in toks for u in encode_word_py(t, merges)]
        units, n = got[(row["conv_id"], row["turn_idx"])]
        assert units == expect and n == len(expect)


def test_n_merges_guard(corpus):
    with pytest.raises(ValueError):
        learn_bpe(bpe_word_counts(corpus), 0)


def test_fertility_report_matches_python(spark):
    from fulltextsearchengine_spark.operators.bpe import (
        bpe_fertility_report,
        encode_word_py,
    )
    from fulltextsearchengine_spark.functions.tokenize import tokenize_texts
    import pandas as pd

    merges = [("e", "r"), ("er", "</w>"), ("s", "t")]
    docs = [
        (0, "srcA", "the river era ster"),
        (1, "srcA", "er er er"),
        (2, "srcB", "completely different words"),
        (3, "srcB", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["source"]: (
            r["n_docs"], r["total_words"], r["total_units"],
            r["total_token_chars"], r["fertility_micro"], r["chars_per_unit_micro"],
        )
        for r in bpe_fertility_report(df, merges).collect()
    }
    exp = {}
    for src in ("srcA", "srcB"):
        words = units = chars = nd = 0
        for _, s, t in docs:
            if s != src:
                continue
            nd += 1
            toks = tokenize_texts(pd.Series([t])).iloc[0]
            words += len(toks)
            chars += sum(len(t_) for t_ in toks)
            units += sum(len(encode_word_py(t_, merges)) for t_ in toks)
        fert = round(units / words * 1e6) if words else 0
        cpu_ = round(chars / units * 1e6) if units else 0
        exp[src] = (nd, words, units, chars, fert, cpu_)
    assert got == exp
    # the merge-heavy srcA must compress better than srcB
    assert got["srcA"][4] < got["srcB"][4]
