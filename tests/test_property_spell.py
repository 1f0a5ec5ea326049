"""Property tests (hypothesis) for the spell-correction kernels:
_lev1 vs a reference DP levenshtein, and FastSS deletion-neighborhood
completeness at edit distance 1 — pure driver-side code, no Spark."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fulltextsearchengine_spark.operators.lexicon import deletion_variants
from fulltextsearchengine_spark.operators.spellcheck import _lev1

WORD = st.text(alphabet="abcdef", min_size=0, max_size=8)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300)
@given(WORD, WORD)
def test_lev1_matches_dp(a, b):
    assert _lev1(a, b) == (_lev(a, b) <= 1)


@settings(max_examples=300)
@given(WORD.filter(lambda w: len(w) >= 1), st.data())
def test_fastss_neighborhoods_complete_at_d1(w, data):
    """Any single edit of w shares a deletion variant with w — the
    completeness FastSS candidate generation relies on."""
    i = data.draw(st.integers(0, len(w)))
    c = data.draw(st.sampled_from("abcdef"))
    kind = data.draw(st.sampled_from(["ins", "del", "sub"]))
    if kind == "ins":
        e = w[:i] + c + w[i:]
    elif kind == "del":
        e = w[: max(i - 1, 0)] + w[max(i - 1, 0) + 1 :] if w else w
    else:
        j = min(i, len(w) - 1)
        e = w[:j] + c + w[j + 1 :]
    assert set(deletion_variants(w)) & set(deletion_variants(e)), (w, e)
