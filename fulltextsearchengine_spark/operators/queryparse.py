"""Search-box query language → engine calls.

The reference exposes programmatic term-list APIs only
(ReviewSearch.java takes an Enumeration of tokens); a human-facing
search box needs a tiny query language. This parser supports the
de-facto standard operators every search UI shares (Lucene classic
syntax subset — public knowledge):

    spark join fast              bag-of-words terms (OR-union scorer)
    "table hash"                 quoted phrase (positional side-table)
    "table hash"~2               proximity: terms within m+2 positions,
                                 any order (unordered window, #uwN)
    -noise  -"bad phrase"        exclusions (post-score anti-filter)
    role:user  tool:search       metadata field filters (docs columns)
    conv:conv_000042             restrict to one conversation
    spark^2.5 join               per-term boost (Lucene ^N): the term's
                                 BM25 contribution is multiplied by N;
                                 composes with mm:N and every filter
    quer* *dex te*le             wildcard terms (Lucene MultiTermQuery):
                                 expanded against the dictionary, top
                                 max_expansions by cf, each scored with
                                 its own idf (scoring-boolean rewrite)
    sparc~  sparc~1              fuzzy term: edit-distance-1 dictionary
                                 neighborhood (FastSS sidecar, exact);
                                 only distance 1 is supported
    /qu.r[xy]/                   full-match regex over the dictionary
                                 (Lucene RegexpQuery; terms are
                                 lowercase — write patterns lowercase);
                                 all three take -negation and ^N boosts
                                 (boost applies to every expansion)
    sort:-ts  sort:turn_idx      order results by a docs column instead
                                 of score (leading '-' = descending;
                                 fields: ts, turn_idx, doc_id); score is
                                 still computed and returned
    mm:2                         minimum-should-match: docs must contain
                                 at least N distinct positive terms
                                 (Lucene minimum_should_match; default 1
                                 = OR union, N = all terms = AND)
    after:2026-01-01 before:2026-02-01
                                 half-open time range [after, before):
                                 ts >= after AND ts < before. Values are
                                 tz-NAIVE ISO timestamps interpreted in
                                 the Spark session timezone (tz-aware
                                 forms are rejected at parse time)

Parsing is driver-side string work (queries are bytes, not data);
execution composes ONLY existing operators, in the cheap-first order a
production engine uses: BM25 candidates (pruned In scan) → broadcast
semi/anti joins for field filters and exclusions → phrase verification
LAST, because it is the only part that must touch the positional
side-table, and only for the ≤k·ε candidates that survived everything
else (never a corpus-wide phrase scan).

Terms are folded through the engine tokenizer's semantics (lowercase,
alnum runs), so ``spark-SQL`` parses to terms ``spark``, ``sql``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import fold_query_text
from .feedback import bm25_weighted_scores
from .search import Searcher

_FIELDS = ("role", "tool", "conv", "after", "before", "mm", "sort")
_SORT_FIELDS = ("ts", "turn_idx", "doc_id")
# token grammar: quoted phrase | field:value | bare word; '-' prefix negates
_PART_RE = re.compile(
    r"""(?P<neg>-)?(?:
          "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
        | (?P<field>%s):(?P<value>[^\s"]+)
        | (?P<word>[^\s"]+)
    )""" % "|".join(_FIELDS),
    re.X,
)


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)
    excluded_terms: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    excluded_phrases: list[list[str]] = field(default_factory=list)
    # (terms, slop) unordered-window clauses from "..."~N syntax
    proximities: list[tuple[list[str], int]] = field(default_factory=list)
    excluded_proximities: list[tuple[list[str], int]] = field(default_factory=list)
    filters: dict[str, str] = field(default_factory=dict)
    min_should_match: int = 1
    # term -> boost for ^N-weighted terms (unboosted terms absent = 1.0)
    boosts: dict[str, float] = field(default_factory=dict)
    # (docs column, descending) — None = rank by score
    sort: tuple[str, bool] | None = None
    # multi-term clauses (Lucene MultiTermQuery syntax): `te*m` wildcard,
    # `term~` / `term~1` fuzzy, `/regex/` full-match regex — each expands
    # against the dictionary at execute time (operators/multiterm.py)
    wildcards: list[str] = field(default_factory=list)
    excluded_wildcards: list[str] = field(default_factory=list)
    fuzzies: list[str] = field(default_factory=list)
    excluded_fuzzies: list[str] = field(default_factory=list)
    regexes: list[str] = field(default_factory=list)
    excluded_regexes: list[str] = field(default_factory=list)
    # "<kind>:<pattern>" -> boost, kind in {w, f, r}; applied to every
    # term the pattern expands to (explicit per-term boosts win)
    pattern_boosts: dict[str, float] = field(default_factory=dict)

    def has_positive_clause(self) -> bool:
        return bool(
            self.terms
            or self.phrases
            or self.proximities
            or self.wildcards
            or self.fuzzies
            or self.regexes
        )


# split-first/lower-second, exactly like tokens_col (shared fold)
_fold = fold_query_text


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _PART_RE.finditer(q):
        neg = bool(m.group("neg"))
        if m.group("phrase") is not None:
            toks = _fold(m.group("phrase"))
            if not toks:
                continue
            if m.group("slop") is not None:
                tgt = out.excluded_proximities if neg else out.proximities
                tgt.append((toks, int(m.group("slop"))))
            else:
                (out.excluded_phrases if neg else out.phrases).append(toks)
        elif m.group("field"):
            f = m.group("field")
            v = m.group("value")
            if f in ("after", "before"):
                import datetime as _dt

                try:
                    parsed = _dt.datetime.fromisoformat(v)
                except ValueError as e:
                    raise ValueError(f"bad {f}: timestamp {v!r}") from e
                # tz-naive only: Python ≥3.11 fromisoformat accepts
                # 'Z'/offset forms, but Spark's to_timestamp would then
                # re-interpret them in the SESSION timezone — the
                # validator and the executor would disagree (ADVICE r3)
                if parsed.tzinfo is not None:
                    raise ValueError(
                        f"bad {f}: {v!r} is timezone-aware; use a naive "
                        "timestamp in the Spark session timezone"
                    )
                out.filters[f] = v  # keep ISO case/precision as typed
            elif f == "mm":
                if not v.isdigit() or int(v) < 1:
                    raise ValueError(f"bad mm: {v!r} (want an integer >= 1)")
                out.min_should_match = int(v)
            elif f == "sort":
                fld, desc = (v[1:], True) if v.startswith("-") else (v, False)
                if fld not in _SORT_FIELDS:
                    raise ValueError(
                        f"bad sort: {v!r} (fields: {', '.join(_SORT_FIELDS)})"
                    )
                out.sort = (fld, desc)
            else:
                out.filters[f] = v.lower()
        else:
            word = m.group("word")
            boost = None
            bm = re.search(r"\^(\d+(?:\.\d+)?)$", word)
            if bm:
                boost = float(bm.group(1))
                if boost <= 0:
                    raise ValueError(f"bad boost in {word!r} (want > 0)")
                word = word[: bm.start()]
            # multi-term clauses, classified before tokenizer folding
            # (folding would split the pattern metacharacters away)
            if len(word) > 2 and word.startswith("/") and word.endswith("/"):
                # /regex/ — terms are lowercase alnum, so patterns
                # should be written lowercase; not folded (case classes
                # like \D must survive)
                pat = word[1:-1]
                (out.excluded_regexes if neg else out.regexes).append(pat)
                if boost is not None and not neg:
                    out.pattern_boosts[f"r:{pat}"] = boost
                continue
            fz = re.fullmatch(r"(.+)~(\d*)", word)
            if fz:
                base, edits = fz.group(1), fz.group(2)
                if edits not in ("", "1"):
                    raise ValueError(
                        f"bad fuzzy {word!r}: only edit distance 1 is "
                        "supported (FastSS neighborhood is exact at 1)"
                    )
                toks = _fold(base)
                if len(toks) != 1:
                    raise ValueError(f"bad fuzzy {word!r}: want one term")
                (out.excluded_fuzzies if neg else out.fuzzies).append(toks[0])
                if boost is not None and not neg:
                    out.pattern_boosts[f"f:{toks[0]}"] = boost
                continue
            if "*" in word:
                pat = word.lower()
                if not re.fullmatch(r"[a-z0-9*]+", pat) or pat.strip("*") == "":
                    raise ValueError(
                        f"bad wildcard {word!r}: want alnum and '*' with "
                        "at least one literal character"
                    )
                (out.excluded_wildcards if neg else out.wildcards).append(pat)
                if boost is not None and not neg:
                    out.pattern_boosts[f"w:{pat}"] = boost
                continue
            toks = _fold(word)
            (out.excluded_terms if neg else out.terms).extend(toks)
            if boost is not None and not neg:
                for t in toks:
                    out.boosts[t] = boost
    return out


def execute_query(
    searcher: Searcher,
    q: str | ParsedQuery,
    k: int = 10,
    pos_postings: DataFrame | None = None,
    max_expansions: int = 50,
    trigram_index: DataFrame | None = None,
    fuzzy_index: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score) top-k for a search-box query. Phrase clauses
    require the opt-in positional side-table (positions.py); without
    it, a phrase query raises rather than silently degrading.
    Multi-term clauses (wildcard/fuzzy/regex) expand against the
    dictionary first (≤ ``max_expansions`` terms each, cf desc) and
    score like ordinary OR terms with their own idf — the Lucene
    scoring-boolean rewrite (operators/multiterm.py). A serving
    deployment should pass the PERSISTED ``trigram_index`` /
    ``fuzzy_index`` sidecars (lexicon.py save/load): without them each
    wildcard/fuzzy query re-derives the sidecar from the terms table —
    correct, and fine on a vocabulary-sized table, but wasted work at
    a 100M-term vocabulary."""
    pq = parse_query(q) if isinstance(q, str) else q
    needs_pos = (
        pq.phrases or pq.excluded_phrases
        or pq.proximities or pq.excluded_proximities
    )
    if needs_pos and pos_postings is None:
        raise ValueError("phrase/proximity clauses need the positional side-table")
    if not pq.has_positive_clause():
        raise ValueError("query has no positive terms")
    # phrase/proximity terms are scoring terms too (standard search-box behavior)
    terms = (
        pq.terms
        + [t for ph in pq.phrases for t in ph]
        + [t for ph, _ in pq.proximities for t in ph]
    )
    boosts = dict(pq.boosts)
    excluded_terms = list(pq.excluded_terms)
    if (
        pq.wildcards or pq.fuzzies or pq.regexes
        or pq.excluded_wildcards or pq.excluded_fuzzies or pq.excluded_regexes
    ):
        from .multiterm import expand_fuzzy, expand_regex, expand_wildcard

        def _wild(s, p, m):
            return expand_wildcard(s, p, m, trigram_index=trigram_index)

        def _fuzz(s, p, m):
            return expand_fuzzy(s, p, m, fuzzy_index=fuzzy_index)

        for kind, pats, expander in (
            ("w", pq.wildcards, _wild),
            ("f", pq.fuzzies, _fuzz),
            ("r", pq.regexes, expand_regex),
        ):
            for pat in pats:
                exp = expander(searcher, pat, max_expansions)
                terms.extend(exp)
                b_ = pq.pattern_boosts.get(f"{kind}:{pat}")
                if b_ is not None:
                    for t in exp:
                        boosts.setdefault(t, b_)
        for pats, expander in (
            (pq.excluded_wildcards, _wild),
            (pq.excluded_fuzzies, _fuzz),
            (pq.excluded_regexes, expand_regex),
        ):
            for pat in pats:
                excluded_terms.extend(expander(searcher, pat, max_expansions))
    if not terms:
        # every positive clause was a pattern and all expanded empty:
        # Lucene MatchNoDocs — an empty result, not an error
        return Searcher.topk(searcher._empty_scores(), k)
    if boosts:
        # boosted path: weight 1.0 for unboosted terms; mm composes
        weights = {t: boosts.get(t, 1.0) for t in {x.lower() for x in terms}}
        scores = bm25_weighted_scores(
            searcher, weights, min_should_match=pq.min_should_match
        )
    elif pq.min_should_match > 1:
        # validated against the distinct folded positive terms inside
        scores = searcher.bm25_scores_msm(terms, pq.min_should_match)
    else:
        scores = searcher.bm25_scores(terms)

    docs = searcher.index.docs
    if "after" in pq.filters:
        docs = docs.filter(
            F.col("ts") >= F.to_timestamp(F.lit(pq.filters["after"]))
        )
    if "before" in pq.filters:
        docs = docs.filter(
            F.col("ts") < F.to_timestamp(F.lit(pq.filters["before"]))
        )
    if "conv" in pq.filters:
        docs = docs.filter(F.col("conv_id") == pq.filters["conv"])
    for col in ("role", "tool"):
        if col in pq.filters:
            docs = docs.filter(F.lower(F.col(col)) == pq.filters[col])
    if pq.filters:
        scores = scores.join(docs.select("doc_id"), "doc_id", "left_semi")

    if excluded_terms:
        bad = searcher.postings_for(excluded_terms).select("doc_id").distinct()
        scores = scores.join(bad, "doc_id", "left_anti")

    # phrase verification last: touch the positional table only for
    # docs already passing every cheaper clause
    from .positions import phrase_match_docs  # local import: opt-in module

    for ph in pq.phrases:
        hits = phrase_match_docs(pos_postings, ph).select("doc_id")
        scores = scores.join(hits, "doc_id", "left_semi")
    for ph in pq.excluded_phrases:
        hits = phrase_match_docs(pos_postings, ph).select("doc_id")
        scores = scores.join(hits, "doc_id", "left_anti")

    from .positions import min_window_spans

    for ph, slop in pq.proximities:
        m_ = len(set(ph))
        hits = (
            min_window_spans(pos_postings, ph)
            .filter(F.col("min_span") <= m_ + slop)
            .select("doc_id")
        )
        scores = scores.join(hits, "doc_id", "left_semi")
    for ph, slop in pq.excluded_proximities:
        m_ = len(set(ph))
        hits = (
            min_window_spans(pos_postings, ph)
            .filter(F.col("min_span") <= m_ + slop)
            .select("doc_id")
        )
        scores = scores.join(hits, "doc_id", "left_anti")

    if pq.sort is None:
        return Searcher.topk(scores, k)
    # field sort (Lucene Sort / ES sort): the query still selects and
    # scores; only the final ordering changes. One broadcast-sized join
    # for the sort key (docs pruned to two columns), then a global
    # TakeOrdered — same single-job shape as the score path.
    fld, desc = pq.sort
    if fld == "doc_id":
        keyed = scores.withColumn("_sk", F.col("doc_id"))
    else:
        keyed = scores.join(
            searcher.index.docs.select("doc_id", F.col(fld).alias("_sk")), "doc_id"
        )
    key = F.desc("_sk") if desc else F.asc("_sk")
    return (
        keyed.orderBy(key, F.asc("doc_id")).limit(k).select("doc_id", "score")
    )
