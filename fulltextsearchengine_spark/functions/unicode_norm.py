"""Unicode normalization for raw web/transcript text — NFC/NFKC
composition plus control-character stripping, the standard first
transform of every large-scale text pipeline (CCNet, Gopher, RefinedWeb
all normalize before hashing/dedup so byte-level variants of the same
string collapse).

Spark has no built-in Unicode-normalize expression, so this is one of
the few sanctioned Python hops in the repo: an Arrow-batched pandas
UDF around ``unicodedata.normalize`` (C-speed per batch, no per-row
Python). The DuckDB oracle twin uses its native ``nfc_normalize`` —
two independent implementations of the same Unicode standard, which is
exactly what makes the gate meaningful.

Control stripping removes the C0/C1 control block except ``\\t \\n \\r``
(the whitespace controls real text legitimately contains) and the
zero-width joiner-adjacent format chars most often left behind by web
scrapes (ZWSP/ZWNJ/ZWJ/BOM). Collapse-whitespace optionally folds any
whitespace run to one space and trims.

Scale shape: a pure row-local ``mapInPandas``-class transform — zero
shuffles, embarrassingly parallel; the Arrow batch is the unit of work.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

NORM_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# C0 (minus tab/newline/CR), DEL+C1, and zero-width/format strays.
_CONTROL_CLASS = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f\u200b\u200c\u200d\ufeff]"


def _make_normalizer(form: str):
    @pandas_udf(T.StringType())
    def norm(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: unicodedata.normalize(form, t))

    return norm


def normalize_corpus(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_whitespace: bool = False,
    out_col: str = "text_norm",
) -> DataFrame:
    """(+) ``out_col`` (normalized text), ``changed`` (bool), and
    ``n_chars_delta`` (long, after − before in code points) so pipelines
    can report how much normalization actually bit.

    Order of operations: normalize first (composition can MERGE a base
    char with a combining mark), then strip controls, then optionally
    collapse whitespace — stripping before normalizing could delete a
    format char that normalization would have composed away anyway, and
    the delta should reflect the final string.
    """
    if form not in NORM_FORMS:
        raise ValueError(f"form must be one of {NORM_FORMS}, got {form!r}")
    raw = F.coalesce(F.col(text_col), F.lit(""))
    out = _make_normalizer(form)(raw)
    if strip_controls:
        out = F.regexp_replace(out, _CONTROL_CLASS, "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return (
        df.withColumn(out_col, out)
        .withColumn("changed", F.col(out_col) != raw)
        .withColumn(
            "n_chars_delta",
            (F.length(F.col(out_col)) - F.length(raw)).cast("long"),
        )
    )
