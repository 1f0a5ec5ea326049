"""Scalar/vectorized function library (SURVEY.md §2.7)."""

from .tokenize import tokens_col, tokenize_pandas_udf, tokenize_texts

__all__ = ["tokens_col", "tokenize_pandas_udf", "tokenize_texts"]
