"""Text cleaning + tokenization (SURVEY.md §2.2 P1-P5, P8).

Reference semantics being reproduced (NOT ported — these are JVM-side
column expressions, the reference is per-cell Python):
- clean_str (utils/utils.py:157-163): lowercase, any run of
  non-[a-z0-9] -> '_', strip leading/trailing '_'.
- clean_date (utils/utils.py:165-181): recognized date strings
  canonicalized to yyyymmdd so differently-formatted dates compare
  equal. We canonicalize date substrings *inside* text (ISO yyyy-mm-dd
  and us mm/dd/yyyy) before clean_str.
- tokenize_record (comparison_approaches/exact_matching.py:10-18):
  '_'-split, drop '' and 'nan', distinct set.

Everything here stays inside whole-stage codegen (regexp_replace /
split / array ops) — the UDF boundary is never crossed for cleaning.
``py_*`` twins are the pure-Python oracle used by pytest parity tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# date canonicalization: ISO yyyy-mm-dd and US mm/dd/yyyy -> yyyymmdd
_ISO_RE = r"(\d{4})-(\d{2})-(\d{2})"
_US_RE = r"(\d{2})/(\d{2})/(\d{4})"


def canon_dates_col(col: Column) -> Column:
    c = F.regexp_replace(col, _ISO_RE, r"$1$2$3")
    return F.regexp_replace(c, _US_RE, r"$3$1$2")


def clean_text_col(col: Column) -> Column:
    """clean_date ∘ clean_str as one codegen'd expression chain.

    NULL coalesces to '' (the reference str()-ifies non-strings,
    utils/utils.py:183-189; NaN cells normalize to None->dropped)."""
    c = canon_dates_col(F.coalesce(col, F.lit("")))
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")


def tokens_col(cleaned: Column, distinct: bool = True) -> Column:
    """'_'-split token array, dropping '' and 'nan'."""
    toks = F.filter(
        F.split(cleaned, "_"), lambda t: (t != F.lit("")) & (t != F.lit("nan"))
    )
    return F.array_distinct(toks) if distinct else toks


def signature_col(tokens: Column) -> Column:
    """Canonical record signature: sorted distinct tokens joined by ' '.

    The reference's frozenset signature (exact_matching.py:10-18); two
    records are exact matches iff signatures are equal, which turns the
    reference's intra-block nested loop into an equi-join key.
    """
    return F.array_join(F.array_sort(F.array_distinct(tokens)), " ")


# ---------------------------------------------------------------- oracle
def py_canon_dates(s: str) -> str:
    s = re.sub(_ISO_RE, r"\1\2\3", s)
    return re.sub(_US_RE, r"\3\1\2", s)


def py_clean_text(s: str | None) -> str:
    if s is None:
        return ""
    s = py_canon_dates(s).lower()
    s = re.sub(r"[^a-z0-9]+", "_", s)
    return re.sub(r"^_+|_+$", "", s)


def py_tokenize(cleaned: str, distinct: bool = True) -> list[str]:
    toks = [t for t in cleaned.split("_") if t not in ("", "nan")]
    if distinct:
        seen: dict[str, None] = dict.fromkeys(toks)
        return list(seen)
    return toks


def py_signature(tokens: list[str]) -> str:
    return " ".join(sorted(set(tokens)))
