"""Unicode text normalization for training corpora.

Every serious LLM-data pipeline normalizes text before dedup/tokenize —
otherwise byte-distinct but canonically-equal strings ('e'+U+0301 vs
precomposed 'é') defeat exact dedup, fingerprinting, and decontamination
gram matching. Two halves, split by engine affinity:

JVM half (``clean_text``) — pure codegen'd regexp, zero Python:
  strip C0/DEL control chars (keeping \\n and \\t: newlines carry the
  paragraph structure paradedup splits on), collapse space/tab runs to
  one space, trim. Patterns live in the shared Java-regex/RE2 subset
  (``\\x`` classes only — no ``\\d``/``\\s`` shorthands, the weburl/pii
  rule) so the DuckDB twin is the same pattern text.

Python half (``nfc``) — Spark has no built-in NFC, so this is the
  documented slow-path exception: ONE Arrow-batched scalar pandas_udf
  calling pandas' C-looped ``Series.str.normalize("NFC")`` — never
  row-at-a-time Python, never a second Python stage (the chained-
  mapInPandas anti-scaling lesson). It is oracle-gated because NFC is a
  Unicode-STANDARD function: DuckDB's ``nfc_normalize`` must agree
  byte-for-byte (decomposed/compatibility parity fuzzed in
  tests/test_textnorm.py).

At 100 TB: the JVM half rides whole-stage codegen inside whatever scan
stage runs anyway; the NFC stage is one Arrow round-trip over the text
column — fuse any other Python work into the same pass via
functions/fused.py rather than adding a stage.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

#: C0 controls except \t(09)/\n(0A), plus DEL — shared RE2/Java subset
CONTROL_CLASS = r"[\x00-\x08\x0b-\x1f\x7f]"
#: horizontal whitespace runs (newlines preserved)
HSPACE_CLASS = r"[ \t]+"


def clean_text(col: Column | str) -> Column:
    """JVM-side cleanup: strip controls, collapse runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, F.lit(CONTROL_CLASS), F.lit(""))
    c = F.regexp_replace(c, F.lit(HSPACE_CLASS), F.lit(" "))
    return F.trim(c)


def nfc_series(s: pd.Series) -> pd.Series:
    """Pure-pandas NFC kernel (C-looped); shared by the UDF and tests."""
    return s.str.normalize("NFC")


def nfc() -> Column:
    """Build the NFC pandas_udf lazily — pandas_udf parses its return
    type through the ACTIVE SparkContext, so decorating at module import
    (before any session exists) raises SESSION_OR_CONTEXT_NOT_EXISTS;
    same lazy pattern as s2.py:266."""
    return F.pandas_udf(nfc_series, "string")


def normalize_text(
    df: DataFrame, col: str = "text", out: str = "text_norm"
) -> DataFrame:
    """clean_text → NFC, appended as ``out`` (one Arrow stage total)."""
    return df.withColumn(out, nfc()(clean_text(col)))


_MARKS_TABLE: dict[int, None] | None = None


def _marks_table() -> dict[int, None]:
    """Ordinal→None translate table for every Unicode mark (Mn/Mc/Me).

    Built lazily ON THE EXECUTOR at first batch (one ~0.4s sweep of the
    codepoint space per Python worker, then cached for the process) —
    never shipped through the UDF closure, which would serialize ~2k
    entries into every task.
    """
    global _MARKS_TABLE
    if _MARKS_TABLE is None:
        _MARKS_TABLE = dict.fromkeys(
            cp
            for cp in range(0x110000)
            if unicodedata.category(chr(cp)).startswith("M")
        )
    return _MARKS_TABLE


def strip_marks_series(s: pd.Series) -> pd.Series:
    """NFD → drop ALL marks (Mn/Mc/Me) → NFC recompose.

    Exactly DuckDB's ``strip_accents`` (utf8proc STRIPMARK, probed in
    tests/test_textnorm.py: spacing Devanagari matras and enclosing
    marks go too, and Hangul jamo recompose) — all three steps are
    C-looped pandas str ops.
    """
    return (
        s.str.normalize("NFD")
        .str.translate(_marks_table())
        .str.normalize("NFC")
    )


def fold() -> Column:
    """Lazy pandas_udf for strip_marks_series (see nfc() for why lazy)."""
    return F.pandas_udf(strip_marks_series, "string")


def fold_text(
    df: DataFrame, col: str = "text", out: str = "text_fold"
) -> DataFrame:
    """CCNet-style dedup-key folding: clean → strip marks → lowercase.

    Accent/case/composition variants of the same content collapse to one
    key, so exact dedup / fingerprints / decontamination grams catch
    near-identical docs that byte-level hashing misses. Same stage
    budget as normalize_text: JVM clean, ONE Arrow stage for the mark
    strip, JVM lower() on top.

    The Σ→σ translate before lower() is load-bearing: JVM toLowerCase
    implements SpecialCasing's conditional Final_Sigma rule (word-final
    Σ→ς) while utf8proc maps Σ→σ unconditionally — mapping capital
    sigma out FIRST means the conditional rule can never fire, and
    pre-existing lowercase ς passes through both engines untouched, so
    the engines agree on every input (fuzz-pinned). Final_Sigma is the
    lone conditional lowercase mapping in root locale, and the only
    multi-char one (İ) loses its combining dot in the mark strip before
    lower() ever sees it.
    """
    folded = F.translate(fold()(clean_text(col)), "Σ", "σ")
    return df.withColumn(out, F.lower(folded))


def _sql_clean(expr: str) -> str:
    """DuckDB twin of ``clean_text``: same pattern text as the Spark side
    (raw-string classes pass through DuckDB literals unprocessed; Spark's
    are fed via ``F.lit`` so neither engine's SQL-literal escape rules
    touch them), same op order, DuckDB regexp_replace needs the explicit
    'g' flag Spark implies."""
    return (
        f"trim(regexp_replace(regexp_replace({expr}, "
        f"'{CONTROL_CLASS}', '', 'g'), '{HSPACE_CLASS}', ' ', 'g'))"
    )


def sql_clean_nfc(expr: str) -> str:
    """DuckDB twin of ``normalize_text``'s column expression."""
    return f"nfc_normalize({_sql_clean(expr)})"


def sql_fold(expr: str) -> str:
    """DuckDB twin of ``fold_text``'s column expression.

    ``strip_accents`` is utf8proc's STRIPMARK map — NFD, drop Mn/Mc/Me,
    NFC — which strip_marks_series mirrors exactly; ``lower`` is
    unconditional (no Final_Sigma) on both engines.
    """
    return f"lower(strip_accents({_sql_clean(expr)}))"
