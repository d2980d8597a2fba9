"""Unicode normalization (functions/textnorm) vs a Python model + the
DuckDB twin.

Gate chain: Spark ``normalize_text`` == Python model (fixed tricky batch,
one Spark round-trip) and DuckDB ``sql_clean_nfc`` == the SAME model
(fixed batch + hypothesis fuzz, no Spark in the loop) — so Spark == DuckDB
transitively, which is what the ``text_normalize`` oracle then pins on
real corpus data. NFC is a Unicode-STANDARD function; pandas (Python
unicodedata) and DuckDB (utf8proc) must agree byte-for-byte.
"""

from __future__ import annotations

import re
import unicodedata

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.functions.textnorm import (
    CONTROL_CLASS,
    HSPACE_CLASS,
    clean_text,
    fold_text,
    nfc_series,
    normalize_text,
    sql_clean_nfc,
    sql_fold,
    strip_marks_series,
)

_CONTROL_RE = re.compile(CONTROL_CLASS)
_HSPACE_RE = re.compile(HSPACE_CLASS)


def model(s: str) -> str:
    """Reference semantics: strip controls, collapse hspace, trim
    SPACES only (Spark/DuckDB trim is space-only — not Python .strip(),
    which would also eat the newlines clean_text deliberately keeps),
    then standard NFC."""
    s = _CONTROL_RE.sub("", s)
    s = _HSPACE_RE.sub(" ", s)
    return unicodedata.normalize("NFC", s.strip(" "))


# Decomposed accents, Hangul jamo (compose to one syllable), the
# angstrom SIGN (U+212B -> U+00C5 under NFC), an fi ligature (NFC keeps
# it -- only NFKC decomposes), stacked combining marks, controls, tab
# runs, NUL, newline padding (kept by trim), already-composed text.
TRICKY = [
    "élève",
    "Ångström",
    "Å unit",
    "각 jamo",
    "ﬁsh ligature",
    "ö́ stacked",
    "ṩ dot order",
    "x\x07y\x00z\x1f.",
    "a\tb  c\t\t d",
    " \n pad \n ",
    "café composed",
    "plain ascii",
    "",
    "\t \t",
]


@pytest.mark.spark
def test_normalize_text_matches_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "id long, t string"
    )
    got = {
        r["id"]: r["n"]
        for r in normalize_text(df, "t", "n").select("id", "n").collect()
    }
    assert got == {i: model(t) for i, t in enumerate(TRICKY)}


@pytest.mark.spark
def test_normalize_text_single_arrow_stage(spark):
    """The NFC stage must be ONE ArrowEvalPython — clean_text rides the
    JVM projection, never a second Python stage."""
    df = spark.createDataFrame([(1, "á")], "id long, t string")
    plan = (
        normalize_text(df, "t", "n")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time fallback


@pytest.mark.spark
def test_clean_text_jvm_only(spark):
    """clean_text alone is pure codegen'd JVM SQL (no Python stage)."""
    df = spark.createDataFrame([(1, " x\x07 \t y ")], "id long, t string")
    out = df.select(clean_text("t").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert out.collect()[0]["c"] == "x y"


def test_nfc_series_is_standard_nfc():
    s = pd.Series(TRICKY)
    assert list(nfc_series(s)) == [
        unicodedata.normalize("NFC", t) for t in TRICKY
    ]


def _duck(strings):
    con = duckdb.connect()
    try:
        # dtype pinned: an empty list would infer float64 -> DOUBLE
        con.register(
            "df", pd.DataFrame({"t": pd.Series(list(strings), dtype="string")})
        )
        return [
            r[0]
            for r in con.execute(
                f"SELECT {sql_clean_nfc('t')} FROM df"
            ).fetchall()
        ]
    finally:
        con.close()


def test_duckdb_twin_matches_model_fixed():
    assert _duck(TRICKY) == [model(t) for t in TRICKY]


# Combining marks, jamo, precomposed, compatibility chars, controls,
# hspace — the NFC/clean stress alphabet (no surrogates).
_ALPHABET = (
    "ab zAN19."
    "\t\n\x00\x07\x1f\x7f"
    "̧̣́̀̈̊̇"
    "eocnéÅÅﬁ"
    "각각"
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHABET, max_size=24), max_size=12))
def test_duckdb_twin_matches_model_fuzz(strings):
    assert _duck(strings) == [model(t) for t in strings]


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=24))
def test_model_idempotent(s):
    assert model(model(s)) == model(s)


# --------------------------------------------------------------------------
# fold_text — CCNet-style dedup-key folding (clean → strip marks → lower)
# --------------------------------------------------------------------------


def _strip_marks_model(s: str) -> str:
    """utf8proc STRIPMARK semantics: NFD, drop ALL marks (Mn/Mc/Me —
    spacing Devanagari matras and enclosing marks too, probed below),
    NFC recompose (Hangul jamo come back composed)."""
    d = unicodedata.normalize("NFD", s)
    d = "".join(c for c in d if not unicodedata.category(c).startswith("M"))
    return unicodedata.normalize("NFC", d)


def fold_model(s: str) -> str:
    """clean (no NFC — the strip ends in its own NFC) → strip marks →
    Σ→σ → lower. The explicit Σ→σ keeps the model aligned with BOTH
    engines: with capital sigma mapped out first, Python str.lower()'s
    conditional Final_Sigma rule (which the JVM also implements but
    utf8proc does not) can never fire."""
    s = _CONTROL_RE.sub("", s)
    s = _HSPACE_RE.sub(" ", s).strip(" ")
    return _strip_marks_model(s).replace("Σ", "σ").lower()


# Case/accent/composition variants + the fold-specific landmines: Greek
# final sigma (word-final Σ after a letter is where JVM Final_Sigma would
# fire), İ (multi-char lowercase, but its dot is a mark and strips first),
# spacing (Mc) and enclosing (Me) marks, titlecase digraph ǅ.
FOLD_TRICKY = TRICKY + [
    "ΣΙΓΜΑΣ",
    "Σ ς σ AΣ.",
    "ὈΔΥΣΣΕΎΣ",
    "İstanbul Iı",
    "ÉLÈVE CAFÉ",
    "ǅungla Ǆ",
    "काा matra",
    "a⃝ enclosed",
    "ẞ STRASSE ß",
]


def test_strip_marks_series_semantics():
    got = list(strip_marks_series(pd.Series(FOLD_TRICKY)))
    assert got == [_strip_marks_model(t) for t in FOLD_TRICKY]
    # the probed strip_accents behaviors, pinned explicitly:
    probe = list(
        strip_marks_series(pd.Series(["का", "a⃝", "각", "́"]))
    )
    assert probe == ["क", "a", "각", ""]  # Mc dropped, Me dropped,
    # decomposed jamo recomposed, lone mark vanishes


@pytest.mark.spark
def test_fold_text_matches_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FOLD_TRICKY)], "id long, t string"
    )
    got = {
        r["id"]: r["f"]
        for r in fold_text(df, "t", "f").select("id", "f").collect()
    }
    assert got == {i: fold_model(t) for i, t in enumerate(FOLD_TRICKY)}


def _duck_fold(strings):
    con = duckdb.connect()
    try:
        con.register(
            "df", pd.DataFrame({"t": pd.Series(list(strings), dtype="string")})
        )
        return [
            r[0]
            for r in con.execute(f"SELECT {sql_fold('t')} FROM df").fetchall()
        ]
    finally:
        con.close()


def test_duckdb_fold_twin_matches_model_fixed():
    assert _duck_fold(FOLD_TRICKY) == [fold_model(t) for t in FOLD_TRICKY]


_FOLD_ALPHABET = _ALPHABET + "ΣσςǄǅǆİıẞßØøĐđŒœÉÑा⃝ＡⒶ"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet=_FOLD_ALPHABET, max_size=24), max_size=12))
def test_duckdb_fold_twin_matches_model_fuzz(strings):
    assert _duck_fold(strings) == [fold_model(t) for t in strings]


@pytest.mark.spark
def test_fold_collapses_variant_docs_for_dedup(spark):
    """The reason fold exists: md5 over raw bytes sees 4 distinct docs,
    md5 over the fold key sees 1 — canonically-equal / accent- /
    case-variant copies dedup together."""
    from pyspark.sql import functions as F

    variants = [
        "Élève Café",  # precomposed
        "Élève Café",  # decomposed
        "ELÈVE CAFÉ".replace("E", "É", 1),  # case-varied: "ÉLÈVE CAFÉ"
        "eleve  cafe\t",  # accent-less, messy whitespace
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(variants)], "id long, text string"
    )
    out = fold_text(df).select(
        F.countDistinct("text").alias("raw"),
        F.countDistinct(F.md5("text_fold")).alias("folded"),
    ).collect()[0]
    assert out["raw"] == 4 and out["folded"] == 1


@pytest.mark.spark
def test_fold_composes_with_exact_dedup(spark):
    """Through the real operator: exact_dedup on the fold key keeps ONE
    representative (lowest id) for the 4 variants; on raw bytes it keeps
    all 4."""
    from core_spark.operators.dedup import exact_dedup

    variants = [
        "Élève Café",  # precomposed
        "Élève Café",  # decomposed, same canonical text
        "ÉLÈVE CAFÉ",  # upper
        "eleve  cafe\t",  # accent-less, messy whitespace
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(variants)], "doc_id long, text string"
    )
    raw = exact_dedup(df).collect()
    assert len(raw) == 4 and all(r["dup_count"] == 1 for r in raw)
    folded = exact_dedup(fold_text(df), text_col="text_fold").collect()
    assert len(folded) == 1
    assert folded[0]["doc_id"] == 0 and folded[0]["dup_count"] == 4


@pytest.mark.spark
def test_fold_text_single_arrow_stage(spark):
    df = spark.createDataFrame([(1, "Á")], "id long, t string")
    plan = (
        fold_text(df, "t", "f")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
