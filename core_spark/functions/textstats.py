"""Text-analysis operators for training-data curation: token counting,
quality scoring, language-ID, document fingerprinting.

All four are pure Column-expression stages — no Python UDF anywhere — so at
100 TB they run inside whole-stage codegen on the JVM, fully pushdown- and
AQE-compatible. Each operator has a Spark emission and a DuckDB oracle
emission computing the same values (syntax differs where the engines do;
semantics are pinned by the shared test corpus).

Design sources are public heuristics (C4/Gopher-style quality signals,
stopword-density language ID); the *shape* — a priority cascade of cheap
per-document predicates producing a label column — mirrors the reference's
framework detection cascade (pkg/parser/detection/detector.go:42-78,
SURVEY.md D1-D8): content evidence scored per candidate, highest priority
wins, deterministic tie-break by fixed ordering.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Tokenization + quality signals
# ---------------------------------------------------------------------------

# BPE-ish word splitter: runs of letters/digits or single non-space symbols —
# approximates how byte-pair tokenizers segment at word/punct boundaries, so
# its count tracks real token budgets far closer than whitespace words do
# (punctuation-heavy web text: 'Hello, world!' = 4 BPE-ish vs 2 whitespace).
# \p{L} is Java-regex; DuckDB RE2 uses the same \p{L} syntax — shared subset.
# Consumed by spark/duck_quality_cols as the oracled n_bpe_tokens column.
TOKEN_PATTERN = r"[\p{L}\p{N}]+|[^\p{L}\p{N}\s]"


def spark_bpe_token_count(text_col: str) -> str:
    """BPE-ish token count (Spark SQL; Java-regex literal escaping)."""
    pat = TOKEN_PATTERN.replace("\\", "\\\\")
    return (
        f"CASE WHEN {text_col} IS NULL THEN 0 "
        f"ELSE regexp_count({text_col}, '{pat}') END"
    )


def duck_bpe_token_count(text_col: str) -> str:
    """DuckDB twin (RE2; raw backslashes in the literal)."""
    return (
        f"CASE WHEN {text_col} IS NULL THEN 0 "
        f"ELSE len(regexp_extract_all({text_col}, '{TOKEN_PATTERN}')) END"
    )

STOPWORDS = (
    "the of and to in a is that it for on with as are this be at or by an "
    "from was were has have not but they you we his her its their"
).split()


def spark_token_count(text_col: str) -> str:
    """Whitespace token count (Spark SQL expr). Empty/NULL-safe."""
    return (
        f"CASE WHEN {text_col} IS NULL OR trim({text_col}) = '' THEN 0 "
        f"ELSE size(split(trim({text_col}), '\\\\s+')) END"
    )


def duck_token_count(text_col: str) -> str:
    return (
        f"CASE WHEN {text_col} IS NULL OR trim({text_col}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({text_col}), '\\s+')) END"
    )


_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def spark_stop_count(text_col: str) -> str:
    """Integer stopword-hit count (tokenize-once membership; see
    spark_quality_cols docstring for why this beats a \\b-alternation)."""
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"size(filter(regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0),"
        f" x -> array_contains(array({stop_arr}), x)))"
    )


def duck_stop_count(text_col: str) -> str:
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"len(list_filter(regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0),"
        f" x -> list_contains([{stop_arr}], x)))"
    )


def spark_quality_cols(text_col: str) -> dict[str, str]:
    """Quality-signal expressions: {out_col: spark_sql_expr}.

    Char-class counts use length-difference over ``translate`` (a plain
    char-map deletion — no regex engine, ~3x cheaper than the former
    regexp_replace passes at 10^12 rows); the stopword count tokenizes
    ONCE into a ``\\w+`` array and filters by membership, which is
    match-for-match identical to the former ``\\b(alt)\\b`` alternation
    scan (a boundary match exists iff the maximal \\w-run equals the
    stopword) without running a 30-branch alternation at every position.
    """
    n = f"length({text_col})"
    alpha = f"({n} - length(translate({text_col}, '{_ALPHABET}', '')))"
    punct = f"({n} - length(translate({text_col}, '.!?,;:', '')))"
    digits = f"({n} - length(translate({text_col}, '0123456789', '')))"
    stop_n = spark_stop_count(text_col)
    toks = spark_token_count(text_col)
    return {
        "n_chars": n,
        "n_tokens": toks,
        "n_bpe_tokens": spark_bpe_token_count(text_col),
        "alpha_ratio": f"CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE)/{n} ELSE 0.0 END",
        "punct_ratio": f"CASE WHEN {n} > 0 THEN CAST({punct} AS DOUBLE)/{n} ELSE 0.0 END",
        "digit_ratio": f"CASE WHEN {n} > 0 THEN CAST({digits} AS DOUBLE)/{n} ELSE 0.0 END",
        "stopword_ratio": (
            f"CASE WHEN {toks} > 0 THEN CAST({stop_n} AS DOUBLE)/({toks}) ELSE 0.0 END"
        ),
        "mean_token_len": (
            f"CASE WHEN {toks} > 0 THEN CAST({alpha} + {digits} AS DOUBLE)/({toks}) "
            f"ELSE 0.0 END"
        ),
    }


def duck_quality_cols(text_col: str) -> dict[str, str]:
    n = f"length({text_col})"
    alpha = f"({n} - length(translate({text_col}, '{_ALPHABET}', '')))"
    punct = f"({n} - length(translate({text_col}, '.!?,;:', '')))"
    digits = f"({n} - length(translate({text_col}, '0123456789', '')))"
    stop_n = duck_stop_count(text_col)
    toks = duck_token_count(text_col)
    return {
        "n_chars": n,
        "n_tokens": toks,
        "n_bpe_tokens": duck_bpe_token_count(text_col),
        "alpha_ratio": f"CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE)/{n} ELSE 0.0 END",
        "punct_ratio": f"CASE WHEN {n} > 0 THEN CAST({punct} AS DOUBLE)/{n} ELSE 0.0 END",
        "digit_ratio": f"CASE WHEN {n} > 0 THEN CAST({digits} AS DOUBLE)/{n} ELSE 0.0 END",
        "stopword_ratio": (
            f"CASE WHEN {toks} > 0 THEN CAST({stop_n} AS DOUBLE)/({toks}) ELSE 0.0 END"
        ),
        "mean_token_len": (
            f"CASE WHEN {toks} > 0 THEN CAST({alpha} + {digits} AS DOUBLE)/({toks}) "
            f"ELSE 0.0 END"
        ),
    }


def with_quality(df, text_col: str = "text"):
    """Append quality-signal columns (Spark DataFrame stage, JVM-only)."""
    from pyspark.sql import functions as F

    return df.withColumns(
        {k: F.expr(v) for k, v in spark_quality_cols(text_col).items()}
    )


# ---------------------------------------------------------------------------
# Language ID: stopword-marker scoring cascade
# ---------------------------------------------------------------------------

# Characteristic high-frequency markers per language (public stopword lists).
# Scored by occurrence count; highest score wins, ties broken by list order
# (the reference's priority-then-name registry ordering, registry.go:50-71).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is ", " that "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " est ", " les "],
    "es": [" el ", " de la ", " que ", " es ", " los "],
    "pt": [" o ", " de ", " que ", " é ", " uma "],
    "ru": [" и ", " в ", " не ", " что ", " это "],
}


def _count_occurrences_spark(text_col: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((length({text_col}) - length(replace({text_col}, '{m}', ''))) "
        f"/ {len(marker)} AS BIGINT)"
    )


def sql_lang_id(text_col: str, langs: list[str] | None = None) -> str:
    """Language-ID as ONE portable SQL expression (replace/length arithmetic
    and CASE only — runs verbatim on Spark and DuckDB).

    Returns 'und' (undetermined) when no marker fires.
    """
    langs = langs or list(LANG_MARKERS)
    padded = f"(' ' || lower({text_col}) || ' ')"
    scores = {
        lang: "(" + " + ".join(
            _count_occurrences_spark(padded, m) for m in LANG_MARKERS[lang]
        ) + ")"
        for lang in langs
    }
    # arg-max with first-listed-wins tie-break: lang_i beats lang_j for j<i
    # only with a strictly greater score
    arms = []
    for i, lang in enumerate(langs):
        conds = [f"{scores[lang]} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"{scores[lang]} > {scores[other]}")
            elif j > i:
                conds.append(f"{scores[lang]} >= {scores[other]}")
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " ELSE 'und' END"


def lang_id_steps(text_col: str, langs: list[str] | None = None,
                  out: str = "lang_pred") -> list[tuple[str, str]]:
    """Language-ID as STEPWISE (col_name, sql) emissions for the Spark side.

    Same semantics as ``sql_lang_id`` (arg-max score, first-listed wins
    ties, 'und' when no marker fires) but each language score is emitted
    ONCE as its own column and the arg-max is array-based:
    ``array_position(scores, array_max(scores))`` returns the FIRST index
    achieving the max — exactly the cascade's tie-break — so no score
    expression is ever textually repeated. The monolithic CASE repeated
    every score across its comparison arms (~330 ``replace()`` calls,
    40 KB): janino failed to compile ``processNext()`` and the stage ran
    INTERPRETED (24.6s for corpus_curation at sf0.1). Stepwise columns are
    protected from re-inlining by SPARK-36718 (CollapseProject refuses to
    duplicate non-cheap aliases) — the hexgrid.cell_steps rule.

    Apply with ``hexgrid.apply_steps``; intermediates are '_'-prefixed and
    dropped. The DuckDB oracle keeps the portable ``sql_lang_id`` monolith
    (equivalent arg-max; DuckDB's vector engine has no codegen cliff).
    """
    langs = langs or list(LANG_MARKERS)
    p = f"_{out}_"
    steps: list[tuple[str, str]] = [
        (f"{p}pad", f"(' ' || lower({text_col}) || ' ')")
    ]
    for lang in langs:
        score = " + ".join(
            _count_occurrences_spark(f"{p}pad", m) for m in LANG_MARKERS[lang]
        )
        steps.append((f"{p}s_{lang}", f"({score})"))
    arr = "array(" + ", ".join(f"{p}s_{lang}" for lang in langs) + ")"
    names = "array(" + ", ".join(f"'{lang}'" for lang in langs) + ")"
    steps.append((f"{p}arr", arr))
    steps.append((f"{p}mx", f"array_max({p}arr)"))
    steps.append((
        out,
        f"(CASE WHEN {p}mx > 0 "
        f"THEN element_at({names}, CAST(array_position({p}arr, {p}mx) AS INT)) "
        f"ELSE 'und' END)",
    ))
    return steps


def with_lang_id(df, text_col: str = "text", out_col: str = "lang_pred"):
    from core_spark.functions.hexgrid import apply_steps

    return apply_steps(df, lang_id_steps(text_col, out=out_col))


# ---------------------------------------------------------------------------
# Document fingerprint (md5-derived 60-bit id; portable across engines)
# ---------------------------------------------------------------------------

def spark_fingerprint(text_col: str) -> str:
    """60-bit content fingerprint as BIGINT (Spark dialect)."""
    return f"CAST(conv(substr(md5({text_col}), 1, 15), 16, 10) AS BIGINT)"


def duck_fingerprint(text_col: str) -> str:
    """Same fingerprint, DuckDB dialect (identical value)."""
    return f"(('0x' || substr(md5({text_col}), 1, 15))::BIGINT)"
