"""Positional phrase search: exact token-sequence retrieval.

BM25 (``bm25.py``) ranks by bag-of-words — it cannot distinguish
"york new" from "new york". Phrase search is the retrieval primitive
that needs token ORDER: find every document containing the exact
token sequence, with the occurrence count and the first match
position (0-based token index, the repo-wide span convention).

Plan shape — the reason this is NOT the textbook positional-index
join: the phrase is a driver-side literal, so the whole query
compiles into ONE codegen'd projection of within-row higher-order
functions — per term k, the token positions shifted by −k
(``transform∘filter`` over the indexed token array), then the L-way
``array_intersect``: a surviving position is a phrase start. Zero
shuffles, zero joins, zero Python (plan-asserted); the scan is
map-side only, so filters and column pruning push all the way down.
The classic positional inverted index (explode → per-term postings →
L-way offset self-join) only pays off when the index is REUSED across
many queries — for a query-at-a-time engine the within-row form does
strictly less work (no explode, no shuffle) and cannot skew (no
mega-token hot key). The DuckDB twin deliberately runs exactly the
positional-index join plan, so cross-engine agreement gates the
within-row algebra against honest postings arithmetic.

Overlapping occurrences count (text "a a a", phrase "a a" → 2), the
standard positional-index semantics. NULL text coalesces to the empty
token set on both engines (spandedup convention). Tokenization is the
repo's single-space split (shared with paradedup/spandedup); callers
wanting Unicode-aware tokens normalize upstream (textnorm.py).

No reference counterpart (specvital/core has no retrieval subsystem);
semantics follow the public positional-index literature (Manning et
al., IR ch. 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_terms(terms: list[str]) -> list[str]:
    if not terms:
        raise ValueError("phrase must have at least one term")
    for t in terms:
        if not t or " " in t:
            raise ValueError(f"terms must be non-empty and space-free: {t!r}")
    return list(terms)


def _spark_lit(s: str) -> str:
    # Hive-style literals: backslashes are live — escape them FIRST
    # (the bpe.py lesson; a term ending in '\\' must not eat the quote).
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _duck_lit(s: str) -> str:
    return s.replace("'", "''")


def phrase_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, match_count, first_pos) for every doc containing the exact
    token sequence ``terms``; ``first_pos`` is the 0-based token index
    of the earliest occurrence."""
    terms = _check_terms(terms)
    pos_exprs = [
        "transform(filter(_idx, s -> s.t = '%s'), s -> s.i - %d)"
        % (_spark_lit(t), k)
        for k, t in enumerate(terms)
    ]
    matches = pos_exprs[0]
    for p in pos_exprs[1:]:
        matches = f"array_intersect({matches}, {p})"
    return (
        df.selectExpr(
            f"{id_col} AS _id",
            f"split(coalesce({text_col}, ''), ' ') AS _toks",
        )
        .selectExpr(
            "_id",
            "transform(_toks, (t, i) -> struct(t AS t, i AS i)) AS _idx",
        )
        .selectExpr("_id", f"{matches} AS _m")
        .where("size(_m) > 0")
        .selectExpr(
            f"_id AS {id_col}",
            "CAST(size(_m) AS BIGINT) AS match_count",
            "CAST(array_min(_m) AS BIGINT) AS first_pos",
        )
    )


def sql_phrase_search(
    docs_sql: str,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin on the OTHER plan: explode to 1-based
    positional postings, per-term selections, L-way offset equi-join —
    the textbook positional-index query."""
    terms = _check_terms(terms)
    joins = []
    for k, t in enumerate(terms[1:], start=1):
        joins.append(
            f"JOIN (SELECT {id_col}, pos FROM toks"
            f" WHERE tok = '{_duck_lit(t)}') p{k}"
            f" ON p{k}.{id_col} = p0.{id_col}"
            f" AND p{k}.pos = p0.pos + {k}"
        )
    return f"""
        WITH exploded AS (
          SELECT {id_col},
                 unnest(list_transform(
                   string_split(COALESCE({text_col}, ''), ' '),
                   (t, i) -> struct_pack(tok := t, pos := i - 1))) AS s
          FROM ({docs_sql}) src
        ),
        toks AS (
          SELECT {id_col}, s.tok AS tok, s.pos AS pos FROM exploded
        )
        SELECT p0.{id_col} AS {id_col},
               CAST(COUNT(*) AS BIGINT) AS match_count,
               CAST(MIN(p0.pos) AS BIGINT) AS first_pos
        FROM (SELECT {id_col}, pos FROM toks
              WHERE tok = '{_duck_lit(terms[0])}') p0
        {' '.join(joins)}
        GROUP BY p0.{id_col}
    """
