"""Standing-query routing ("percolation"): match MANY stored queries
against every document in one map-side pass.

The inverse of retrieval: instead of one query against an indexed
corpus, a registry of named boolean queries (topic routes, alert
subscriptions, taxonomy rules) is evaluated against every incoming
document — the Elasticsearch-percolator / streaming-alerts shape, and
the webtext twin of ``detect.py``'s import matcher + negative-match
veto (D3/D8) over source trees. Each query is ``req`` terms (ALL must
appear as tokens) plus optional ``veto`` terms (NONE may appear).

Plan shape: the registry is a driver-side artifact (tiny by contract
— thousands of rules, not millions), so it compiles into ONE literal
array-of-structs inside a codegen'd projection:
``filter(REGISTRY, q -> array_except(q.req, toks) empty AND NOT
arrays_overlap(q.veto, toks))`` then one explode of the surviving
names. Zero joins, zero shuffles, zero Python, no broadcast exchange
even (the literal rides the task binary) — the classification of a
100-TB crawl is embarrassingly parallel and cannot skew. This is the
bpe.py compile-the-artifact pattern, NOT a createDataFrame literal
(CLAUDE.md: a Python-RDD scan on the query path plants 32-task
overhead per pass).

The DuckDB oracle deliberately runs the OTHER plan — the inverted
registry: distinct doc tokens joined to a query-term table, matched
req counted against the query's arity, vetoes anti-joined — so the
map-side algebra is gated against honest postings arithmetic.

Tokenization is the repo's single-space split. NULL text routes
nowhere (coalesced to the empty token set). Duplicate tokens in a doc
are harmless in both plans (array_except is set-algebra; the twin
counts DISTINCT matched terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from core_spark.operators.phrases import _check_terms, _duck_lit, _spark_lit


def _check_queries(
    queries: list[tuple[str, list[str], list[str]]],
) -> list[tuple[str, list[str], list[str]]]:
    if not queries:
        raise ValueError("registry must have at least one query")
    names = [q[0] for q in queries]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate query names: {names}")
    out = []
    for name, req, veto in queries:
        if not name:
            raise ValueError("query name must be non-empty")
        out.append((name, _check_terms(req),
                    _check_terms(veto) if veto else []))
    return out


def _spark_arr(terms: list[str]) -> str:
    if not terms:
        return "CAST(array() AS ARRAY<STRING>)"
    return "array(" + ", ".join(f"'{_spark_lit(t)}'" for t in terms) + ")"


def route_queries(
    df: DataFrame,
    queries: list[tuple[str, list[str], list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, query_name) for every (document, standing query) match."""
    queries = _check_queries(queries)
    registry = "array(" + ", ".join(
        f"struct('{_spark_lit(name)}' AS name,"
        f" {_spark_arr(req)} AS req, {_spark_arr(veto)} AS veto)"
        for name, req, veto in queries
    ) + ")"
    return (
        df.selectExpr(
            f"{id_col} AS _id",
            f"split(coalesce({text_col}, ''), ' ') AS _toks",
        )
        .selectExpr(
            "_id",
            f"filter({registry}, q ->"
            " size(array_except(q.req, _toks)) = 0"
            " AND NOT arrays_overlap(q.veto, _toks)) AS _hits",
        )
        .selectExpr(f"_id AS {id_col}", "explode(_hits.name) AS query_name")
    )


def sql_route_queries(
    docs_sql: str,
    queries: list[tuple[str, list[str], list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin on the inverted-registry plan: postings join
    + arity check + veto anti-join."""
    queries = _check_queries(queries)
    rows = []
    for name, req, veto in queries:
        for t in req:
            rows.append(f"('{_duck_lit(name)}', '{_duck_lit(t)}', 'req')")
        for t in veto:
            rows.append(f"('{_duck_lit(name)}', '{_duck_lit(t)}', 'veto')")
    qvals = ", ".join(rows)
    return f"""
        WITH qterms AS (
          SELECT * FROM (VALUES {qvals}) t(qname, term, kind)
        ),
        dtoks AS (
          SELECT DISTINCT {id_col}, unnest(string_split(
            COALESCE({text_col}, ''), ' ')) AS tok
          FROM ({docs_sql}) src
        ),
        arity AS (
          SELECT qname, COUNT(*) AS n_req FROM qterms
          WHERE kind = 'req' GROUP BY qname
        ),
        hits AS (
          SELECT d.{id_col}, q.qname, COUNT(DISTINCT q.term) AS n_hit
          FROM dtoks d JOIN qterms q ON q.term = d.tok AND q.kind = 'req'
          GROUP BY d.{id_col}, q.qname
        ),
        vetoed AS (
          SELECT DISTINCT d.{id_col}, q.qname
          FROM dtoks d JOIN qterms q ON q.term = d.tok AND q.kind = 'veto'
        )
        SELECT h.{id_col} AS {id_col}, h.qname AS query_name
        FROM hits h
        JOIN arity a ON a.qname = h.qname AND h.n_hit = a.n_req
        WHERE NOT EXISTS (
          SELECT 1 FROM vetoed v
          WHERE v.{id_col} = h.{id_col} AND v.qname = h.qname
        )
    """
