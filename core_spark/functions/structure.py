"""Document-structure inventory: the reference's nested suite/test tree,
re-expressed for web documents.

The reference parses each file into a recursively nested TestSuite tree and
flattens it for aggregation with a materialized ancestry path (SURVEY.md
§1.3: recursive StructType is impossible in Spark, so one row per item with
``suite_path: array<string>``; snapshot.go:29-34 does the same flattening).

The webtext analog: every document's heading outline (h1..h6). The kernel
walks headings in order keeping a stack of ancestors — EXACTLY the
reference's recursive-descent suite extraction (shared/jstest/parser.go:
354-431 ParseNode), depth-capped like MaxTreeDepth (tspool/pool.go:40).

Output: one row per heading
    (key_cols..., heading_idx, level, title, path array<string>, n_words)
where ``n_words`` counts the body words between this heading and the next
(any level) — the 'tests per suite' analog. A1's recursive CountTests maps
to groupBy aggregations over the flattened rows.
"""

from __future__ import annotations

import re

import pandas as pd

MAX_DEPTH = 6  # h1..h6 — the depth cap is structural here

_RE_HEADING = re.compile(
    rb"(?is)<h([1-6])[^>]*>(.*?)</h[1-6]\s*>"
)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_WS = re.compile(r"\s+")


def _clean(fragment: bytes) -> str:
    txt = _RE_TAG.sub(b" ", fragment).decode("utf-8", errors="replace")
    return _RE_WS.sub(" ", txt).strip()


def extract_outline(html: bytes | None) -> list[dict]:
    """Pure kernel: html -> flattened heading inventory (deterministic).

    Stack rule: a level-n heading pops the stack to depth n-1 and becomes
    the new depth-n ancestor (standard outline semantics; ties of skipped
    levels nest under the nearest shallower ancestor).
    """
    if html is None:
        return []
    rows = []
    stack: list[str] = []  # ancestor titles
    matches = list(_RE_HEADING.finditer(html))
    for i, m in enumerate(matches):
        level = int(m.group(1))
        title = _clean(m.group(2))
        depth = min(level, MAX_DEPTH) - 1
        del stack[depth:]
        path = list(stack)
        stack.append(title)
        body_start = m.end()
        body_end = matches[i + 1].start() if i + 1 < len(matches) else len(html)
        body = _clean(html[body_start:body_end])
        rows.append(
            {
                "heading_idx": i,
                "level": level,
                "title": title,
                "path": path,
                "n_words": len(body.split()) if body else 0,
            }
        )
    return rows


OUTLINE_SCHEMA = (
    "heading_idx int, level int, title string, path array<string>, n_words int"
)


def with_outline(df, html_col: str = "html", key_cols: tuple[str, ...] = ("doc_id", "url")):
    """Explode each document into its heading inventory (0 rows if none)."""
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name in key_cols
        )
        + ", "
        + OUTLINE_SCHEMA
    )
    keys = list(key_cols)

    def run(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                keyvals = tuple(getattr(row, k) for k in keys)
                for r in extract_outline(getattr(row, html_col)):
                    recs.append(
                        keyvals
                        + (r["heading_idx"], r["level"], r["title"], r["path"], r["n_words"])
                    )
            yield pd.DataFrame(
                recs,
                columns=keys + ["heading_idx", "level", "title", "path", "n_words"],
            )

    return df.select(*keys, html_col).mapInPandas(run, out_schema)


def outline_counts(outline_df, key: str = "doc_id"):
    """A1 analog: recursive counting over the flattened tree.

    n_headings = total nodes; n_top = roots; n_words_total = sum of leaf
    payloads — all via one hash aggregate, no recursion needed once flat.
    """
    from pyspark.sql import functions as F

    return outline_df.groupBy(key).agg(
        F.count("*").alias("n_headings"),
        F.sum((F.size("path") == 0).cast("int")).alias("n_top"),
        F.max(F.size("path") + 1).alias("max_depth"),
        F.sum("n_words").alias("n_words_total"),
    )
