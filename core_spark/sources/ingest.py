"""Sources & sinks — the reference's Source abstraction re-expressed as
Spark readers (SURVEY.md §2.1 S1-S8).

Reference model: a Source streams files under a root with path-escape
protection (pkg/source/local.go:21-113), discovery walks skip vendored
subtrees (pkg/parser/scanner.go:42-51), candidates are filtered by name
pattern and size BEFORE being read (scanner.go:468-489). The Spark analogs
keep the same ordering discipline: every cheap predicate is a pushed Column
filter on the scan, applied before any UDF stage.

| Reference | Here |
| --- | --- |
| LocalSource + discovery walk (S1, S3) | ``read_file_tree`` (binaryFile) |
| skip-dir pruning (S4) | path predicates -> partition/file pruning |
| glob patterns (F2) | ``pathGlobFilter`` read option + regexp filter |
| max-file-size (F3) | ``length(content) <= cap`` filter |
| corpus table scan (graft) | ``read_corpus`` (parquet / iceberg) |
| JSON / snapshot sinks (S7, S8) | ``write_snapshot`` (deterministic order) |
| GitSource (S2) | out-of-band ingestion -> lineage cols, see docstring |
"""

from __future__ import annotations

import fnmatch

DEFAULT_SKIP_DIRS = (
    "node_modules", ".git", "vendor", "dist", ".next", "__pycache__", ".cache",
)  # reference list: pkg/parser/scanner.go:42-51

DEFAULT_MAX_FILE_SIZE = 10 * 1024 * 1024  # scanner.go:37

CORPUS_SCHEMA_FIELDS = {
    "url": "string",
    "warc_ts": "timestamp",
    "html": "binary",
    "lang": "string",
}


def read_corpus(spark, path: str, fmt: str = "parquet", validate: bool = True):
    """Scan the web-pages table (BASELINE.json input_hint schema).

    ``fmt='iceberg'`` reads a catalog table name instead of a path (same
    DataFrame downstream — Iceberg's scan does partition pruning on pushed
    predicates exactly like the parquet reader here).
    """
    if fmt == "iceberg":
        df = spark.read.table(path)
    else:
        df = spark.read.format(fmt).load(path)
    if validate:
        have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        missing = [
            f"{k}:{t}" for k, t in CORPUS_SCHEMA_FIELDS.items()
            if have.get(k) != t
        ]
        if missing:
            raise ValueError(f"corpus schema mismatch, need {missing}, have {have}")
    return df


def read_file_tree(
    spark,
    root: str,
    glob: str | None = None,
    skip_dirs: tuple[str, ...] = DEFAULT_SKIP_DIRS,
    max_file_size: int = DEFAULT_MAX_FILE_SIZE,
    recursive: bool = True,
):
    """binaryFile scan of a file tree with the reference's pruning rules.

    Returns (path, modificationTime, length, content) rows. Skip-dir and
    size predicates are Column filters — Catalyst prunes listed files before
    content ever reaches Python (the S4 'never descend' analog; at the
    listing level Spark still enumerates, so for vendored monorepos prefer a
    ``pathGlobFilter`` that excludes the dirs outright).
    """
    from pyspark.sql import functions as F

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    for d in skip_dirs:
        df = df.filter(~F.col("path").contains(f"/{d}/"))
    df = df.filter(F.col("length") <= max_file_size)
    return df


def glob_filter(df, patterns: list[str], path_col: str = "path"):
    """User glob patterns over relative paths (F2; doublestar semantics via
    fnmatch translation to a regex Column predicate)."""
    from pyspark.sql import functions as F

    if not patterns:
        return df
    regexes = [fnmatch.translate(p).replace("\\Z", "$") for p in patterns]
    cond = None
    for r in regexes:
        c = F.col(path_col).rlike(r)
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def write_snapshot(df, path: str, order_by: list[str], fmt: str = "parquet"):
    """Deterministic sink: explicit total order before writing (the
    reference sorts results because goroutines finish out of order,
    pkg/parser/scanner.go:558-564 — Spark tasks do too)."""
    (
        df.orderBy(*order_by)
        .coalesce(1)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def with_git_lineage(df, commit_sha: str, committed_at, branch: str | None = None):
    """GitSource analog (S2): clone/fetch happens out-of-band (a driver-side
    ingestion job — cgo git is to Go what JGit/CLI is to Spark); the engine
    records provenance as literal lineage columns, like the reference
    captures SHA/branch/time at source construction (pkg/source/git.go:51-169)."""
    from pyspark.sql import functions as F

    out = df.withColumn("commit_sha", F.lit(commit_sha)).withColumn(
        "committed_at", F.lit(committed_at)
    )
    if branch is not None:
        out = out.withColumn("branch", F.lit(branch))
    return out
