"""Deterministic stratified sampling (core_spark/operators/sampling.py)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from core_spark.operators import sampling as sm

ROWS = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
RATES = {"en": 0.5, "de": 1.0, "zh": 0.0}


def _py_hash(key: int, salt: str) -> int:
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:15], 16) % sm.SCALE


def _py_keep(doc_id: int, lang: str, default=1.0) -> bool:
    rate = RATES.get(lang, default)
    return _py_hash(doc_id, ":sample") < int(round(rate * sm.SCALE))


@pytest.mark.spark
def test_sample_stratified_matches_python_model(spark):
    df = spark.createDataFrame(ROWS, "doc_id INT, lang STRING")
    kept = {r.doc_id for r in sm.sample_stratified(df, RATES).collect()}
    expect = {i for i, lang in ROWS if _py_keep(i, lang)}
    assert kept == expect
    # rate=0.0 stratum drops entirely; rate=1.0 keeps entirely
    assert not any(lang == "zh" for i, lang in ROWS if i in kept)
    assert all(i in kept for i, lang in ROWS if lang == "de")


@pytest.mark.spark
def test_sample_stratified_no_shuffle(spark):
    df = spark.createDataFrame(ROWS, "doc_id INT, lang STRING")
    plan = (
        sm.sample_stratified(df, RATES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_duckdb_predicate_matches_python_model():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    pred = sm.keep_predicate(RATES, dialect="duckdb")
    kept = {r[0] for r in con.execute(f"SELECT doc_id FROM t WHERE {pred}").fetchall()}
    assert kept == {i for i, lang in ROWS if _py_keep(i, lang)}


@pytest.mark.spark
def test_sample_quota_exact_counts_and_order(spark):
    df = spark.createDataFrame(ROWS, "doc_id INT, lang STRING")
    out = sm.sample_quota(df, 7).collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 7, "de": 7, "zh": 7}
    for lang, ids in by_lang.items():
        pool = sorted(
            (i for i, lg in ROWS if lg == lang),
            key=lambda i: (_py_hash(i, ":quota"), i),
        )
        assert sorted(ids) == sorted(pool[:7]), lang


def test_sample_quota_duckdb_twin():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    got = con.execute(sm.sql_sample_quota("t", 7, "doc_id, lang")).fetchall()
    assert len(got) == 21
    for lang in ("en", "de", "zh"):
        ids = {i for i, lg in got if lg == lang}
        pool = sorted(
            (i for i, lg in ROWS if lg == lang),
            key=lambda i: (_py_hash(i, ":quota"), i),
        )
        assert ids == set(pool[:7]), lang


@pytest.mark.spark
def test_mixture_sample_semantics(spark):
    """Output token shares track the targets, the binding stratum
    survives whole, untargeted strata drop, and nothing upsamples."""
    from core_spark.operators.sampling import mixture_sample

    rows = []
    # tokens per stratum: en 4000, de 1000, zh 500, xx 300 (untargeted)
    for lang, n_docs, words in (("en", 400, 10), ("de", 100, 10),
                                ("zh", 50, 10), ("xx", 30, 10)):
        for i in range(n_docs):
            rows.append((len(rows), lang, " ".join(
                f"w{i}x{j}" for j in range(words))))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    targets = {"en": 0.5, "de": 0.3, "zh": 0.2}
    out = mixture_sample(
        df, targets, "size(split(trim(text), ' '))"
    ).toPandas()
    # binding stratum: min(tokens/share) = min(8000, 3333.3, 2500) -> zh
    # T_out = 2500; expected kept tokens: en 1250, de 750, zh 500
    kept = out.groupby("lang").size() * 10
    assert set(out.lang) <= set(targets)         # xx dropped
    assert kept["zh"] == 500                     # binding stratum whole
    assert abs(kept["en"] - 1250) / 1250 < 0.12  # hash-threshold Chernoff
    assert abs(kept["de"] - 750) / 750 < 0.15
    # deterministic: same input, same kept set
    again = mixture_sample(
        df, targets, "size(split(trim(text), ' '))"
    ).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


@pytest.mark.spark
def test_mixture_sample_edge_semantics(spark):
    """Targets absent from the corpus don't constrain T_out; a corpus of
    only-untargeted strata returns empty; a single targeted stratum is
    kept whole."""
    from core_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "en", "one two three") for i in range(10)]
        + [(100 + i, "xx", "vier fünf") for i in range(5)],
        "doc_id long, lang string, text string",
    )
    expr = "size(split(trim(text), ' '))"
    # 'ja' target absent from corpus -> en binds alone, kept whole
    out = mixture_sample(df, {"en": 0.5, "ja": 0.5}, expr).toPandas()
    assert sorted(out.doc_id) == list(range(10))
    # only untargeted strata -> nothing survives
    out2 = mixture_sample(df.filter("lang = 'xx'"), {"en": 1.0}, expr)
    assert out2.count() == 0
