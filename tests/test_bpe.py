"""BPE merge training: Python-model parity on both engines, the fold's
leftmost-first/no-remerge semantics, tie-breaks, degenerate corpora."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.bpe import bpe_train, sql_bpe_train

DOCS = ["a b a b a b c", "a b c d", "x", ""]


def _model(docs, n):
    corpus = [[t for t in d.split(" ") if t] for d in docs]
    out = []
    for rnd in range(1, n + 1):
        c = Counter()
        for toks in corpus:
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += 1
        if not c:
            break
        mx = max(c.values())
        l, r = min(p for p, v in c.items() if v == mx)
        out.append((rnd, l, r, mx))
        new = []
        for toks in corpus:
            acc = []
            for x in toks:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            new.append(acc)
        corpus = new
    return sorted(out)


@pytest.mark.spark
class TestBPE:
    def _spark(self, spark, docs, n):
        df = spark.createDataFrame(
            [(d,) for d in docs], "text string"
        ).selectExpr("filter(split(text, ' '), x -> x != '') AS toks")
        return sorted(tuple(r) for r in bpe_train(df, n).collect())

    def _duck(self, docs, n):
        con = duckdb.connect()
        vals = ", ".join(f"('{d}')" for d in docs)
        con.execute(f"CREATE TABLE d AS SELECT * FROM (VALUES {vals}) _(text)")
        sql = sql_bpe_train(
            "d", "list_filter(string_split(text, ' '), x -> x != '')", n
        )
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    def test_matches_python_model(self, spark):
        assert self._spark(spark, DOCS, 3) == _model(DOCS, 3)

    def test_duckdb_twin_matches_model(self):
        assert self._duck(DOCS, 3) == _model(DOCS, 3)

    def test_leftmost_first_no_remerge(self, spark):
        """'a a a' under merge (a,a) -> ['aa','a']: leftmost-first, and
        the fresh 'aa' does not chain-merge with the trailing 'a' within
        the same round. Round 2 then merges (aa, a)."""
        got = self._spark(spark, ["a a a"], 2)
        assert got == [(1, "a", "a", 2), (2, "aa", "a", 1)]
        assert self._duck(["a a a"], 2) == got

    def test_shared_delimiter_shape(self, spark):
        """The bug the string-replace trick had: 'a b a b a b' must
        yield THREE merged pairs in round 1 (count 3), and round 2 sees
        (ab, ab) twice."""
        got = self._spark(spark, ["a b a b a b"], 2)
        assert got == [(1, "a", "b", 3), (2, "ab", "ab", 2)]
        assert self._duck(["a b a b a b"], 2) == got

    def test_tie_breaks_lexicographic(self, spark):
        got = self._spark(spark, ["z y", "b a"], 1)
        assert got == [(1, "b", "a", 1)]  # (b,a) < (z,y)

    def test_exhausted_corpus_stops_emitting(self, spark):
        # one pair exists; after merging it nothing remains to count
        got = self._spark(spark, ["a b", "c"], 4)
        assert got == [(1, "a", "b", 1)]
        assert self._duck(["a b", "c"], 4) == got

    def test_fuzz_model_parity(self, spark):
        import random

        rng = random.Random(7)
        docs = [
            " ".join(rng.choice("pqrs") for _ in range(rng.randint(0, 12)))
            for _ in range(25)
        ]
        want = _model(docs, 4)
        assert self._spark(spark, docs, 4) == want
        assert self._duck(docs, 4) == want


@pytest.mark.spark
class TestBPEEncode:
    def test_encode_reproduces_training_state(self, spark):
        """bpe_encode(corpus, bpe_train(corpus)) == the corpus state
        training left behind (merges applied in learned order)."""
        from core_spark.operators.bpe import bpe_encode

        df = spark.createDataFrame(
            [(d,) for d in DOCS], "text string"
        ).selectExpr("filter(split(text, ' '), x -> x != '') AS toks")
        merges = [
            (r.left, r.right)
            for r in sorted(bpe_train(df, 3).collect(), key=lambda r: r.round)
        ]
        got = sorted(
            tuple(r.toks) for r in bpe_encode(df, merges).collect()
        )

        # python model: replay training application
        corpus = [[t for t in d.split(" ") if t] for d in DOCS]
        for l, r in merges:
            new = []
            for toks in corpus:
                acc = []
                for x in toks:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                new.append(acc)
            corpus = new
        assert got == sorted(tuple(t) for t in corpus)

    def test_order_dependence_and_duck_twin(self, spark):
        """A later rule consuming an earlier rule's output token only
        fires if merges apply in table order; both engines agree."""
        from core_spark.operators.bpe import bpe_encode, sql_bpe_encode

        merges = [("a", "b"), ("ab", "c")]
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "b a b c")], "doc_id long, text string"
        ).selectExpr("doc_id", "split(text, ' ') AS toks")
        got = {
            r.doc_id: tuple(r.toks)
            for r in bpe_encode(df, merges).collect()
        }
        assert got == {1: ("abc", "d"), 2: ("b", "abc")}

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            "(1, 'a b c d'), (2, 'b a b c')) _(doc_id, text)"
        )
        sql = sql_bpe_encode(
            "d", "string_split(text, ' ')", merges, extra_cols="doc_id, "
        )
        dgot = {r[0]: tuple(r[1]) for r in con.execute(sql).fetchall()}
        assert dgot == got

    def test_quote_in_token_escaped(self, spark):
        from core_spark.operators.bpe import bpe_encode

        df = spark.createDataFrame([(["it's", "x"],)], "toks array<string>")
        [row] = bpe_encode(df, [("it's", "x")]).collect()
        assert list(row.toks) == ["it'sx"]

    def test_backslash_in_token_escaped(self, spark):
        """Backslashes must escape before quotes: a token ending in a
        backslash otherwise eats the closing quote (ParseException) and
        a token like '\\b' becomes a control char in Spark's Hive-style
        literal while DuckDB keeps it literal — both engines must agree
        byte-for-byte."""
        from core_spark.operators.bpe import bpe_encode, sql_bpe_encode

        merges = [("a\\", "b"), ("\\babs\\", "c")]
        df = spark.createDataFrame(
            [(1, ["a\\", "b", "c"]), (2, ["x", "\\b", "a\\", "b"])],
            "doc_id long, toks array<string>",
        )
        got = {
            r.doc_id: tuple(r.toks)
            for r in bpe_encode(df, merges).collect()
        }
        # doc 1: ('a\', 'b') merge -> 'a\b' (one backslash, mid-token)
        assert got == {
            1: ("a\\b", "c"),
            2: ("x", "\\b", "a\\b"),
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT 1 AS doc_id, 'a\\ b c' AS text "
            "UNION ALL SELECT 2, 'x \\b a\\ b'"
        )
        sql = sql_bpe_encode(
            "d", "string_split(text, ' ')", merges, extra_cols="doc_id, "
        )
        dgot = {r[0]: tuple(r[1]) for r in con.execute(sql).fetchall()}
        assert dgot == got
