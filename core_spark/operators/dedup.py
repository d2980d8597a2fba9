"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each a first-class operator with a Spark plan designed
for 10^12 documents and (where SQL-expressible) a DuckDB oracle emission:

  exact        md5 grouping — one shuffle on a 60-bit key, no skew (hash keys
               are uniform by construction)
  ngram        word n-gram Jaccard over candidate pairs that share a shingle
               (inverted-index join; never the quadratic cross join)
  minhash_lsh  banded MinHash — the scale path: signature cost O(doc_len),
               candidate generation via equi-join on band keys
  simhash      64-bit SimHash in one numpy pandas-UDF stage; Hamming
               candidate pairs via 4-band exact-match blocking (any pair with
               Hamming distance <= 3 shares at least one of 4 16-bit bands —
               pigeonhole)
  embedding    cosine near-dup over `array<float>` vectors: JVM dot product
               via F.aggregate/zip_with (no Python in the hot path)

Hash portability: every hash the oracle must reproduce is md5-derived
(md5 -> first 15 hex digits -> BIGINT), identical in Spark and DuckDB —
never xxhash64/hash(), which differ per engine. The per-engine dialects live
in functions/textstats.py (spark_fingerprint / duck_fingerprint).

Reference analog: dedup did not exist in specvital/core, but its set-diff
snapshot machinery (tests/integration/snapshot.go:244-264, SURVEY.md J3/J4)
is the same exceptAll/anti-join shape used here for keep/drop splits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from core_spark.functions.textstats import duck_fingerprint, spark_fingerprint

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest-id representative per identical text.

    One hash-aggregate shuffle on the fingerprint; group sizes are bounded by
    true duplicate multiplicity, so no salting is needed (a pathological
    mega-duplicate still aggregates map-side first).
    """
    from pyspark.sql import functions as F

    fp = F.expr(spark_fingerprint(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_fp")
    )


def sql_exact_dedup(docs_table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB oracle for exact_dedup (same grouping, same representative)."""
    return f"""
SELECT MIN({id_col}) AS {id_col}, COUNT(*) AS dup_count
FROM {docs_table}
GROUP BY {duck_fingerprint(text_col)}
"""


# ---------------------------------------------------------------------------
# Word shingles (shared by ngram + minhash)
# ---------------------------------------------------------------------------

def spark_shingles(text_col: str, k: int) -> str:
    """Spark expr: array of word k-gram strings (distinct, order-free).

    Pure higher-order functions (split/transform/slice/array_distinct) —
    JVM-side, no UDF.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    return (
        f"array_distinct(CASE WHEN size({toks}) < {k} "
        f"THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(1, size({toks}) - {k} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {k}))) END)"
    )


def duck_shingles_rows(docs_table: str, text_col: str, k: int, id_col: str) -> str:
    """DuckDB: one row per (doc, shingle), distinct. list_* lambdas mirror
    the Spark higher-order functions exactly."""
    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    shingles = (
        f"CASE WHEN len({toks}) < {k} THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_distinct([array_to_string({toks}[i:i+{k}-1], ' ') "
        f"for i in range(1, len({toks}) - {k} + 2)]) END"
    )
    return f"""
SELECT {id_col}, unnest({shingles}) AS shingle FROM {docs_table}
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard dedup (inverted-index candidate join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, threshold: float = 0.8):
    """Pairs (id_a < id_b, jaccard) with word-k-gram Jaccard >= threshold.

    Plan: explode shingles -> self-equi-join on shingle (only docs sharing a
    shingle ever meet — the inverted index) -> |A∩B| per pair ->
    |A∪B| = |A|+|B|-|A∩B|. The shuffle key is the shingle: a stopword-like
    mega-shingle would skew, so shingles above ``max_df`` postings are
    dropped from candidate generation (they cannot be discriminative) —
    standard prefix-filtering practice and our G8 skew discipline.
    """
    from pyspark.sql import functions as F

    # set size BEFORE exploding so it rides along with every posting row —
    # a separate sizes aggregation would re-run the shingle computation
    # (branching DAGs recompute; no persist needed this way)
    sh = (
        df.select(F.col(id_col), F.expr(spark_shingles(text_col, k)).alias("_shs"))
        .select(F.col(id_col), F.size("_shs").alias("sz"), F.explode("_shs").alias("s"))
    )
    sizes = sh.select(id_col, "sz").distinct()
    # drop non-discriminative mega-postings (see docstring)
    max_df = 1000
    postings = sh.join(
        sh.groupBy("s").agg(F.count("*").alias("df_")).filter(F.col("df_") <= max_df),
        "s",
    ).select(id_col, "s")

    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def sql_ngram_jaccard_pairs(docs_table: str, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            threshold: float = 0.8) -> str:
    """DuckDB oracle: identical inverted-index plan in SQL."""
    shingle_rows = duck_shingles_rows(docs_table, text_col, k, id_col)
    return f"""
WITH sh AS ({shingle_rows}),
sizes AS (SELECT {id_col}, COUNT(*) AS sz FROM sh GROUP BY {id_col}),
posting AS (
  SELECT sh.* FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) ok
  USING (shingle)
),
inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS n_inter
  FROM posting a JOIN posting b
    ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.{id_col} = id_a
JOIN sizes sb ON sb.{id_col} = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _spark_minhash_sig(shingles_col: str, perm: int) -> str:
    """One MinHash signature value: min over shingles of the md5-derived
    60-bit hash salted with the permutation index. References an already-
    materialized shingle-array column — computing the array inline would be
    re-evaluated once PER PERMUTATION (Catalyst duplicates collapsed
    projections; the hexgrid stepwise-emission lesson, measured 69s -> ~9s
    at sf0.1)."""
    h = f"CAST(conv(substr(md5(concat('p{perm}:', x)), 1, 15), 16, 10) AS BIGINT)"
    return f"array_min(transform({shingles_col}, x -> {h}))"


def minhash_lsh_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, n_perm: int = 12, bands: int = 4):
    """Candidate near-dup pairs via banded MinHash LSH.

    n_perm signatures in ``bands`` bands of r = n_perm/bands rows; documents
    agreeing on ALL r signatures of any band become a candidate pair
    (collision probability ~ 1-(1-j^r)^b). Signature computation is one
    narrow projection (no shuffle); candidates come from ``bands``
    equi-joins on (band, key) — uniform md5 keys, no skew.

    Returns DISTINCT (id_a < id_b) candidate pairs; callers refine with
    ngram_jaccard or exact comparison (two-phase: cheap-filter-then-verify,
    the reference's detection-cascade discipline).
    """
    from pyspark.sql import functions as F

    r = n_perm // bands
    assert bands * r == n_perm
    sigs = (
        df.select(F.col(id_col), F.expr(spark_shingles(text_col, k)).alias("_sh"))
        .select(
            F.col(id_col),
            *[F.expr(_spark_minhash_sig("_sh", p)).alias(f"mh{p}") for p in range(n_perm)],
        )
    )
    band_keys = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("_", *[F.col(f"mh{b * r + i}") for i in range(r)]).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = band_keys.alias("a")
    b = band_keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def sql_minhash_lsh_pairs(docs_table: str, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 3,
                          n_perm: int = 12, bands: int = 4) -> str:
    """DuckDB oracle: same signatures (identical md5 arithmetic), same bands."""
    r = n_perm // bands
    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    sh = (
        f"CASE WHEN len({toks}) < {k} THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_distinct([array_to_string({toks}[i:i+{k}-1], ' ') "
        f"for i in range(1, len({toks}) - {k} + 2)]) END"
    )
    sig_cols = ", ".join(
        f"list_min([(('0x' || substr(md5('p{p}:' || x), 1, 15))::BIGINT) for x in {sh}]) AS mh{p}"
        for p in range(n_perm)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, "
        + " || '_' || ".join(f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r))
        + " AS key FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH sigs AS (SELECT {id_col}, {sig_cols} FROM {docs_table}),
bk AS ({band_selects})
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM bk a JOIN bk b
  ON a.band = b.band AND a.key = b.key AND a.{id_col} < b.{id_col}
"""


def verify_pairs_jaccard(pairs, docs, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 3,
                         threshold: float = 0.8):
    """Exact-verify candidate pairs: word-k-gram Jaccard computed ONLY for
    the candidates (array_intersect/array_union — JVM-side), keep pairs at
    or above threshold. The cheap-filter-then-verify discipline: LSH
    proposes, exact math disposes (reference analog: detection cascade's
    cheap-predicate-first, SURVEY §4)."""
    from pyspark.sql import functions as F

    sh = docs.select(
        F.col(id_col), F.expr(spark_shingles(text_col, k)).alias("_sh")
    )
    a = sh.selectExpr(f"{id_col} AS id_a", "_sh AS sh_a")
    b = sh.selectExpr(f"{id_col} AS id_b", "_sh AS sh_b")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs -> cluster representatives
# ---------------------------------------------------------------------------

def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 20):
    """Cluster the near-dup pair graph: (node, component) with component =
    min node id reachable — the standard large-star/small-star-style
    min-label propagation, expressed as symmetric-edge joins iterated to a
    driver-checked fixpoint.

    Each iteration: every node adopts min(own label, neighbors' labels).
    Converges in O(graph diameter) rounds; near-dup graphs are
    shallow clusters, so 3-5 rounds typical. All shuffles are on uniform
    node ids. The iteration count and convergence check are deterministic
    (no RNG) — resume-safe under the manifest.
    """
    from pyspark.sql import functions as F

    edges = (
        pairs.selectExpr(f"{id_a} AS src", f"{id_b} AS dst")
        .union(pairs.selectExpr(f"{id_b} AS src", f"{id_a} AS dst"))
        .distinct()
    )
    labels = edges.selectExpr("src AS node").distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage per round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter("n.component <> o.component")
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_representatives(df, pairs, id_col: str = "doc_id"):
    """Drop every near-dup except the min-id representative per component.

    Documents that appear in no pair are kept (left-anti on the drop set).
    """
    comp = connected_components(pairs)
    drop = comp.filter("node <> component").selectExpr(f"node AS {id_col}")
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash (64-bit, numpy UDF stage) + Hamming blocking
# ---------------------------------------------------------------------------

def simhash64(tokens: list[str]) -> int:
    """Pure kernel: 64-bit SimHash over token strings (md5-derived bits)."""
    import hashlib

    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # two's complement BIGINT


def with_simhash(df, text_col: str = "text", out_col: str = "simhash"):
    """Arrow-batched SimHash stage (the one Python stage in this module)."""
    import pandas as pd  # noqa: F811

    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)

    def run(batches):
        for pdf in batches:
            vals = [
                simhash64(str(t).split()) if t is not None else None
                for t in pdf[text_col]
            ]
            out = pdf.copy()
            out[out_col] = pd.array(vals, dtype="Int64")
            yield out

    return df.mapInPandas(run, fields + f", {out_col} bigint")


def simhash_candidates(df, sim_col: str = "simhash", id_col: str = "doc_id",
                       max_hamming: int = 3):
    """Candidate pairs with Hamming(simhash) <= max_hamming via 4-band
    16-bit blocking (pigeonhole: <=3 differing bits leave >=1 of 4 bands
    identical), refined by an exact JVM popcount — bit_count is built-in."""
    from pyspark.sql import functions as F

    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.expr(f"shiftright({sim_col}, {i * 16}) & 65535").alias("key"),
        )
        for i in range(4)
    ]
    bk = df.select(id_col, sim_col, F.explode(F.array(*bands)).alias("bk")).select(
        id_col, sim_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr(f"bit_count(a.{sim_col} ^ b.{sim_col})").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (JVM dot product; no Python)
# ---------------------------------------------------------------------------

def sql_cosine(a: str, b: str) -> str:
    """Spark expr: cosine similarity of two array<float/double> columns via
    aggregate/zip_with — whole-stage codegen, no UDF."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    na = f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    nb = f"sqrt(aggregate({b}, CAST(0.0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return f"({dot} / ({na} * {nb}))"


def embedding_dup_pairs(df, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.95, n_planes: int = 8):
    """Cosine near-dup pairs via random-hyperplane LSH blocking + exact refine.

    Hyperplanes are deterministic (splitmix64 of plane index — resume-safe).
    Docs agreeing on the full sign-sketch land in one bucket; exact cosine
    refines. Recall is per-bucket (sketch collisions); raise n_planes for
    precision, lower for recall, or use brute_force_pairs as ground truth.
    """
    from pyspark.sql import functions as F

    from core_spark.data.synth import u01

    dim = len(df.select(vec_col).first()[0])
    planes = []
    for p in range(n_planes):
        v = u01(np.arange(dim, dtype=np.uint64), 500 + p) * 2.0 - 1.0
        planes.append(v)

    sketch_terms = []
    for p, v in enumerate(planes):
        arr = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        )
        sketch_terms.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << p} ELSE 0 END)")
    sketch = " + ".join(sketch_terms)

    s = df.select(id_col, vec_col).withColumn("_sketch", F.expr(sketch))
    a, b = s.alias("a"), s.alias("b")
    cos = sql_cosine(f"a.{vec_col}", f"b.{vec_col}")
    return (
        a.join(
            b,
            (F.col("a._sketch") == F.col("b._sketch"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", F.expr(cos))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )
