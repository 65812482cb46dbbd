"""Deduplication for large-scale training-data pipelines.

All variants are declarative DataFrame pipelines (JVM-side hashing via
``xxhash64``/``md5``; no Python in any hot path) built to survive
100 TB:

- exact:        hash-groupBy on content digest — one shuffle.
- n-gram Jaccard: inverted shingle join (explode → self-join on
  shingle → count common). Hot shingles are dropped above ``max_df``
  (a stopword-shingle appearing in millions of docs contributes no
  discrimination but quadratic join fan-out — the classic skew guard).
- MinHash + LSH: per-doc signature = array of min-hashes (computed as
  ``array_min(transform(shingles, xxhash64(s, seed)))`` — pure
  Catalyst, vectorized, no UDF), banded into ``b`` bands of ``r`` rows;
  candidate pairs share a band bucket; candidates are verified with
  exact Jaccard so the output is exact-above-threshold (no false
  positives; recall governed by (b, r)).
- SimHash: 64-bit signature from per-bit majority of token hashes —
  expressed as 64 conditional sums in ONE hash aggregate (whole-stage
  codegen keeps this JVM-side); near-dup candidates = equality on any
  of four 16-bit bands (Hamming ≤ 3 guarantee).

The reference has no dedup; these reuse its architectural pattern —
mergeable per-partition partials + one keyed shuffle (README.md:289-299
in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE_N = 3


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content digest.

    Returns the surviving ids + digest. One shuffle (groupBy digest);
    at scale the digest groupBy is near-uniform (md5 keys), no skew.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "digest", "dup_count")
    )


def shingles(df: DataFrame, tokens_col: str, n: int = DEFAULT_SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id cols…, shingle string).

    Pure Catalyst: ``transform`` over token indexes + ``array_join``.
    """
    sh = F.array_distinct(
        F.transform(
            F.slice(
                F.col(tokens_col), 1, F.greatest(F.size(tokens_col) - (n - 1), F.lit(0))
            ),
            lambda _, i: F.array_join(F.slice(F.col(tokens_col), i + 1, n), " "),
        )
    )
    return df.withColumn("shingles", sh)


def ngram_jaccard_pairs(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.8,
    max_df: int | None = 10000,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b, jaccard ≥ threshold)
    via the inverted shingle join."""
    sh = (
        shingles(df.select(id_col, tokens_col), tokens_col, n)
        .select(F.col(id_col).alias("id"), F.explode("shingles").alias("shingle"))
        .distinct()
    )
    if max_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, tokens_col: str, id_col: str, num_hashes: int = 64, n: int = DEFAULT_SHINGLE_N
) -> DataFrame:
    """(id, sig array<long>) — sig[i] = min over shingles of
    xxhash64(shingle, i). No UDF: array_min ∘ transform is codegen'd."""
    sh = shingles(df.select(id_col, tokens_col), tokens_col, n)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return sh.filter(F.size("shingles") > 0).select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_dedup(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = DEFAULT_SHINGLE_N,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs: LSH banding proposes, exact Jaccard verifies.

    With (bands=16, rows=4) a pair at jaccard 0.8 is caught with
    p = 1-(1-0.8^4)^16 ≈ 0.9997; the verify join removes all false
    positives, so precision is exact.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # one shingle pass shared by the signature path and the verify path
    shd = shingles(df.select(id_col, tokens_col), tokens_col, n).filter(
        F.size("shingles") > 0
    ).persist()
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    # banded feeds BOTH sides of the self-join → persist, or the whole
    # signature pipeline evaluates twice per downstream action
    sigs = shd.select(F.col(id_col).alias("id"), sig.alias("sig"))
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket").persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .persist()  # reused by cand_ids, the semi-join, and the verify join
    )
    # verify candidates with exact Jaccard over shingle sets; the
    # exploded shingle table feeds two joins + the size agg → persist
    sh = (
        shd.select(F.col(id_col).alias("id"), F.explode(F.col("shingles")).alias("shingle"))
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    # verify only candidate docs: semi-join slashes the shingle table
    # before the pairwise common-count join (candidates ≪ corpus)
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    sh_c = sh.join(F.broadcast(cand_ids), "id", "left_semi")
    common = (
        cand.join(sh_c.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(sh_c.withColumnsRenamed({"id": "id_b"}), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def resolve_keep_list(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Turn near-dup pairs into a keep/drop decision: connected
    components over the pair graph, keep the minimum id per component.

    The pair set is sparse relative to the corpus (that's the point of
    near-dup detection), so the union-find runs driver-side over the
    collected pairs — the corpus itself is only touched by one
    broadcast anti-join. Returns the surviving rows of ``df``.

    At extreme pair counts swap the driver union-find for iterative
    label propagation (min-id broadcast join until fixpoint); the
    surrounding plan is unchanged.
    """
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs.select("id_a", "id_b").collect():
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drops = [x for x in parent if find(x) != x]
    spark = df.sparkSession
    drop_df = spark.createDataFrame([(d,) for d in drops] or [(None,)], f"{id_col} long")
    return df.join(F.broadcast(drop_df.where(F.col(id_col).isNotNull())), id_col, "left_anti")


def simhash(df: DataFrame, tokens_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc as ONE hash aggregate (no UDF).

    Explode tokens → xxhash64 → per bit k: Σ(±1) over occurrences →
    sign vector → packed long. 64 sum-expressions stay inside a single
    whole-stage-codegen'd HashAggregate.
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("tok"))
    h = F.xxhash64("tok")
    sums = [
        F.sum(
            F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(64)
    ]
    agg = toks.groupBy("id").agg(*sums)
    packed = None
    for k in range(64):
        bit = F.when(F.col(f"b{k}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, k)
        packed = term if packed is None else packed.bitwiseOR(term)
    return agg.select("id", packed.alias("simhash"))


def simhash_candidates(sig_df: DataFrame) -> DataFrame:
    """Near-dup candidate pairs: equality on any 16-bit band of the
    simhash (catches all pairs with Hamming distance ≤ 3)."""
    banded = sig_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def embedding_cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 6,
    seed: int = 42,
    exhaustive: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path (default): multi-table random-hyperplane LSH proposes
    candidate pairs (same bucket in ANY table), exact cosine verifies —
    precision exact, recall set by (n_planes, n_tables); high-cosine
    pairs (the dedup regime) collide with probability
    1-(1-(1-θ/π)^planes)^tables → ≈1 for θ→0. ``exhaustive=True``
    switches to the full O(n²) self-join (the small-data oracle path).
    """
    from .ann import hyperplane_signature

    dim = None
    v = emb.select(id_col, vec_col)
    if exhaustive:
        cand = (
            v.alias("x")
            .join(v.alias("y"), F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"x.{vec_col}").alias("va"),
                F.col(f"y.{id_col}").alias("id_b"),
                F.col(f"y.{vec_col}").alias("vb"),
            )
        )
    else:
        dim = len(emb.select(vec_col).first()[0])
        banded = v.select(
            id_col,
            vec_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            hyperplane_signature(vec_col, dim, n_planes, seed + 7919 * t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(id_col, vec_col, "tb.tbl", "tb.bucket").persist()
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), ["tbl", "bucket"])
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"x.{vec_col}").alias("va"),
                F.col(f"y.{id_col}").alias("id_b"),
                F.col(f"y.{vec_col}").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    dot = F.aggregate(
        F.zip_with(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        cand.withColumn("cosine", F.round(dot / (norm("va") * norm("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
