"""[EXT] Similarity search over embedding columns (SURVEY.md §2.11):
brute-force cosine top-k baseline + LSH-bucketed approximate variant.

All vector math is built-in higher-order functions over
ArrayType(FloatType) cast to double — `zip_with` dot products and
`aggregate` folds run JVM-side inside codegen; no Python UDFs.

Scale shape:
* brute force — queries broadcast against the corpus: per-partition
  narrow compute, a single top-k aggregation per query. Right answer for
  small query sets; O(|Q|·|C|) total work but no shuffle of the corpus.
* random-hyperplane LSH (`ann_lsh_topk`) — 16-bit signatures bucket the
  corpus; candidates only within matching buckets (optionally multi-probe
  by Hamming-1 neighbors). Turns O(|Q|·|C|) into O(|Q|·bucket) at a
  recall cost; the plan shuffles on (bucket) instead of broadcasting.
* IVF-style variant (`ivf_topk`) — coarse quantizer = per-label centroid
  (k-means stand-in); probe the nearest n_probe centroids' cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HYPERPLANE_BITS = 16
HP_PRIME = 1_000_003
HP_A, HP_B = 374_761, 98_491


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    """Attach the L2 norm (computed once per vector, reused by every
    pairwise computation)."""
    e = _as_double("embedding")
    return embeddings.withColumn("emb_d", e).withColumn(
        "norm", F.sqrt(_dot(F.col("emb_d"), F.col("emb_d")))
    )


def cosine_topk(
    embeddings: DataFrame, query_modulo: int = 100, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k: deterministic query subset (vec_id %
    query_modulo == 0) against the full corpus. Queries are the SMALL
    side -> broadcast; the corpus never shuffles for the join, and the
    only wide op is the per-query top-k (row_number over rounded
    similarity with vec_id tie-break — deterministic across engines)."""
    base = with_norm(embeddings)
    qs = base.select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    ).filter(F.col("q_id") % query_modulo == 0)
    cs = base.select("vec_id", "label", "emb_d", "norm")
    sim = (
        cs.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(
                _dot(F.col("emb_d"), F.col("q_emb"))
                / (F.col("norm") * F.col("q_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "rk", "vec_id", "label", "cosine")
    )


COSINE_TOPK_SQL = """
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
),
qs AS (
  SELECT vec_id AS q_id, e AS q_e, norm AS q_norm FROM base
  WHERE vec_id % 100 = 0
),
sim AS (
  SELECT q.q_id, c.vec_id, c.label,
         round(list_dot_product(c.e, q.q_e) / (c.norm * q.q_norm), 6) AS cosine
  FROM base c CROSS JOIN qs q
  WHERE c.vec_id <> q.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id) AS rk
  FROM sim
)
SELECT q_id, rk, vec_id, label, cosine FROM ranked WHERE rk <= 5
"""


def embedding_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label corpus stats: counts and exact (integer-scaled) norm
    aggregates — the sanity profile a pipeline runs before ANN tuning."""
    base = with_norm(embeddings)
    scaled = F.round(F.col("norm") * 1_000_000).cast("long")
    return (
        base.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum(scaled) / 1_000_000.0 / F.count(F.lit(1)), 6).alias(
                "avg_norm"
            ),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


EMBEDDING_STATS_SQL = """
WITH base AS (
  SELECT label,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
  round(SUM(CAST(round(norm * 1000000) AS BIGINT)) / 1000000.0 / COUNT(*), 6)
      AS avg_norm,
  round(MIN(norm), 6) AS min_norm,
  round(MAX(norm), 6) AS max_norm
FROM base GROUP BY label
"""


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """[EXT] Embedding-cosine near-duplicate pairs (the dedup-by-embedding
    entry in SURVEY.md §2.11): all (a, b) with a.vec_id < b.vec_id and
    round(cosine, 6) >= threshold.

    This is the EXACT O(n^2) form — right as the oracle-checkable
    baseline and for per-bucket use. At 100 TB you never run it on the
    full corpus: pre-bucket with the random-hyperplane signature
    (`_hyperplane_signature`, as in `ann_lsh_topk`) and run this exact
    pairing within buckets only, which is the same candidate-pair
    structure MinHash-LSH uses in operators/dedup.py."""
    base = with_norm(embeddings)
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("emb_d").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb_d").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


EMBEDDING_NEAR_DUP_SQL = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) AS cosine
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) >= 0.42
"""


def _hyperplane_signature(emb_d: Column) -> Column:
    """16-bit random-hyperplane signature without any stored planes:
    pseudo-random ±1 plane coefficients are derived per (bit, dim) from a
    deterministic integer hash, so the 'planes' exist only as arithmetic.
    sig bit j = [ sum_i sign_ij * v_i > 0 ]."""
    sig = None
    for j in range(HYPERPLANE_BITS):
        # coeff_ij = +1 if ((HP_A*(j*64+i)+HP_B) mod HP_PRIME) is even
        dot_j = F.aggregate(
            F.zip_with(
                emb_d,
                F.sequence(F.lit(0), F.size(emb_d) - 1),
                lambda v, i: F.when(
                    ((F.lit(HP_A) * (F.lit(j) * 64 + i) + HP_B) % HP_PRIME) % 2
                    == 0,
                    v,
                ).otherwise(-v),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot_j > 0, 2**j).otherwise(0)
        sig = term if sig is None else sig + term
    return sig.cast("long")


def ann_lsh_topk(
    embeddings: DataFrame, query_modulo: int = 100, k: int = 5
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join. Candidates
    are corpus vectors sharing the query's 16-bit signature bucket; exact
    cosine re-ranks within candidates. Trades recall for replacing the
    full scan with a bucket equi-join (shuffle on signature)."""
    base = with_norm(embeddings).withColumn(
        "sig", _hyperplane_signature(F.col("emb_d"))
    )
    qs = base.filter(F.col("vec_id") % query_modulo == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("sig").alias("q_sig"),
    )
    cand = base.join(
        F.broadcast(qs),
        (F.col("sig") == F.col("q_sig")) & (F.col("vec_id") != F.col("q_id")),
    )
    sim = cand.select(
        "q_id",
        "vec_id",
        "label",
        F.round(
            _dot(F.col("emb_d"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "rk", "vec_id", "label", "cosine")
    )


def ivf_topk(
    embeddings: DataFrame, query_modulo: int = 100, k: int = 5, n_probe: int = 2
) -> DataFrame:
    """IVF-style ANN: coarse cells = per-label mean vector (k-means
    stand-in, one pass), queries probe their n_probe nearest centroids,
    exact cosine within probed cells only. The centroid table is tiny ->
    broadcast; corpus is joined on its cell id (label) — at scale the
    corpus would be WRITTEN bucketed by cell so the probe join prunes
    files instead of shuffling."""
    base = with_norm(embeddings)
    # centroids: element-wise mean per label via posexplode + re-assemble
    exploded = base.select("label", F.posexplode("emb_d").alias("i", "v"))
    centroids = (
        exploded.groupBy("label", "i")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select(
            F.col("label").alias("cell"),
            F.transform("ic", lambda s: s["c"]).alias("centroid"),
        )
        .withColumn(
            "c_norm", F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
        )
    )
    qs = base.filter(F.col("vec_id") % query_modulo == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    # rank centroids per query, keep n_probe cells
    qc = (
        qs.crossJoin(F.broadcast(centroids))
        .withColumn(
            "c_sim",
            _dot(F.col("q_emb"), F.col("centroid"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
        .withColumn(
            "c_rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c_sim"), "cell")
            ),
        )
        .filter(F.col("c_rk") <= n_probe)
        .select("q_id", "q_emb", "q_norm", "cell")
    )
    cand = base.join(
        F.broadcast(qc),
        (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("q_id")),
    )
    sim = cand.select(
        "q_id",
        "vec_id",
        "label",
        F.round(
            _dot(F.col("emb_d"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "rk", "vec_id", "label", "cosine")
    )
