"""[EXT] Similarity search over embedding columns (SURVEY.md §2.11):
brute-force cosine top-k baseline, banded-LSH approximate variants, and
an IVF (k-means coarse-quantizer) variant.

Vector math on the exact paths is built-in higher-order functions over
ArrayType cast to double — `zip_with` dot products and `aggregate` folds
run JVM-side; no row-at-a-time Python anywhere. The LSH signatures are
dense linear algebra (128 plane dot products per vector), which
higher-order functions evaluate interpreted per element — so signatures
use an Arrow-batched vectorized pandas UDF (one numpy matmul per Arrow
batch), the sanctioned fast path. The plane matrix is derived
arithmetically from a fixed integer hash, so the IDENTICAL signature is
computable in DuckDB SQL: every approximate query here ships with a
full value oracle that replays the same algorithm (implementation
parity), plus a pytest recall floor against the exact baseline
(semantic quality) — an approximate operator is verified on both axes.

Scale shape:
* brute force (`cosine_topk`, `embedding_near_dup_exact`) — queries
  broadcast against the corpus / all-pairs within a bounded set. Exact;
  O(|Q|·|C|) or O(n²); the baselines the approximate paths are measured
  against, and the correct tool per-bucket or per-sample.
* banded LSH (`ann_lsh_topk`, `embedding_near_dup`) — per-row signature
  (narrow, vectorized), explode to (band, key), equi-join on the band
  key. Work scales with bucket collisions, not |Q|·|C|. NOTE: this
  corpus is isotropic (no cluster structure — near-dup pairs are the
  background-similarity tail), which is the worst case for LSH: measured
  candidate fraction is ~0.65 for 0.84 recall@5. On clustered production
  embeddings the same plan prunes far harder; the plan SHAPE (no
  cartesian, no broadcast-of-corpus) is what survives 100 TB.
* IVF / PQ / IVF∘PQ (`ivf_topk`, `pq_topk`, `ivf_pq_topk`) — the
  quantizers train on a BOUNDED deterministic sample (K_TRAIN rows,
  hash-order draw) with driver arithmetic that replays the engines'
  exact operations (in-order folds, integer-scaled centroid sums), so
  the SQL oracle's training CTEs produce bit-identical codebooks. The
  corpus side is ONE narrow scan: a vectorized encode UDF assigns the
  coarse cell and/or PQ codes per row against the broadcast codebooks,
  then a broadcast join against the tiny query/LUT frame and one top-k
  window. `build_ivf_index` persists the cell-partitioned layout so
  probes become file-pruned IO (dynamic partition pruning, pinned).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .artifacts import corpus_key as _corpus_key
from .hashing import sha_prefix_hash, sha_prefix_hash_sql

HP_PRIME = 1_000_003
HP_A, HP_B = 374_761, 98_491

ANN_BITS, ANN_BAND_BITS = 128, 16  # 8 bands of 16 bits
ND_BITS, ND_BAND_BITS = 32, 4  # 8 bands of 4 bits

IVF_CELLS, IVF_PROBE, IVF_ITERS = 16, 4, 2
IVF_SCALE = 1_000_000_000  # integer scaling for exact centroid sums

# Fixed-size deterministic query set for every top-k query here. The r2
# form drew queries as `vec_id % 100 == 0`, which grows LINEARLY with the
# corpus — so "top-k for sampled queries" was secretly O(N²/100) work and
# every ANN bench number scaled quadratically. A hash-ordered TakeOrdered
# draw (the `hash_sample_k` pattern, operators/curation.py) keeps |Q|
# constant at any corpus size, is engine-reproducible (sha2-prefix hash),
# and is stable under corpus growth ONLY in distribution (new docs can
# displace old draws — the property that matters is fixed |Q|, not a
# frozen id list).
QUERY_K = 20


def _query_ids(embeddings: DataFrame) -> DataFrame:
    """The QUERY_K vec_ids with the smallest (sha_prefix_hash, vec_id) —
    a deterministic pseudo-random draw. orderBy().limit() plans as
    TakeOrderedAndProject (per-partition top-k + driver merge of K-row
    partials), never a single-partition global sort."""
    h = sha_prefix_hash(F.col("vec_id").cast("string"))
    return (
        embeddings.select("vec_id", h.alias("_qh"))
        .orderBy("_qh", "vec_id")
        .limit(QUERY_K)
        .select("vec_id")
    )


_QIDS_CTE = f"""
qids AS (
  SELECT vec_id FROM base
  ORDER BY {sha_prefix_hash_sql('CAST(vec_id AS VARCHAR)')}, vec_id
  LIMIT {QUERY_K}
)"""

_QS_CTE = """
qs AS (
  SELECT b.vec_id AS q_id, b.e AS q_e, b.norm AS q_norm
  FROM base b JOIN qids USING (vec_id)
)"""

# Bounded deterministic TRAINING sample for the IVF/PQ quantizers: the
# first K_TRAIN rows of the same hash order (so queries = sample[:20]).
# r2 trained the quantizers with per-round Spark jobs over the corpus
# (IVF) / a modulus sample (PQ) — correct, but codebooks are statistics:
# a BOUNDED sample trains them just as well, collects to the driver in
# one job, and turns training into pure driver arithmetic that both
# engines replay exactly. This is how production ANN systems train
# (FAISS: sample -> train -> broadcast codebooks); at 100 TB the sample
# stays K_TRAIN rows while the corpus-side work remains one narrow scan.
K_TRAIN = 256

def _samp_cte(pred: str = "TRUE") -> str:
    """The bounded training-sample CTE; `pred` restricts the draw pool
    (the incremental-index oracle trains on the FIRST batch only)."""
    return f"""
samp AS (
  SELECT vec_id, e, norm FROM base WHERE {pred}
  ORDER BY {sha_prefix_hash_sql('CAST(vec_id AS VARCHAR)')}, vec_id
  LIMIT {K_TRAIN}
)"""


_SAMP_CTE = _samp_cte()


def _int_half_up(x: float) -> int:
    """Spark/DuckDB round(double) to integer: decimal HALF_UP (away from
    zero) on the exact binary expansion. Python's built-in round() is
    half-EVEN — never use it here."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _dot_py(a: list[float], b: list[float]) -> float:
    """The in-order left fold both engines use (`_dot` /
    list_dot_product) — bit-identical accumulation order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


_SAMPLE_MEMO: dict[tuple, list[tuple[int, list[float]]]] = {}
_TRAIN_MEMO: dict[tuple, object] = {}


def _collect_sample(embeddings: DataFrame) -> list[tuple[int, list[float]]]:
    """BOUNDED driver collect (≤ K_TRAIN rows) of the training sample,
    in hash order, memoized per corpus snapshot — the ANN family shares
    one sample job and one training pass per process. float32 -> Python
    float widening is exact, so driver arithmetic sees the identical
    doubles base's CAST produces."""
    key = _corpus_key(embeddings)
    if key is not None and key in _SAMPLE_MEMO:
        return _SAMPLE_MEMO[key]
    h = sha_prefix_hash(F.col("vec_id").cast("string"))
    rows = (
        embeddings.select("vec_id", "embedding", h.alias("_qh"))
        .orderBy("_qh", "vec_id")
        .limit(K_TRAIN)
        .collect()
    )
    sample = [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in rows]
    if key is not None:
        _SAMPLE_MEMO[key] = sample
    return sample


def _memo_train(kind: str, embeddings: DataFrame, sample: list, train_fn):
    """Memoize a deterministic training pass per CORPUS SNAPSHOT (the
    content key, not the sample ids — different corpora can share
    vec_ids and therefore sample-id tuples)."""
    ck = _corpus_key(embeddings)
    if ck is None:
        return train_fn(sample)
    key = (kind, ck)
    if key not in _TRAIN_MEMO:
        _TRAIN_MEMO[key] = train_fn(sample)
    return _TRAIN_MEMO[key]


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product. MEASURED AND REJECTED (r13): an
    unrolled 64-term element_at chain (same IEEE order, pure codegen
    arithmetic instead of the interpreted higher-order fold) was a wash
    on cosine_topk and ~1.7x SLOWER inside ivf_topk's giant
    CASE/size-guarded projection — the fold stays."""
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


# ---------------------------------------------------------------------------
# random-hyperplane band keys — the shared LSH signature
# ---------------------------------------------------------------------------


def _plane_matrix(nbits: int, dim: int) -> np.ndarray:
    """±1 plane coefficients derived per (bit, dim) from a fixed integer
    hash — the 'random' planes exist only as arithmetic, so DuckDB can
    rebuild them: coeff_ij = +1 iff ((A*(j*64+i)+B) mod P) is even."""
    j = np.arange(nbits)[:, None]
    i = np.arange(dim)[None, :]
    return np.where(((HP_A * (j * 64 + i) + HP_B) % HP_PRIME) % 2 == 0, 1.0, -1.0)


def _band_keys_udf(nbits: int, band_bits: int):
    """Arrow-batched signature: one numpy matmul per batch. Returns the
    array of band keys (MSB-first fold of each band's bits)."""

    n_bands = nbits // band_bits
    weights = 2 ** np.arange(band_bits - 1, -1, -1)

    @pandas_udf("array<long>")
    def keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        planes = _plane_matrix(nbits, x.shape[1])
        bits = (x @ planes.T > 0).astype(np.int64)
        ks = np.stack(
            [
                bits[:, b * band_bits : (b + 1) * band_bits] @ weights
                for b in range(n_bands)
            ],
            axis=1,
        )
        return pd.Series(list(ks))

    return keys


def _bit_sql(j: int) -> str:
    """DuckDB: sign bit j of the plane dot product (1-based list index)."""
    return (
        "CASE WHEN list_sum(list_transform(e, (v,i) -> CASE WHEN "
        f"(({HP_A}*({j}*64+(i-1))+{HP_B})%{HP_PRIME})%2=0 THEN v ELSE -v END)) > 0 "
        "THEN 1 ELSE 0 END"
    )


def _band_key_sql_cols(nbits: int, band_bits: int) -> list[str]:
    cols = []
    for b in range(nbits // band_bits):
        terms = " + ".join(
            f"({_bit_sql(b * band_bits + r)}) * {2 ** (band_bits - 1 - r)}"
            for r in range(band_bits)
        )
        cols.append(f"CAST({terms} AS BIGINT) AS k{b}")
    return cols


def _bands_cte(nbits: int, band_bits: int) -> str:
    """CTEs `sigs` + `bands` over a CTE `base(vec_id, e, norm)`."""
    n_bands = nbits // band_bits
    key_cols = ",\n    ".join(_band_key_sql_cols(nbits, band_bits))
    union = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, k{b} AS key FROM sigs"
        for b in range(n_bands)
    )
    return f"""
sigs AS (
  SELECT vec_id, {key_cols}
  FROM base
),
bands AS (
  {union}
)"""


def _with_bands(embeddings: DataFrame, nbits: int, band_bits: int) -> DataFrame:
    return with_norm(embeddings).withColumn(
        "bands", _band_keys_udf(nbits, band_bits)("embedding")
    )


_BASE_CTE = """
base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
)"""


# ---------------------------------------------------------------------------
# exact baselines
# ---------------------------------------------------------------------------


def cosine_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: the fixed QUERY_K-query deterministic
    draw (`_query_ids`) against the full corpus. Queries are the SMALL
    side -> broadcast; the corpus never shuffles for the join, and the
    only wide op is the per-query top-k (row_number over rounded
    similarity with vec_id tie-break — deterministic across engines)."""
    base = with_norm(embeddings)
    qs = base.join(F.broadcast(_query_ids(embeddings)), "vec_id").select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
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


COSINE_TOPK_SQL = f"""
WITH {_BASE_CTE},
{_QIDS_CTE},
{_QS_CTE},
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


def embedding_near_dup_exact(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """Exact O(n²) near-duplicate pairs: all (a, b) with a.vec_id <
    b.vec_id and round(cosine, 6) >= threshold. The oracle baseline the
    LSH path is recall-measured against, and the right tool WITHIN a
    bucket/sample — never on a 100 TB corpus."""
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


EMBEDDING_NEAR_DUP_EXACT_SQL = """
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


# ---------------------------------------------------------------------------
# banded-LSH production paths
# ---------------------------------------------------------------------------


def _pair_cosine_udf():
    """Arrow-batched exact cosine over candidate PAIRS: one numpy pass
    per batch with elementwise in-order folds (`_fold_mul_sum`) — bit-
    identical to the engines' fold, ~10x the interpreted higher-order
    expression on 64-dim arrays. Norms are re-derived inside the batch
    (same fold), so callers pass the raw float arrays."""

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        na = np.sqrt(_fold_mul_sum(A, A))
        nb = np.sqrt(_fold_mul_sum(B, B))
        return pd.Series(_fold_mul_sum(A, B) / (na * nb))

    return cos


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """[EXT] Embedding-cosine near-duplicate pairs, banded-LSH form: the
    registered production path. Candidate pairs share at least one of 8
    4-bit signature bands (equi-join on (band, key) — no cartesian, no
    broadcast of the corpus); exact cosine (vectorized pair UDF)
    verifies candidates only.

    Approximate by construction (recall vs the exact baseline is pinned
    ≥0.85 in tests on this corpus); deterministic, and the oracle
    replays the identical algorithm in SQL."""
    base = _with_bands(embeddings, ND_BITS, ND_BAND_BITS).persist()
    bands = base.select(
        "vec_id", F.posexplode("bands").alias("band", "key")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
        .distinct()
    )
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a")
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b")
    )
    cosf = _pair_cosine_udf()
    cos = F.round(cosf(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH {_BASE_CTE},
{_bands_cte(ND_BITS, ND_BAND_BITS)},
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) AS cosine
FROM cand c
JOIN base a ON a.vec_id = c.id_a
JOIN base b ON b.vec_id = c.id_b
WHERE round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) >= 0.42
"""


def ann_lsh_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: banded random-hyperplane LSH. Candidates are
    corpus vectors sharing ANY of 8 16-bit signature bands with the
    query (the round-1 single-table 16-bit form had ~0.2 recall on this
    isotropic corpus; banding a 128-bit signature measures 0.84+);
    exact cosine re-ranks candidates. Oracle = same algorithm in SQL;
    recall floor vs cosine_topk pinned in tests."""
    base = _with_bands(embeddings, ANN_BITS, ANN_BAND_BITS).persist()
    qs = base.join(F.broadcast(_query_ids(embeddings)), "vec_id").select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bands").alias("q_bands"),
    )
    corpus_bands = base.select(
        "vec_id", F.posexplode("bands").alias("band", "key")
    )
    q_bands = qs.select(
        "q_id", F.posexplode("q_bands").alias("band", "key")
    )
    cand = (
        corpus_bands.join(
            F.broadcast(q_bands),
            ["band", "key"],
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    sim = (
        cand.join(base.select("vec_id", "label", "emb_d", "norm"), "vec_id")
        .join(F.broadcast(qs.select("q_id", "q_emb", "q_norm")), "q_id")
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


ANN_LSH_TOPK_SQL = f"""
WITH {_BASE_CTE},
{_bands_cte(ANN_BITS, ANN_BAND_BITS)},
{_QIDS_CTE},
{_QS_CTE},
qbands AS (
  SELECT q.q_id, b.band, b.key FROM qs q JOIN bands b ON b.vec_id = q.q_id
),
cand AS (
  SELECT DISTINCT qb.q_id, cb.vec_id
  FROM bands cb JOIN qbands qb ON cb.band = qb.band AND cb.key = qb.key
  WHERE cb.vec_id <> qb.q_id
),
sim AS (
  SELECT c.q_id, c.vec_id, b.label,
         round(list_dot_product(b.e, q.q_e) / (b.norm * q.q_norm), 6) AS cosine
  FROM cand c
  JOIN base b ON b.vec_id = c.vec_id
  JOIN qs q ON q.q_id = c.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id) AS rk
  FROM sim
)
SELECT q_id, rk, vec_id, label, cosine FROM ranked WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# IVF: deterministic k-means coarse quantizer + cell probing
# ---------------------------------------------------------------------------


def _sample_matrices(
    sample: list[tuple[int, list[float]]], scale: int
) -> tuple[list[int], np.ndarray, np.ndarray]:
    """(ids, X, IX): the sample as a float64 matrix plus its exact
    integer-scaled image (decimal-half-up per element, the engines'
    round(v * scale) AS BIGINT) for order-independent centroid sums."""
    ids = [vid for vid, _v in sample]
    X = np.stack([np.asarray(v, dtype=np.float64) for _vid, v in sample])
    IX = np.array(
        [[_int_half_up(float(x) * scale) for x in row] for row in X],
        dtype=np.int64,
    )
    return ids, X, IX


def _train_ivf_py(
    sample: list[tuple[int, list[float]]],
) -> list[tuple[int, list[float], float]]:
    """Deterministic coarse quantizer trained on the bounded sample:
    IVF_CELLS k-means cells seeded from the sample's lowest vec_ids, two
    Lloyd rounds. Driver arithmetic replays the engines' exact
    operations — `_fold_mul_sum` in-order dots, integer-scaled centroid
    sums — so the SQL oracle's training CTEs produce bit-identical
    centroids. Centroid lists stay cell-sorted, so numpy's
    first-occurrence argmax equals MAX(struct(sim, -cell)). Returns
    (cell, ce, c_norm) rows sorted by cell id."""
    ids, X, IX = _sample_matrices(sample, IVF_SCALE)
    norms = np.sqrt(_fold_mul_sum(X, X))
    order = sorted(range(len(ids)), key=lambda i: ids[i])[:IVF_CELLS]
    cents = [
        (ids[i], [float(x) for x in X[i]], float(norms[i])) for i in order
    ]
    for _ in range(IVF_ITERS):
        C = np.stack([np.asarray(ce) for _c, ce, _n in cents])
        cn = np.asarray([n for _c, _ce, n in cents])
        sims = _fold_mul_sum(X[:, None, :], C[None, :, :]) / (
            norms[:, None] * cn[None, :]
        )
        assign = np.argmax(sims, axis=1)
        new = []
        for ci in sorted(set(assign.tolist())):
            mask = assign == ci
            s = IX[mask].sum(axis=0)
            n = int(mask.sum())
            ce = [(int(si) / IVF_SCALE) / n for si in s]
            new.append((cents[ci][0], ce, math.sqrt(_dot_py(ce, ce))))
        cents = new
    return cents


def _fold_mul_sum(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """In-order fold of sum(a*b) over the LAST axis, vectorized over the
    leading axes: each scalar sees the identical IEEE operation sequence
    as the engines' fold (`_dot` / list_dot_product / `_dot_py`), so the
    results are bit-identical — verified empirically against DuckDB."""
    z = a * b
    acc = z[..., 0].copy()
    for j in range(1, z.shape[-1]):
        acc = acc + z[..., j]
    return acc


def _encode_udf(
    cents: list[tuple[int, list[float], float]] | None,
    books: dict[int, list[tuple[int, list[float], float]]] | None,
):
    """Arrow-batched IVF/PQ encoder: one numpy pass per batch computes
    the coarse cell (argmax cosine, ties -> smallest cell id) and/or the
    PQ_M dense codes (argmin d2, ties -> smallest cell id), against
    driver-trained codebooks captured in the closure. This is the
    module's sanctioned vectorized-UDF seam (like the LSH signatures):
    dense linear algebra over hundreds of centroids per row is numpy
    work, not interpreted higher-order functions — and all folds are
    elementwise in-order (`_fold_mul_sum`), so every double matches the
    engines bit-for-bit. Tie-breaks: codebooks are cell-sorted, and
    numpy arg{max,min} return the FIRST extremum = the smallest cell.

    Corpus-side cost is one narrow scan; codebooks ride the closure
    (broadcast with the task), nothing shuffles."""
    if cents is not None:
        cell_ids = np.asarray([c for c, _e, _n in cents], dtype=np.int64)
        C = np.stack([np.asarray(ce, dtype=np.float64) for _c, ce, _n in cents])
        c_norms = np.asarray([cn for _c, _e, cn in cents], dtype=np.float64)
    if books is not None:
        B = {
            m: (
                np.stack(
                    [np.asarray(ce, dtype=np.float64) for _c, ce, _cc in books[m]]
                ),
                np.asarray([cc for _c, _ce, cc in books[m]], dtype=np.float64),
            )
            for m in books
        }
    fields = ([] if cents is None else ["cell long"]) + (
        [] if books is None else ["cs array<int>"]
    )

    @pandas_udf(", ".join(fields))
    def enc(emb: pd.Series) -> pd.DataFrame:
        out = {}
        if len(emb) == 0:
            if cents is not None:
                out["cell"] = pd.Series([], dtype="int64")
            if books is not None:
                out["cs"] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        if cents is not None:
            norms = np.sqrt(_fold_mul_sum(X, X))
            sims = _fold_mul_sum(X[:, None, :], C[None, :, :]) / (
                norms[:, None] * c_norms[None, :]
            )
            out["cell"] = pd.Series(cell_ids[np.argmax(sims, axis=1)])
        if books is not None:
            codes = np.empty((X.shape[0], PQ_M), dtype=np.int32)
            for m in range(PQ_M):
                Xm = X[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                Cm, ccm = B[m]
                xx = _fold_mul_sum(Xm, Xm)
                xc = _fold_mul_sum(Xm[:, None, :], Cm[None, :, :])
                d2 = xx[:, None] - 2 * xc + ccm[None, :]
                codes[:, m] = np.argmin(d2, axis=1)
            out["cs"] = pd.Series(list(codes))
        return pd.DataFrame(out)

    # asNondeterministic stops the optimizer DUPLICATING this expensive
    # per-corpus encode (guide §4.4): the probed-cell join's implied
    # isnotnull(cell) pushdown split it into TWO full ArrowEvalPython
    # passes over the corpus (one for the filter, one for the code
    # projection — see plans/r13/ivf_pq_topk_before.txt nodes 3+6). The
    # function is pure, so results are unchanged; it just runs once.
    return enc.asNondeterministic()


def _probe_py(
    cents: list[tuple[int, list[float], float]],
    queries: list[tuple[int, list[float]]],
    n_probe: int,
) -> dict[int, list[int]]:
    """Per query: its n_probe nearest cells (sim DESC, cell ASC) — the
    driver replay of the row_number probe ranking."""
    out: dict[int, list[int]] = {}
    for q_id, q in queries:
        qn = math.sqrt(_dot_py(q, q))
        scored = sorted(
            (-(_dot_py(q, ce) / (qn * cn)), cell) for cell, ce, cn in cents
        )[:n_probe]
        out[q_id] = [cell for _nsim, cell in scored]
    return out


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF-style ANN: a bounded-sample-trained coarse quantizer
    (`_train_ivf_py`), queries probe their n_probe nearest cells, exact
    cosine re-ranks within probed cells only. Fully deterministic -> the
    oracle replays the training and probing in SQL; recall floor vs
    cosine_topk pinned in tests.

    The corpus-side plan is ONE narrow scan: per-row cell assignment
    (vectorized encode UDF against the broadcast codebook), a broadcast
    HASH join on `cell` against the 80-row (query × probed-cell) frame,
    cosine, top-k window — a single exchange (the window) end to end.
    At 100 TB: write the corpus bucketed by cell (`build_ivf_index`) so
    probes prune files too."""
    sample = _collect_sample(embeddings)
    queries = sample[:QUERY_K]
    cents = _memo_train("ivf", embeddings, sample, _train_ivf_py)
    probes = _probe_py(cents, queries, n_probe)
    # the query side enters as ONE tiny serialized frame (a row per
    # (query, probed cell)) — a per-element literal tree costs seconds
    # of py4j round trips; createDataFrame is one round trip
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [
            (q_id, int(cell), list(qv), math.sqrt(_dot_py(qv, qv)))
            for q_id, qv in queries
            for cell in probes[q_id]
        ],
        schema="q_id long, cell long, q_e array<double>, q_norm double",
    )
    enc = _encode_udf(cents, None)
    # keep the Python boundary NARROW (guide §4.1): enc sees only the
    # raw embedding — emb_d/norm are derived AFTER the probed-cell join,
    # for surviving candidates only. The nondeterministic encode pins
    # operator placement, so the projection order here IS the plan: with
    # emb_d in the pre-encode frame, 512 B/row of derived doubles would
    # ride through the Arrow round trip as passthrough columns.
    sim = (
        embeddings.select(
            "vec_id", "label", "embedding",
            enc("embedding")["cell"].alias("cell"),
        )
        .join(F.broadcast(qdf), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("emb_d", _as_double("embedding"))
        .withColumn("norm", F.sqrt(_dot(F.col("emb_d"), F.col("emb_d"))))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(
                _dot(F.col("emb_d"), F.col("q_e"))
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


_IVF_ASSIGN_TPL = """
  SELECT vec_id, -((MAX(struct_pack(
           sim := list_dot_product(b.e, c.ce) / (b.norm * c.c_norm),
           nc := -c.cell))).nc) AS cell
  FROM {src} b CROSS JOIN {cents} c
  GROUP BY vec_id"""

_IVF_CENT_TPL = f"""
  SELECT cell, list(c ORDER BY i) AS ce,
         sqrt(list_dot_product(list(c ORDER BY i), list(c ORDER BY i))) AS c_norm
  FROM (
    SELECT cell, i,
           CAST(SUM(CAST(round(v * {IVF_SCALE}) AS BIGINT)) AS BIGINT)
             / {IVF_SCALE}.0 / COUNT(*) AS c
    FROM (
      SELECT a.cell, unnest(generate_series(1, len(b.e))) AS i, unnest(b.e) AS v
      FROM {{assign}} a JOIN samp b USING (vec_id)
    )
    GROUP BY cell, i
  )
  GROUP BY cell"""

# the coarse-quantizer training chain over the bounded sample: seeds ->
# 2 Lloyd rounds -> final FULL-CORPUS cell assignment (afinal)
_IVF_TRAIN_CTES = f"""
seeds AS (
  SELECT vec_id AS cell, e AS ce, norm AS c_norm
  FROM samp ORDER BY vec_id LIMIT {IVF_CELLS}
),
a0 AS ({_IVF_ASSIGN_TPL.format(src='samp', cents='seeds')}),
c1 AS ({_IVF_CENT_TPL.format(assign='a0')}),
a1 AS ({_IVF_ASSIGN_TPL.format(src='samp', cents='c1')}),
c2 AS ({_IVF_CENT_TPL.format(assign='a1')}),
afinal AS ({_IVF_ASSIGN_TPL.format(src='base', cents='c2')})"""

# nearest-n_probe cells per query, from the final centroids `c2`
_IVF_PROBE_CTE = f"""
probe AS (
  SELECT q_id, q_e, q_norm, cell FROM (
    SELECT q.q_id, q.q_e, q.q_norm, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_dot_product(q.q_e, c.ce) / (q.q_norm * c.c_norm)
               DESC, c.cell) AS c_rk
    FROM qs q CROSS JOIN c2 c
  ) WHERE c_rk <= {IVF_PROBE}
)"""


def _ivf_sql() -> str:
    return f"""
WITH {_BASE_CTE},
{_SAMP_CTE},
{_IVF_TRAIN_CTES},
{_QIDS_CTE},
{_QS_CTE},
{_IVF_PROBE_CTE},
cand AS (
  SELECT p.q_id, p.q_e, p.q_norm, a.vec_id
  FROM afinal a JOIN probe p USING (cell)
  WHERE a.vec_id <> p.q_id
),
sim AS (
  SELECT c.q_id, c.vec_id, b.label,
         round(list_dot_product(b.e, c.q_e) / (b.norm * c.q_norm), 6) AS cosine
  FROM cand c JOIN base b ON b.vec_id = c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id) AS rk
  FROM sim
)
SELECT q_id, rk, vec_id, label, cosine FROM ranked WHERE rk <= 5
"""


IVF_TOPK_SQL = _ivf_sql()


# ---------------------------------------------------------------------------
# int8 quantization — the storage-shrink step of an embedding pipeline
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127


def embedding_quantize(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q_i = round(x_i / scale). Emits the per-vector scale, a checksum of
    the quantized codes, and the integer-exact reconstruction-error sum
    — the audit row a pipeline stores next to the quantized shard.
    Entirely per-row array math (narrow at any scale)."""
    e = _as_double("embedding")
    absmax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = absmax / QUANT_LEVELS
    q = F.transform(e, lambda x: F.round(x / scale).cast("int"))
    # reconstruction error, integer-scaled (1e9) for exact cross-engine sums
    err = F.aggregate(
        F.zip_with(e, q, lambda x, qi: F.round((x - qi * scale) * 1e9).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.abs(x),
    )
    return embeddings.select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        (err / F.lit(1e9)).alias("_abs_err"),
    ).select(
        "vec_id",
        "scale",
        "q_sum",
        "q_l1",
        F.round("_abs_err", 6).alias("abs_err"),
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
scaled AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / {QUANT_LEVELS} AS scale
  FROM base
),
q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(round(x / scale) AS INT)) AS qv
  FROM scaled
)
SELECT vec_id,
  round(scale, 9) AS scale,
  CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT))) AS BIGINT) AS q_sum,
  CAST(list_sum(list_transform(qv, x -> CAST(abs(x) AS BIGINT))) AS BIGINT) AS q_l1,
  round(CAST(list_sum(
      list_transform(list_zip(e, qv),
        p -> CAST(abs(CAST(round((p[1] - p[2] * scale) * 1000000000) AS BIGINT)) AS BIGINT))
    ) AS BIGINT) / 1000000000.0, 6) AS abs_err
FROM q
"""


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid of the embedding space — the per-class mean
    vector used for nearest-centroid classification and cluster QA.
    Exact cross-engine arithmetic: components are scaled to integer
    micro-units and summed as int64 (order-independent), divided once at
    the end — the same _scaled discipline as every SUM in the engine.

    Plan: posexplode (narrow: one row per (vector, dim)) -> single agg
    keyed by (label, pos). At 100 TB the shuffle carries one partial sum
    per (label, dim) per task — mergeable and tiny — NOT the vectors.
    """
    flat = embeddings.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return (
        flat.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # floor(x + 0.5), not round(): a dyadic float (m/2^k) puts
            # v*1e6 exactly on .5, where Spark rounds HALF_UP and DuckDB
            # half-even — floor(x+0.5) is the same half-up in both
            F.sum(
                F.floor(F.col("v").cast("double") * 1_000_000 + 0.5).cast("long")
            ).alias("s"),
        )
        .select(
            "label",
            "pos",
            "n",
            # exact integer micro-units (floor of the rational mean):
            # round(x, 6) differs between engines by one ulp at half
            # boundaries; floor(s/n) cannot — a non-integer rational
            # with n this small sits >= 1e-6 from any integer, far
            # beyond double rounding error
            F.floor(F.col("s") / F.col("n")).cast("long").alias(
                "centroid_micros"
            ),
        )
    )


LABEL_CENTROIDS_SQL = """
WITH flat AS (
  SELECT label,
    unnest(generate_series(0, len(embedding) - 1)) AS pos,
    unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
)
SELECT label, pos, COUNT(*) AS n,
  CAST(floor(SUM(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) / (COUNT(*) * 1.0))
    AS BIGINT) AS centroid_micros
FROM flat
GROUP BY label, pos
"""


# ---------------------------------------------------------------------------
# PQ: product quantization + asymmetric-distance (ADC) top-k — the
# memory-bound scale path (a 64-dim float vector becomes M=4 byte codes)
# ---------------------------------------------------------------------------

PQ_M, PQ_K, PQ_ITERS = 16, 16, 2
PQ_SUBDIM = 4  # 64 / PQ_M
PQ_SCALE = 1_000_000_000


def _pq_d2_py(x: list[float], c: list[float], cc: float) -> float:
    """The engines' squared-L2 identity xx - 2xc + cc — identical
    operation order, so identical doubles (no rounding needed: all
    three implementations fold in order)."""
    return _dot_py(x, x) - 2 * _dot_py(x, c) + cc


def _train_pq_py(
    sample: list[tuple[int, list[float]]],
) -> dict[int, list[tuple[int, list[float], float]]]:
    """Deterministic PQ codebooks trained on the bounded sample: per
    subspace, PQ_K k-means codes seeded from the sample's lowest
    vec_ids' sub-vectors, 2 Lloyd rounds with integer-scaled exact
    centroid sums — the same engine-exact arithmetic as `_train_ivf_py`,
    replayed verbatim by the oracle's training CTEs. Returns per-m
    codebooks sorted by cell id (so list position IS the dense code)."""
    ids, X, IX = _sample_matrices(sample, PQ_SCALE)
    seed_idx = sorted(range(len(ids)), key=lambda i: ids[i])[:PQ_K]
    books: dict[int, list[tuple[int, list[float], float]]] = {}
    for m in range(PQ_M):
        Xm = X[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        IXm = IX[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        xx = _fold_mul_sum(Xm, Xm)
        cents = [
            (ids[i], [float(x) for x in Xm[i]], float(xx[i]))
            for i in seed_idx
        ]
        for _ in range(PQ_ITERS):
            C = np.stack([np.asarray(ce) for _c, ce, _cc in cents])
            cc = np.asarray([c for _c, _ce, c in cents])
            xc = _fold_mul_sum(Xm[:, None, :], C[None, :, :])
            # ((xx - 2xc) + cc): the engines' d2 identity, elementwise —
            # cents stay cell-sorted so first-occurrence argmin equals
            # MIN(struct(d2, cell))
            d2 = xx[:, None] - 2 * xc + cc[None, :]
            assign = np.argmin(d2, axis=1)
            new = []
            for ci in sorted(set(assign.tolist())):
                mask = assign == ci
                s = IXm[mask].sum(axis=0)
                n = int(mask.sum())
                ce = [(int(si) / PQ_SCALE) / n for si in s]
                new.append((cents[ci][0], ce, _dot_py(ce, ce)))
            cents = new
        books[m] = cents
    return books


def _lut_py(
    books: dict[int, list[tuple[int, list[float], float]]],
    queries: list[tuple[int, list[float]]],
) -> dict[int, list[list[int]]]:
    """Per query: la[m][dcode] = CAST(round(d2 * PQ_SCALE) AS BIGINT) —
    the ADC lookup table, computed on the driver with the identical
    arithmetic the oracle's lut CTE runs."""
    out: dict[int, list[list[int]]] = {}
    for q_id, q in queries:
        la = []
        for m in range(PQ_M):
            qv = q[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            la.append(
                [
                    _int_half_up(_pq_d2_py(qv, ce, cc) * PQ_SCALE)
                    for _cell, ce, cc in books[m]
                ]
            )
        out[q_id] = la
    return out


def _adc_expr() -> Column:
    """sum_m la[m][cs[m]] as PQ_M constant-index element_at terms —
    plain scalar expressions in WholeStageCodegen, O(1) per lookup."""
    adc_l = None
    for m in range(PQ_M):
        term = F.element_at(
            F.element_at(F.col("la"), m + 1),
            (F.element_at(F.col("cs"), m + 1) + 1).cast("int"),
        )
        adc_l = term if adc_l is None else adc_l + term
    return adc_l


def pq_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Product-quantization ANN, FLAT-ADC form: each 64-dim vector is
    encoded as PQ_M codebook ids (`_train_pq_py` codebooks, per-row
    argmin); queries stay exact and rank the WHOLE corpus by the ADC
    approximation sum_m ||q_m - c[m][code_m]||^2 via per-row
    lookup-table math against the 20-entry literal query array.

    Flat ADC scores every (query, vector) pair — kept as the small-scale
    oracle baseline for the scale path `ivf_pq_topk`, which prunes the
    candidate set to the probed IVF cells before applying the same LUT.

    The memory story is the point of PQ: the corpus resides as PQ_M
    small ints per vector (16x smaller than float32); the plan is one
    narrow scan (encode) -> intentional broadcast nested-loop against
    the 20-row query/LUT frame -> top-k window — a single exchange.
    Fully deterministic -> full SQL oracle; recall floor vs cosine_topk
    pinned in tests.
    """
    sample = _collect_sample(embeddings)
    queries = sample[:QUERY_K]
    books = _memo_train("pq", embeddings, sample, _train_pq_py)
    luts = _lut_py(books, queries)
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [(q_id, luts[q_id]) for q_id, _q in queries],
        schema="q_id long, la array<array<bigint>>",
    )
    enc = _encode_udf(None, books)
    adc = (
        embeddings.select(
            "vec_id", "label", enc("embedding")["cs"].alias("cs")
        )
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "label", _adc_expr().alias("adc_l"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_l", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            "rk",
            "vec_id",
            "label",
            F.round(F.col("adc_l") / PQ_SCALE, 6).alias("adc_d2"),
        )
    )


_PQ_SUB_CTE = f"""
sub AS (
  SELECT vec_id, m, e[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
)"""

_PQ_D2 = (
    "(list_dot_product({x}, {x}) - 2 * list_dot_product({x}, {c}) + {cc})"
)

_PQ_ASSIGN_TPL = f"""
  SELECT vec_id, m, (MIN(struct_pack(
           d2 := {_PQ_D2.format(x='s.sv', c='c.ce', cc='c.cc')},
           cell := c.cell))).cell AS code
  FROM {{src}} s JOIN {{cents}} c USING (m)
  GROUP BY vec_id, m"""

_PQ_CENT_TPL = f"""
  SELECT m, cell, list(c ORDER BY i) AS ce,
         list_dot_product(list(c ORDER BY i), list(c ORDER BY i)) AS cc
  FROM (
    SELECT m, cell, i,
           CAST(SUM(CAST(round(v * {PQ_SCALE}) AS BIGINT)) AS BIGINT)
             / {PQ_SCALE}.0 / COUNT(*) AS c
    FROM (
      SELECT s.m, a.code AS cell,
             unnest(generate_series(1, len(s.sv))) AS i, unnest(s.sv) AS v
      FROM subt s JOIN {{assign}} a ON s.vec_id = a.vec_id AND s.m = a.m
    )
    GROUP BY m, cell, i
  )
  GROUP BY m, cell"""

# the PQ codebook training chain (over the bounded sample) + the
# full-corpus encode (CTE names are p-prefixed so the chain composes
# with the IVF chain in _ivf_pq_sql)
_PQ_TRAIN_CTES = f"""
subt AS (
  SELECT s.vec_id, s.m, s.sv FROM sub s JOIN samp p ON p.vec_id = s.vec_id
),
pseeds AS (
  SELECT m, vec_id AS cell, sv AS ce, list_dot_product(sv, sv) AS cc
  FROM subt WHERE vec_id IN (
    SELECT vec_id FROM samp ORDER BY vec_id LIMIT {PQ_K})
),
pa0 AS ({_PQ_ASSIGN_TPL.format(src='subt', cents='pseeds')}),
pc1 AS ({_PQ_CENT_TPL.format(assign='pa0')}),
pa1 AS ({_PQ_ASSIGN_TPL.format(src='subt', cents='pc1')}),
pc2 AS ({_PQ_CENT_TPL.format(assign='pa1')}),
codes AS ({_PQ_ASSIGN_TPL.format(src='sub', cents='pc2')})"""

# per-query ADC lookup table against the final codebooks `pc2`
_PQ_QSUB_LUT_CTES = f"""
qsub AS (
  SELECT s.vec_id AS q_id, s.m, s.sv AS qv
  FROM sub s JOIN qids ON qids.vec_id = s.vec_id
),
lut AS (
  SELECT q.q_id, q.m, c.cell AS code,
         CAST(round({_PQ_D2.format(x='q.qv', c='c.ce', cc='c.cc')} * {PQ_SCALE})
              AS BIGINT) AS dl
  FROM qsub q JOIN pc2 c USING (m)
)"""


def _pq_sql() -> str:
    return f"""
WITH {_BASE_CTE},
{_SAMP_CTE},
{_PQ_SUB_CTE},
{_PQ_TRAIN_CTES},
{_QIDS_CTE},
{_PQ_QSUB_LUT_CTES},
adc AS (
  SELECT l.q_id, k.vec_id, CAST(SUM(l.dl) AS BIGINT) AS adc_l
  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
  WHERE k.vec_id <> l.q_id
  GROUP BY l.q_id, k.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_l, vec_id) AS rk
  FROM adc
)
SELECT r.q_id, r.rk, r.vec_id, b.label,
       round(r.adc_l / {PQ_SCALE}.0, 6) AS adc_d2
FROM ranked r JOIN base b USING (vec_id)
WHERE r.rk <= 5
"""


PQ_TOPK_SQL = _pq_sql()


def build_ivf_index(embeddings: DataFrame, index_path: str) -> None:
    """Materialize the IVF index: the 16-row codebook as one parquet
    artifact, and the corpus (vector + norm + label) PARTITIONED BY
    CELL — `cell=N/` directories, so a probe reads only its cells'
    files. This is the build-once-probe-many lifecycle the inline
    `ivf_topk` docstring promises at scale: index build is one training
    pass + one partitioned write; every later query is file-pruned IO."""
    import os

    base = with_norm(embeddings)
    cents = _memo_train("ivf", embeddings, _collect_sample(embeddings), _train_ivf_py)
    spark = embeddings.sparkSession
    spark.createDataFrame(
        cents, schema="cell long, ce array<double>, c_norm double"
    ).write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))
    (
        base.select("vec_id", "label", "embedding", "emb_d", "norm")
        .withColumn("cell", _encode_udf(cents, None)("embedding")["cell"])
        .drop("embedding")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(index_path, "corpus"))
    )


def ivf_index_probe(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """Probe the persisted index: nearest n_probe cells per query from
    the broadcast codebook, then an equi-join on the PARTITION column
    `cell` — Spark's dynamic partition pruning turns the broadcast
    probe set into a file-level filter, so only probed `cell=N/`
    directories are read. Exact cosine rerank within candidates,
    identical expressions (and therefore identical results) to the
    inline `ivf_topk`."""
    import os

    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    corpus = spark.read.parquet(os.path.join(index_path, "corpus"))
    c_sim = _dot(F.col("q_emb"), F.col("ce")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    probe = (
        queries.crossJoin(F.broadcast(cents))
        .select("q_id", "q_emb", "q_norm", "cell", c_sim.alias("c_sim"))
        .withColumn(
            "c_rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c_sim"), "cell")
            ),
        )
        .filter(F.col("c_rk") <= n_probe)
        .select("q_id", "q_emb", "q_norm", "cell")
    )
    sim = corpus.join(F.broadcast(probe), "cell").filter(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        "label",
        F.round(
            _dot(F.col("emb_d"), F.col("q_emb"))
            / (F.col("norm") * F.col("q_norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "rk", "vec_id", "label", "cosine")
    )


def ivf_index_roundtrip_query(
    spark: SparkSession, embeddings: DataFrame
) -> DataFrame:
    """Build the index, then answer through it — output is identical to
    `ivf_topk`, so the same SQL oracle checks the whole persisted
    lifecycle (a drift in the write/read path breaks parity)."""
    from .artifacts import materialize_dir

    index_path = materialize_dir(
        embeddings, "ivf_index", lambda p: build_ivf_index(embeddings, p)
    )
    qs = (
        with_norm(embeddings)
        .join(F.broadcast(_query_ids(embeddings)), "vec_id")
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb_d").alias("q_emb"),
            F.col("norm").alias("q_norm"),
        )
    )
    return ivf_index_probe(spark, index_path, qs)


def build_ivf_pq_index(embeddings: DataFrame, index_path: str) -> None:
    """Materialize the IVF∘PQ index: the coarse centroids and the
    per-subspace PQ codebooks as two small parquet artifacts, and the
    corpus as (vec_id, label, cs) PARTITIONED BY CELL. The codes table
    is ~16x smaller than the raw vectors, so a probe at 100 TB is
    file-pruned IO over the CODE table only — the memory-bound regime's
    build-once-probe-many artifact (FAISS's IVFPQ on-disk layout,
    re-expressed as a partitioned parquet table)."""
    import os

    sample = _collect_sample(embeddings)
    cents = _memo_train("ivf", embeddings, sample, _train_ivf_py)
    books = _memo_train("pq", embeddings, sample, _train_pq_py)
    spark = embeddings.sparkSession
    spark.createDataFrame(
        cents, schema="cell long, ce array<double>, c_norm double"
    ).write.mode("overwrite").parquet(os.path.join(index_path, "coarse"))
    spark.createDataFrame(
        [
            (m, cell, ce, cc)
            for m, book in books.items()
            for cell, ce, cc in book
        ],
        schema="m int, cell long, ce array<double>, cc double",
    ).write.mode("overwrite").parquet(os.path.join(index_path, "books"))
    enc = _encode_udf(cents, books)
    (
        embeddings.select("vec_id", "label", enc("embedding").alias("e"))
        .select(
            "vec_id",
            "label",
            F.col("e.cell").alias("cell"),
            F.col("e.cs").alias("cs"),
        )
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(index_path, "codes"))
    )


def ivf_pq_index_probe(
    spark: SparkSession,
    index_path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """Probe the persisted IVF∘PQ index. Codebooks are BOUNDED reads
    (16 + ≤256 rows; doubles round-trip parquet exactly, so the driver
    probe/LUT arithmetic is bit-identical to the inline path); the
    corpus side reads ONLY the probed `cell=N/` code directories —
    dynamic partition pruning turns the broadcast query frame into a
    file-level filter, and no embedding arrays are read at all."""
    import os

    coarse = sorted(
        (r["cell"], list(r["ce"]), r["c_norm"])
        for r in spark.read.parquet(os.path.join(index_path, "coarse")).collect()
    )
    books: dict[int, list[tuple[int, list[float], float]]] = {}
    for r in sorted(
        spark.read.parquet(os.path.join(index_path, "books")).collect(),
        key=lambda r: (r["m"], r["cell"]),
    ):
        books.setdefault(r["m"], []).append((r["cell"], list(r["ce"]), r["cc"]))
    probes = _probe_py(coarse, queries, n_probe)
    luts = _lut_py(books, queries)
    qdf = spark.createDataFrame(
        [
            (q_id, int(cell), luts[q_id])
            for q_id, _q in queries
            for cell in probes[q_id]
        ],
        schema="q_id long, cell long, la array<array<bigint>>",
    )
    # the union of probed cells is known on the driver, so the pruning
    # is STATIC: an isin on the partition column lands in the scan's
    # PartitionFilters and only probed cell=N/ directories are listed —
    # stronger than dynamic pruning (no runtime subquery needed)
    all_cells = sorted({c for cells in probes.values() for c in cells})
    codes = spark.read.parquet(os.path.join(index_path, "codes")).filter(
        F.col("cell").isin(all_cells)
    )
    adc = (
        codes.join(F.broadcast(qdf), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "label", _adc_expr().alias("adc_l"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_l", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            "rk",
            "vec_id",
            "label",
            F.round(F.col("adc_l") / PQ_SCALE, 6).alias("adc_d2"),
        )
    )


def ivf_pq_index_roundtrip_query(
    spark: SparkSession, embeddings: DataFrame
) -> DataFrame:
    """Build the IVF∘PQ index, then answer through it — output identical
    to inline `ivf_pq_topk`, so the same SQL oracle checks the whole
    persisted lifecycle."""
    from .artifacts import materialize_dir

    index_path = materialize_dir(
        embeddings, "ivf_pq_index", lambda p: build_ivf_pq_index(embeddings, p)
    )
    return ivf_pq_index_probe(
        spark, index_path, _collect_sample(embeddings)[:QUERY_K]
    )


# ---------------------------------------------------------------------------
# IVF∘PQ: the actual 100 TB ANN configuration — coarse cells prune the
# candidate set, PQ ADC ranks only within probed cells
# ---------------------------------------------------------------------------


def ivf_pq_topk(
    embeddings: DataFrame, k: int = 5, n_probe: int = IVF_PROBE
) -> DataFrame:
    """IVF∘PQ composition: queries probe their n_probe nearest coarse
    cells (`_train_ivf`), and the PQ asymmetric-distance ranking
    (`_train_pq` codebooks, per-row LUT lookups) runs ONLY over vectors
    assigned to a probed cell — never the whole corpus. This removes the
    flat-ADC Q×N candidate set that makes `pq_topk` quadratic: candidate
    volume is |Q| * (probed fraction of corpus), and the ADC math per
    candidate is PQ_M constant-index array lookups in WholeStageCodegen.

    At 100 TB: corpus stored as (cell, M byte codes) partitioned by
    cell (the `build_ivf_index` layout), coarse centroids + codebooks +
    per-query LUTs all broadcast — a probe is file-pruned IO over codes,
    ~16x smaller than the raw vectors, with no Q×N anything.

    Deterministic end to end -> full SQL oracle (the IVF and PQ training
    CTE chains composed); recall floor vs cosine_topk pinned in tests.
    """
    sample = _collect_sample(embeddings)
    queries = sample[:QUERY_K]
    cents = _memo_train("ivf", embeddings, sample, _train_ivf_py)
    books = _memo_train("pq", embeddings, sample, _train_pq_py)
    probes = _probe_py(cents, queries, n_probe)
    luts = _lut_py(books, queries)
    # query side: one serialized frame, a row per (query, probed cell),
    # the per-query LUT riding along — candidate pruning is then a
    # broadcast HASH join on `cell`, so no Q×N candidate set survives
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [
            (q_id, int(cell), luts[q_id])
            for q_id, _q in queries
            for cell in probes[q_id]
        ],
        schema="q_id long, cell long, la array<array<bigint>>",
    )
    enc = _encode_udf(cents, books)
    adc = (
        embeddings.select("vec_id", "label", enc("embedding").alias("e"))
        .select(
            "vec_id",
            "label",
            F.col("e.cell").alias("cell"),
            F.col("e.cs").alias("cs"),
        )
        .join(F.broadcast(qdf), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "label", _adc_expr().alias("adc_l"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_l", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            "rk",
            "vec_id",
            "label",
            F.round(F.col("adc_l") / PQ_SCALE, 6).alias("adc_d2"),
        )
    )


def _ivf_pq_sql(samp_pred: str = "TRUE") -> str:
    return f"""
WITH {_BASE_CTE},
{_samp_cte(samp_pred)},
{_IVF_TRAIN_CTES},
{_PQ_SUB_CTE},
{_PQ_TRAIN_CTES},
{_QIDS_CTE},
{_QS_CTE},
{_IVF_PROBE_CTE},
{_PQ_QSUB_LUT_CTES},
cand AS (
  SELECT p.q_id, a.vec_id
  FROM afinal a JOIN probe p USING (cell)
  WHERE a.vec_id <> p.q_id
),
adc AS (
  SELECT c.q_id, c.vec_id, CAST(SUM(l.dl) AS BIGINT) AS adc_l
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN lut l ON l.q_id = c.q_id AND l.m = k.m AND l.code = k.code
  GROUP BY c.q_id, c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_l, vec_id) AS rk
  FROM adc
)
SELECT r.q_id, r.rk, r.vec_id, b.label,
       round(r.adc_l / {PQ_SCALE}.0, 6) AS adc_d2
FROM ranked r JOIN base b USING (vec_id)
WHERE r.rk <= 5
"""


IVF_PQ_TOPK_SQL = _ivf_pq_sql()


def ann_recall_report(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Self-measuring quality report for the approximate paths: recall@k
    of banded-LSH and IVF against the exact cosine top-k, as a TABLE —
    the monitoring query an ANN deployment alarms on after every index
    rebuild. One bounded row per method; the hit counts are exact
    integers and the recall division is a single fixed-order IEEE op,
    so the full report (including both approximate pipelines and the
    exact baseline) is oracle-checked end to end."""
    # truth is bounded at QUERY_K*k rows -> BROADCAST it into the hit
    # joins: the SortMergeJoin (both sides shuffled+sorted, 4 exchanges)
    # becomes a BroadcastHashJoin with zero exchanges on the approx side
    # (guide §3.1). MEASURED AND REJECTED (r13): persisting truth so the
    # exact-baseline subtree evaluates once instead of once per union
    # arm — the cache-materialization barrier serialized the arms and
    # ran slower (2.48 vs 1.89 s) than letting both duplicate subtrees
    # run in parallel at bench scale.
    truth = cosine_topk(embeddings, k=k).select("q_id", "vec_id")
    methods = [
        ("lsh", ann_lsh_topk(embeddings, k=k)),
        ("ivf", ivf_topk(embeddings, k=k)),
    ]
    out = None
    n_q = F.lit(QUERY_K)
    for name, approx in methods:
        hits = (
            approx.select("q_id", "vec_id")
            .join(F.broadcast(truth), ["q_id", "vec_id"])
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(name).alias("method"),
                "n_hits",
                F.round(F.col("n_hits") / (n_q * k), 6).alias("recall_at_5"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out


ANN_RECALL_REPORT_SQL = f"""
WITH truth AS ({COSINE_TOPK_SQL}),
lsh AS ({ANN_LSH_TOPK_SQL}),
ivf AS ({IVF_TOPK_SQL})
SELECT 'lsh' AS method, COUNT(*) AS n_hits,
  round(COUNT(*) / ({QUERY_K} * 5), 6) AS recall_at_5
FROM truth t JOIN lsh a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
UNION ALL
SELECT 'ivf', COUNT(*), round(COUNT(*) / ({QUERY_K} * 5), 6)
FROM truth t JOIN ivf a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
"""


def merge_ivf_pq_batch(
    spark: SparkSession, index_path: str, batch: DataFrame
) -> None:
    """Append-only IVF∘PQ index maintenance — the production mode
    between periodic retrains: the FIRST batch trains the quantizers
    (`build_ivf_pq_index`); every later batch encodes against the
    FROZEN codebooks (bounded read-back) and appends its codes to the
    cell-partitioned table. An append touches only the arriving batch's
    cells; codebooks never move; probes see old and new vectors alike.
    (FAISS's add-after-train contract, as parquet partitions.)"""
    import os

    if not os.path.exists(os.path.join(index_path, "coarse")):
        build_ivf_pq_index(batch, index_path)
        return
    coarse = sorted(
        (r["cell"], list(r["ce"]), r["c_norm"])
        for r in spark.read.parquet(os.path.join(index_path, "coarse")).collect()
    )
    books: dict[int, list[tuple[int, list[float], float]]] = {}
    for r in sorted(
        spark.read.parquet(os.path.join(index_path, "books")).collect(),
        key=lambda r: (r["m"], r["cell"]),
    ):
        books.setdefault(r["m"], []).append((r["cell"], list(r["ce"]), r["cc"]))
    enc = _encode_udf(coarse, books)
    (
        batch.select("vec_id", "label", enc("embedding").alias("e"))
        .select(
            "vec_id",
            "label",
            F.col("e.cell").alias("cell"),
            F.col("e.cs").alias("cs"),
        )
        .write.partitionBy("cell")
        .mode("append")
        .parquet(os.path.join(index_path, "codes"))
    )


def incremental_ann_index_query(
    spark: SparkSession, embeddings: DataFrame
) -> DataFrame:
    """Registered-query form of the incremental lifecycle: two arrival
    batches (vec_id parity), codebooks frozen after batch one, then a
    probe over the accumulated index. The oracle replays it exactly —
    the SQL training CTEs draw their sample from batch one only, while
    encode and probe run over the full corpus."""
    from .artifacts import materialize_dir

    def _build(p: str) -> None:
        for batch in (
            embeddings.filter(F.col("vec_id") % 2 == 0),
            embeddings.filter(F.col("vec_id") % 2 == 1),
        ):
            merge_ivf_pq_batch(spark, p, batch)

    index_path = materialize_dir(embeddings, "ivf_pq_incr", _build)
    return ivf_pq_index_probe(
        spark, index_path, _collect_sample(embeddings)[:QUERY_K]
    )


INCREMENTAL_ANN_SQL = _ivf_pq_sql(samp_pred="vec_id % 2 = 0")


SEMANTIC_ROUNDS = 3

# The banded candidate set is threshold-independent (threshold is a
# final filter over the rounded cosine), so the pair-graph artifact is
# built once at this floor; every threshold >= floor shares that build
# and differs only by the trailing filter (no-rebuild pinned in
# test_similarity). A sub-floor threshold keys its own artifact.
EMB_PAIR_FLOOR = 0.3


def shared_embedding_pairs(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """`embedding_near_dup` through the per-corpus-snapshot artifact
    cache (operators/artifacts.py), floor-keyed so distinct thresholds
    over the same snapshot amortize one LSH band join + cosine verify."""
    from .artifacts import materialize

    base_t = min(threshold, EMB_PAIR_FLOOR)
    art = materialize(
        embeddings,
        f"emb_pairs_t{base_t!r}",
        lambda: embedding_near_dup(embeddings, base_t),
        "id_a long, id_b long, cosine double",
    )
    return art.filter(F.col("cosine") >= threshold) if threshold > base_t else art


def semantic_dedup(
    embeddings: DataFrame, threshold: float = 0.42, rounds: int = SEMANTIC_ROUNDS
) -> DataFrame:
    """SemDeDup-style semantic deduplication: connected components over
    the banded-LSH embedding near-dup graph (`embedding_near_dup` —
    candidates share a signature band, exact cosine verifies), labels
    propagated by bounded-round min-label passes exactly like the text
    path (dedup.dedup_clusters), canonical vector = the component's
    lowest vec_id. This is the embedding-space twin of MinHash dedup —
    the pass that removes SEMANTIC duplicates exact/near text matching
    cannot see. One shuffle per round; rounds bound the component
    diameter (near-dup components are tiny — pairs/triangles). The pair
    graph is a per-corpus-snapshot artifact (operators/artifacts.py) —
    without it every propagation round re-derived the LSH candidate set
    and its exact-cosine verification from the raw vectors."""
    edges = shared_embedding_pairs(embeddings, threshold).select("id_a", "id_b")
    adj = edges.unionByName(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    # MEASURED AND REJECTED (r13): touched-subgraph propagation (see
    # dedup.dedup_clusters) ran +72% slower here at sf0.1 — same
    # fixed-overhead arithmetic. The r14 sf1.0 re-check on the text twin
    # rejected it again (+7% at sf1.0); the r14 win for these rounds is
    # AQE inside the cached per-round frames (session.py).
    labels = embeddings.select(
        "vec_id", F.col("vec_id").alias("canonical_vec_id")
    )
    for _ in range(rounds):
        nbr = (
            adj.join(
                labels.select(
                    F.col("vec_id").alias("id_b"),
                    F.col("canonical_vec_id").alias("nbr_label"),
                ),
                "id_b",
            )
            .groupBy(F.col("id_a").alias("vec_id"))
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("canonical_vec_id"),
                    F.coalesce("nbr_min", F.col("canonical_vec_id")),
                ).alias("canonical_vec_id"),
            )
            # lazy persist: each round caches at first touch inside the
            # caller's action; never unpersist before execution (see
            # dedup.dedup_clusters) — eviction is the caller's
            # cache-clear seam
            .persist()
        )
    return labels


def _semantic_dedup_sql() -> str:
    steps = []
    prev = "l0"
    for r in range(1, SEMANTIC_ROUNDS + 1):
        steps.append(f"""
n{r} AS (
  SELECT a.id_a AS vec_id, MIN(l.canon) AS nbr
  FROM adj a JOIN {prev} l ON l.vec_id = a.id_b
  GROUP BY a.id_a
),
l{r} AS (
  SELECT l.vec_id, LEAST(l.canon, COALESCE(n.nbr, l.canon)) AS canon
  FROM {prev} l LEFT JOIN n{r} n USING (vec_id)
)""")
        prev = f"l{r}"
    return f"""
WITH pairs AS ({EMBEDDING_NEAR_DUP_SQL}),
adj AS (
  SELECT id_a, id_b FROM pairs
  UNION ALL
  SELECT id_b AS id_a, id_a AS id_b FROM pairs
),
l0 AS (SELECT vec_id, vec_id AS canon FROM embeddings),
{','.join(steps)}
SELECT vec_id, canon AS canonical_vec_id FROM {prev}
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()
