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
* IVF (`ivf_topk`) — deterministic 2-iteration k-means (16 cells, seeds
  = lowest vec_ids, integer-scaled exact centroid sums so both engines
  compute bit-identical centroids), queries probe the 4 nearest cells.
  At scale the corpus would be WRITTEN bucketed by cell id so probes
  prune files; training would run on a sample, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

HP_PRIME = 1_000_003
HP_A, HP_B = 374_761, 98_491

ANN_BITS, ANN_BAND_BITS = 128, 16  # 8 bands of 16 bits
ND_BITS, ND_BAND_BITS = 32, 4  # 8 bands of 4 bits

IVF_CELLS, IVF_PROBE, IVF_ITERS = 16, 4, 2
IVF_SCALE = 1_000_000_000  # integer scaling for exact centroid sums


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


COSINE_TOPK_SQL = f"""
WITH {_BASE_CTE},
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


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """[EXT] Embedding-cosine near-duplicate pairs, banded-LSH form: the
    registered production path. Candidate pairs share at least one of 8
    4-bit signature bands (equi-join on (band, key) — no cartesian, no
    broadcast of the corpus); exact cosine verifies candidates only.

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
        F.col("vec_id").alias("id_a"),
        F.col("emb_d").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb_d").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
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


def ann_lsh_topk(
    embeddings: DataFrame, query_modulo: int = 100, k: int = 5
) -> DataFrame:
    """Approximate top-k: banded random-hyperplane LSH. Candidates are
    corpus vectors sharing ANY of 8 16-bit signature bands with the
    query (the round-1 single-table 16-bit form had ~0.2 recall on this
    isotropic corpus; banding a 128-bit signature measures 0.84+);
    exact cosine re-ranks candidates. Oracle = same algorithm in SQL;
    recall floor vs cosine_topk pinned in tests."""
    base = _with_bands(embeddings, ANN_BITS, ANN_BAND_BITS).persist()
    qs = base.filter(F.col("vec_id") % query_modulo == 0).select(
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
qs AS (SELECT vec_id AS q_id, e AS q_e, norm AS q_norm FROM base
       WHERE vec_id % 100 = 0),
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


def _assign_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest centroid by cosine, ties to the smallest
    cell id. max(struct(sim, -cell)) partial-aggregates map-side, so the
    shuffle carries one row per vector, not one per (vector, cell)."""
    sim = F.round(
        _dot(F.col("emb_d"), F.col("ce")) / (F.col("norm") * F.col("c_norm")),
        9,
    )
    return (
        base.select("vec_id", "emb_d", "norm")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cell", sim.alias("sim"))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("sim"), (-F.col("cell")).alias("nc"))
            ).alias("m")
        )
        .select("vec_id", (-F.col("m.nc")).alias("cell"))
    )


def _centroids(base: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-cell mean vector with EXACT integer-scaled sums, so both
    engines produce bit-identical centroid doubles regardless of their
    float accumulation order."""
    ex = (
        base.join(assign, "vec_id")
        .select("cell", F.posexplode("emb_d").alias("i", "v"))
    )
    comp = ex.groupBy("cell", "i").agg(
        F.sum(F.round(F.col("v") * IVF_SCALE).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        comp.withColumn("c", F.col("s") / IVF_SCALE / F.col("n"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select("cell", F.transform("ic", lambda x: x["c"]).alias("ce"))
        .withColumn("c_norm", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_modulo: int = 100,
    k: int = 5,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF-style ANN with a REAL (if tiny) coarse quantizer: 16 k-means
    cells seeded from the 16 lowest vec_ids, two unrolled Lloyd
    iterations with integer-scaled exact centroid sums, queries probe
    their n_probe nearest cells, exact cosine re-ranks within probed
    cells only. Fully deterministic -> the oracle replays it in SQL;
    recall floor vs cosine_topk pinned in tests. (The round-1 form used
    per-LABEL centroids; labels are random on this corpus, so its cells
    carried no geometry at all.)

    At scale: train on a SAMPLE (the two Lloyd passes here scan the
    corpus for determinism); write the corpus bucketed by cell id so
    probes prune files instead of shuffling; centroids stay broadcast."""
    base = with_norm(embeddings).persist()
    seeds = (
        base.orderBy("vec_id")
        .limit(IVF_CELLS)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("emb_d").alias("ce"),
            F.col("norm").alias("c_norm"),
        )
    )
    cents = seeds
    for _ in range(IVF_ITERS):
        # cut the Lloyd lineage at the 16-row centroid artifact (same
        # rationale as pq_topk: un-materialized iterative training
        # re-executes all prior rounds in every consumer)
        prev = cents
        cents = _centroids(base, _assign_cells(base, prev)).persist()
        cents.count()
        if prev is not seeds:
            prev.unpersist()
    final_assign = _assign_cells(base, cents)
    qs = base.filter(F.col("vec_id") % query_modulo == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c_sim = F.round(
        _dot(F.col("q_emb"), F.col("ce")) / (F.col("q_norm") * F.col("c_norm")),
        9,
    )
    probe = (
        qs.crossJoin(F.broadcast(cents))
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
    cand = final_assign.join(F.broadcast(probe), "cell").filter(
        F.col("vec_id") != F.col("q_id")
    )
    sim = cand.join(
        base.select("vec_id", "label", "emb_d", "norm"), "vec_id"
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


def _ivf_sql() -> str:
    assign = """
  SELECT vec_id, -((MAX(struct_pack(sim := round(
           list_dot_product(b.e, c.ce) / (b.norm * c.c_norm), 9),
           nc := -c.cell))).nc) AS cell
  FROM base b CROSS JOIN {cents} c
  GROUP BY vec_id"""
    cent = f"""
  SELECT cell, list(c ORDER BY i) AS ce,
         sqrt(list_dot_product(list(c ORDER BY i), list(c ORDER BY i))) AS c_norm
  FROM (
    SELECT cell, i,
           CAST(SUM(CAST(round(v * {IVF_SCALE}) AS BIGINT)) AS BIGINT)
             / {IVF_SCALE}.0 / COUNT(*) AS c
    FROM (
      SELECT a.cell, unnest(generate_series(1, len(b.e))) AS i, unnest(b.e) AS v
      FROM {{assign}} a JOIN base b USING (vec_id)
    )
    GROUP BY cell, i
  )
  GROUP BY cell"""
    return f"""
WITH {_BASE_CTE},
seeds AS (
  SELECT vec_id AS cell, e AS ce, norm AS c_norm
  FROM base ORDER BY vec_id LIMIT {IVF_CELLS}
),
a0 AS ({assign.format(cents='seeds')}),
c1 AS ({cent.format(assign='a0')}),
a1 AS ({assign.format(cents='c1')}),
c2 AS ({cent.format(assign='a1')}),
afinal AS ({assign.format(cents='c2')}),
qs AS (
  SELECT vec_id AS q_id, e AS q_e, norm AS q_norm FROM base
  WHERE vec_id % 100 = 0
),
probe AS (
  SELECT q_id, q_e, q_norm, cell FROM (
    SELECT q.q_id, q.q_e, q.q_norm, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             round(list_dot_product(q.q_e, c.ce) / (q.q_norm * c.c_norm), 9)
               DESC, c.cell) AS c_rk
    FROM qs q CROSS JOIN c2 c
  ) WHERE c_rk <= {IVF_PROBE}
),
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
PQ_TRAIN_MOD = 10  # Lloyd passes train on vec_id % MOD == 0 (determ. sample)
PQ_SUBDIM = 4  # 64 / PQ_M
PQ_SCALE = 1_000_000_000


def _pq_subvectors(base: DataFrame) -> DataFrame:
    """(vec_id, m, sv): the M disjoint sub-vectors of each embedding.
    Narrow per-row expression — no shuffle."""
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("emb_d", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
            )
            for m in range(PQ_M)
        ]
    )
    return base.select("vec_id", F.explode(slices).alias("s")).select(
        "vec_id", "s.m", "s.sv"
    )


def _pq_d2(x: Column, c: Column, cc: Column) -> Column:
    """Squared L2 distance via the dot identity xx - 2xc + cc, each dot
    an in-order fold so DuckDB's list_dot_product reproduces it; rounded
    so argmin ties are impossible to flip across engines."""
    return F.round(_dot(x, x) - 2 * _dot(x, c) + cc, 9)


def _pq_assign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, sv, code): nearest sub-centroid per subspace, as a
    PER-ROW argmin fold over the PQ_K-entry codebook broadcast as one
    array row per subspace. No row explosion (the old join form expanded
    PQ_K rows per (vector, subspace) through a min(struct) shuffle), no
    argmin exchange, and sv rides along so the centroid update needs no
    join-back. array_sort(struct(d2, cell))[1] = lexicographic MIN —
    identical tie-breaks to the oracle's MIN(struct_pack(d2, cell))."""
    cents_arr = cents.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("cell", "ce", "cc"))).alias("_cells")
    )
    scored = F.transform(
        F.col("_cells"),
        lambda c: F.struct(
            _pq_d2(F.col("sv"), c["ce"], c["cc"]).alias("d2"),
            c["cell"].alias("cell"),
        ),
    )
    return (
        sub.join(F.broadcast(cents_arr), "m")
        .withColumn("code", F.element_at(F.array_sort(scored), 1)["cell"])
        .select("vec_id", "m", "sv", "code")
    )


def _pq_centroids(assigned: DataFrame) -> DataFrame:
    """(m, cell, ce, cc): per-subspace centroids, exact integer-scaled
    component means (bit-identical across engines and partitionings).
    `assigned` already carries (sv, code) per row, so the only shuffle
    is the (m, cell, i) component aggregation."""
    ex = assigned.select(
        "m", F.col("code").alias("cell"), F.posexplode("sv").alias("i", "v")
    )
    comp = ex.groupBy("m", "cell", "i").agg(
        F.sum(F.round(F.col("v") * PQ_SCALE).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        comp.withColumn("c", F.col("s") / PQ_SCALE / F.col("n"))
        .groupBy("m", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select("m", "cell", F.transform("ic", lambda x: x["c"]).alias("ce"))
        .withColumn("cc", _dot(F.col("ce"), F.col("ce")))
    )


def pq_topk(
    embeddings: DataFrame, query_modulo: int = 100, k: int = 5
) -> DataFrame:
    """Product-quantization ANN: each 64-dim vector is encoded as M=4
    codebook ids (16 codes per subspace, deterministic k-means: seeds =
    lowest vec_ids' sub-vectors, 2 integer-scaled Lloyd iterations);
    queries stay exact and rank the corpus by the ADC approximation
    sum_m ||q_m - c[m][code_m]||^2 — a lookup-table join, never a full
    vector scan.

    At 100 TB this is the memory-bound regime's answer: the corpus
    resides as M small ints per vector (16x smaller than float32), the
    per-query LUT is M*K rounded distances broadcast to the codes, and
    the ranking aggregation shuffles (q_id, vec_id, partial-sum) — no
    embedding arrays move after encode time. Fully deterministic ->
    full SQL oracle; recall floor vs cosine_topk pinned in tests.
    """
    base = with_norm(embeddings).persist()
    sub = _pq_subvectors(base).persist()
    # train on a deterministic 1-in-PQ_TRAIN_MOD sample (vec_id modulus:
    # engine- and growth-stable) — codebooks are statistics, the full
    # corpus scan per Lloyd pass buys nothing at 100 TB; the oracle
    # samples identically
    sub_t = sub.filter(F.col("vec_id") % PQ_TRAIN_MOD == 0)
    seeds = (
        _pq_subvectors(
            base.orderBy("vec_id").limit(PQ_K)
        )
        .select("m", F.col("vec_id").alias("cell"), F.col("sv").alias("ce"))
        .withColumn("cc", _dot(F.col("ce"), F.col("ce")))
    )
    cents = seeds
    for _ in range(PQ_ITERS):
        # materialize the M*K-row codebook each round: without this the
        # Lloyd lineage re-executes every prior round inside the next
        # one (and again in the LUT and the final encode) — iterative
        # training must cut lineage at the small artifact
        prev = cents
        # persist (no eager count): the next iteration's broadcast
        # collect materializes the cache, which cuts the Lloyd lineage
        # without spending an extra job per round
        cents = _pq_centroids(_pq_assign(sub_t, prev)).persist()
        if prev is not seeds:
            prev.unpersist()
    codes = _pq_assign(sub, cents).select("vec_id", "m", "code")
    qsub = sub.filter(F.col("vec_id") % query_modulo == 0).select(
        F.col("vec_id").alias("q_id"), "m", F.col("sv").alias("qv")
    )
    lut = (
        qsub.join(F.broadcast(cents), "m")
        .select(
            "q_id",
            "m",
            F.col("cell").alias("code"),
            F.round(_pq_d2(F.col("qv"), F.col("ce"), F.col("cc")) * PQ_SCALE)
            .cast("long")
            .alias("dl"),
        )
    )
    # ADC as narrow positional-array math, not a join: one row per
    # vector carrying its PQ_M codes (remapped to DENSE 0..PQ_K-1 ranks
    # — order-preserving per subspace, so assignments and tie-breaks are
    # unchanged), one row per query carrying the LUT as a PQ_M*PQ_K
    # array ordered by (m, dense code). Each (q, vec) distance is then
    # PQ_M constant-index element_at terms summed as plain scalar
    # expressions — whole-stage-codegen, O(1) per lookup, no
    # higher-order functions (those evaluate interpreted per element).
    # The join-based form materialized PQ_M rows per (q, vec) pair
    # through an exchange and re-aggregated them (a 400M-row shuffle at
    # sf0.1); here nothing but the final (q_id, vec_id, adc_l) triples
    # reach the top-k window. adc_l is the same exact integer sum either
    # way, so the SQL oracle is unchanged.
    dense = cents.select(
        "m",
        F.col("cell").alias("code"),
        (F.row_number().over(Window.partitionBy("m").orderBy("cell")) - 1).alias(
            "dcode"
        ),
    )
    codes_arr = (
        codes.join(F.broadcast(dense), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "dcode"))),
                lambda s: s["dcode"],
            ).alias("cs")
        )
    )
    # two-level (per-m) LUT arrays: sampled training can leave cells
    # empty, so per-subspace codebook sizes vary — flat m*PQ_K offsets
    # would mis-index; la[m][dcode] is always valid because codes are
    # assigned from the same surviving cells
    lut_arr = (
        lut.join(F.broadcast(dense), ["m", "code"])
        .groupBy("q_id", "m")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dcode", "dl"))),
                lambda s: s["dl"],
            ).alias("dls")
        )
        .groupBy("q_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "dls"))),
                lambda s: s["dls"],
            ).alias("la")
        )
    )
    adc_l = None
    for m in range(PQ_M):
        term = F.element_at(
            F.element_at(F.col("la"), m + 1),
            (F.element_at(F.col("cs"), m + 1) + 1).cast("int"),
        )
        adc_l = term if adc_l is None else adc_l + term
    adc = (
        codes_arr.crossJoin(F.broadcast(lut_arr))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", adc_l.alias("adc_l"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_l", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .join(base.select("vec_id", "label"), "vec_id")
        .select(
            "q_id",
            "rk",
            "vec_id",
            "label",
            F.round(F.col("adc_l") / PQ_SCALE, 6).alias("adc_d2"),
        )
    )


def _pq_sql() -> str:
    sub_expr = f"""
  SELECT vec_id, m, e[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)"""
    d2 = (
        "round(list_dot_product({x}, {x}) - 2 * list_dot_product({x}, {c})"
        " + {cc}, 9)"
    )
    assign = f"""
  SELECT vec_id, m, (MIN(struct_pack(
           d2 := {d2.format(x='s.sv', c='c.ce', cc='c.cc')},
           cell := c.cell))).cell AS code
  FROM {{src}} s JOIN {{cents}} c USING (m)
  GROUP BY vec_id, m"""
    cent = f"""
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
    return f"""
WITH {_BASE_CTE},
sub AS ({sub_expr}),
subt AS (SELECT * FROM sub WHERE vec_id % {PQ_TRAIN_MOD} = 0),
seeds AS (
  SELECT m, vec_id AS cell, sv AS ce, list_dot_product(sv, sv) AS cc
  FROM sub WHERE vec_id IN (
    SELECT vec_id FROM base ORDER BY vec_id LIMIT {PQ_K})
),
a0 AS ({assign.format(src='subt', cents='seeds')}),
c1 AS ({cent.format(assign='a0')}),
a1 AS ({assign.format(src='subt', cents='c1')}),
c2 AS ({cent.format(assign='a1')}),
codes AS ({assign.format(src='sub', cents='c2')}),
qsub AS (
  SELECT vec_id AS q_id, m, sv AS qv FROM sub WHERE vec_id % 100 = 0
),
lut AS (
  SELECT q.q_id, q.m, c.cell AS code,
         CAST(round({d2.format(x='q.qv', c='c.ce', cc='c.cc')} * {PQ_SCALE})
              AS BIGINT) AS dl
  FROM qsub q JOIN c2 c USING (m)
),
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


def _train_ivf(base: DataFrame) -> DataFrame:
    """The deterministic coarse quantizer used by ivf_topk, factored so
    the persisted-index path trains identically."""
    seeds = (
        base.orderBy("vec_id")
        .limit(IVF_CELLS)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("emb_d").alias("ce"),
            F.col("norm").alias("c_norm"),
        )
    )
    cents = seeds
    for _ in range(IVF_ITERS):
        prev = cents
        cents = _centroids(base, _assign_cells(base, prev)).persist()
        cents.count()
        if prev is not seeds:
            prev.unpersist()
    return cents


def build_ivf_index(embeddings: DataFrame, index_path: str) -> None:
    """Materialize the IVF index: the 16-row codebook as one parquet
    artifact, and the corpus (vector + norm + label) PARTITIONED BY
    CELL — `cell=N/` directories, so a probe reads only its cells'
    files. This is the build-once-probe-many lifecycle the inline
    `ivf_topk` docstring promises at scale: index build is one training
    pass + one partitioned write; every later query is file-pruned IO."""
    import os

    base = with_norm(embeddings).persist()
    cents = _train_ivf(base)
    cents.write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))
    (
        _assign_cells(base, cents)
        .join(base.select("vec_id", "label", "emb_d", "norm"), "vec_id")
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
    c_sim = F.round(
        _dot(F.col("q_emb"), F.col("ce")) / (F.col("q_norm") * F.col("c_norm")),
        9,
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
    spark: SparkSession, embeddings: DataFrame, query_modulo: int = 100
) -> DataFrame:
    """Build the index, then answer through it — output is identical to
    `ivf_topk`, so the same SQL oracle checks the whole persisted
    lifecycle (a drift in the write/read path breaks parity)."""
    import tempfile

    index_path = tempfile.mkdtemp(prefix="ivf_index_")
    build_ivf_index(embeddings, index_path)
    qs = with_norm(embeddings).filter(
        F.col("vec_id") % query_modulo == 0
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    return ivf_index_probe(spark, index_path, qs)
