"""[EXT] Deduplication operators for LLM-data pipelines (SURVEY.md §2.11):
exact, MinHash+LSH near-dup, n-gram Jaccard, SimHash.

Shingling: token 3-grams (discriminative on this corpus: planted near-dup
pairs sit at Jaccard ≥0.95 vs ≈0.03 background).

Two id assignment strategies for shingles:
* oracle path — vocabulary rank (row_number over sorted distinct
  shingles): engine-independent, used by every oracle-checked query here.
  The global sort is the known scale bottleneck.
* production path — xxhash64(shingle): no vocabulary, no global sort,
  pure map-side; `minhash_pairs(..., use_xxhash=True)`. Same algorithm,
  different hash family; not oracle-checkable because DuckDB's hash
  differs.

Scale shape of MinHash LSH: explode to (doc, shingle) [narrow] ->
per-doc signature [one shuffle on doc_id] -> band explode [narrow] ->
self-join on (band, key) [shuffle on band-key — the LSH point: joins only
collide within buckets] -> Jaccard verify restricted to candidates
[semi-join-sized work, not O(n²)].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PRIME = 1_000_003
# (a, b) pairs for the 8 minhash permutations h_i(x) = (a*x + b) mod PRIME.
# a >> PRIME/max_sid so the product wraps the modulus many times — with
# small coefficients h_i would be monotone in x and every permutation
# would pick the same argmin (degenerate LSH).
MINHASH_COEFFS = [
    (374_761, 154),
    (524_287, 941),
    (746_777, 3),
    (999_983, 71),
    (101_113, 17),
    (808_417, 23),
    (611_953, 5),
    (900_001, 89),
]
N_BANDS = 4  # bands of r=2 rows each
SIMHASH_BITS = 16
SIMHASH_A, SIMHASH_B = 374_761, 15_485_863


def _tokens(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per document: posexplode the token
    array once, then `lead()` over (doc_id, pos) stitches the n-gram.

    (A higher-order `transform` with `element_at(split(...), i)` looks
    cheaper — no shuffle — but re-evaluates the split per element, going
    O(len²) per document; the lead() form is one sort per doc partition
    and scales linearly.)"""
    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", k).over(w) for k in range(1, n)]
    last = F.lead("token", n - 1).over(w)
    return (
        toks.select("doc_id", F.concat_ws("_", *parts).alias("shingle"), last.alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


SHINGLES_CTE = """
toks AS (
  SELECT doc_id,
    unnest(string_split(text, ' ')) AS token,
    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
  FROM documents
),
sh_raw AS (
  SELECT a.doc_id, a.token || '_' || b.token || '_' || c.token AS shingle
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh_raw),
vocab AS (
  SELECT shingle, row_number() OVER (ORDER BY shingle) AS sid
  FROM (SELECT DISTINCT shingle FROM sh)
),
ids AS (SELECT s.doc_id, v.sid FROM sh s JOIN vocab v USING (shingle))
"""


def _shingle_ids(documents: DataFrame, use_xxhash: bool) -> DataFrame:
    """(doc_id, sid) with sid either vocabulary rank or xxhash64."""
    sh = shingles(documents)
    if use_xxhash:
        return sh.select(
            "doc_id", F.pmod(F.xxhash64("shingle"), F.lit(PRIME)).alias("sid")
        )
    vocab = (
        sh.select("shingle")
        .distinct()
        .select(
            "shingle",
            F.row_number().over(Window.orderBy("shingle")).cast("long").alias("sid"),
        )
    )
    return sh.join(F.broadcast(vocab), "shingle").select("doc_id", "sid")


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup: group by content, keep the smallest doc_id as the
    canonical row. (Scale path groups by sha2(text, 256) so the shuffle
    key is 32 bytes, not the document — same grouping since sha2
    collisions are negligible; the oracle groups by text, which is
    equivalent.)"""
    return (
        documents.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def minhash_signatures(documents: DataFrame, use_xxhash: bool = False) -> DataFrame:
    """Per-doc MinHash signature: m_i = min over shingles of (a_i*sid+b_i) mod P."""
    ids = _shingle_ids(documents, use_xxhash)
    aggs = [
        F.min((F.col("sid") * a + b) % PRIME).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return ids.groupBy("doc_id").agg(*aggs)


def minhash_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    use_xxhash: bool = False,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, Jaccard-verified.

    Band into N_BANDS bands of 2 rows; candidate pairs share any band;
    true Jaccard (on shingle sets) computed only for candidates and
    filtered at `threshold`. Deterministic: banding is a pure function of
    the signatures, so the oracle finds the identical candidate set.
    """
    # shingle-ids feed both the signatures and the Jaccard verify: persist
    # so the shingling (and, on the oracle path, the vocabulary sort+join)
    # runs once, not twice
    ids = _shingle_ids(documents, use_xxhash).persist()
    aggs = [
        F.min((F.col("sid") * a + b) % PRIME).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    sig = ids.groupBy("doc_id").agg(*aggs)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    counts = ids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ia = ids.toDF("doc_a", "sid")
    ib = ids.toDF("doc_b", "sid_b")
    common = (
        cand.join(ia, "doc_a")
        .join(ib, "doc_b")
        .filter(F.col("sid") == F.col("sid_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_sql() -> str:
    mins = ",\n    ".join(
        f"MIN((sid * {a} + {b}) % {PRIME}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, CAST(m{2 * b} AS VARCHAR) || ':' || "
        f"CAST(m{2 * b + 1} AS VARCHAR) AS key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH {SHINGLES_CTE},
sig AS (
  SELECT doc_id, {mins}
  FROM ids GROUP BY doc_id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN ids ia ON ia.doc_id = c.doc_a
  JOIN ids ib ON ib.doc_id = c.doc_b AND ib.sid = ia.sid
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
  round(n_common * 1.0 / (na.n + nb.n - n_common), 6) AS jaccard
FROM common
JOIN counts na ON na.doc_id = doc_a
JOIN counts nb ON nb.doc_id = doc_b
WHERE round(n_common * 1.0 / (na.n + nb.n - n_common), 6) >= 0.5
"""


MINHASH_PAIRS_SQL = _minhash_sql()


def ngram_jaccard_sample(documents: DataFrame, modulo: int = 2) -> DataFrame:
    """Brute-force n-gram Jaccard on a deterministic sample (doc_id %
    modulo == 0) — the quadratic baseline that validates the LSH path.
    Output every pair with jaccard >= 0.05 (background similarity in the
    corpus is ~0.03; planted near-dups are >=0.9)."""
    sample = documents.filter(F.col("doc_id") % modulo == 0)
    ids = _shingle_ids(sample, use_xxhash=False)
    counts = ids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ids.select(F.col("doc_id").alias("doc_a"), "sid")
    b = ids.select(F.col("doc_id").alias("doc_b"), "sid")
    common = (
        a.join(b, ["sid"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.05)
        .select("doc_a", "doc_b", "jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH documents_s AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
{SHINGLES_CTE.replace("FROM documents", "FROM documents_s")},
counts AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
common AS (
  SELECT ia.doc_id AS doc_a, ib.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ids ia
  JOIN ids ib ON ib.sid = ia.sid AND ia.doc_id < ib.doc_id
  GROUP BY ia.doc_id, ib.doc_id
)
SELECT doc_a, doc_b,
  round(n_common * 1.0 / (na.n + nb.n - n_common), 6) AS jaccard
FROM common
JOIN counts na ON na.doc_id = doc_a
JOIN counts nb ON nb.doc_id = doc_b
WHERE round(n_common * 1.0 / (na.n + nb.n - n_common), 6) >= 0.05
"""


def simhash(documents: DataFrame) -> DataFrame:
    """SimHash: 16-bit signature from shingle-id hashes. For each bit j,
    sum +1/-1 over shingles by bit j of h(sid); signature bit j is 1 when
    the sum is positive. One aggregation, 16 conditional sums."""
    ids = _shingle_ids(documents, use_xxhash=False)
    h = (F.col("sid") * SIMHASH_A + SIMHASH_B) % PRIME
    bit_sums = [
        F.sum(
            F.when(((h / (2**j)).cast("long") % 2) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = ids.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, 2**j).otherwise(0)
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (((sid * {SIMHASH_A} + {SIMHASH_B}) % {PRIME}) // {2**j}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {SHINGLES_CTE},
agg AS (
  SELECT doc_id, {bit_sums}
  FROM ids GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM agg
"""


SIMHASH_SQL = _simhash_sql()
