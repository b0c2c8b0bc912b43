"""[EXT] Corpus-curation operators for LLM-training-data pipelines
(SURVEY.md §2.11, BASELINE.json north_star): benchmark decontamination,
repetition scoring, and deterministic stratified sampling.

These extend the text-analysis family (operators/text.py) with the three
curation steps a pretraining pipeline runs between dedup and tokenize:

* ``decontaminate`` — flag training documents sharing word n-grams with a
  held-out benchmark/eval set (the standard n-gram-overlap decontamination
  used for pretraining corpora).
* ``repetition_score`` — Gopher-style within-document repetition signals
  (duplicate-token fraction, most-frequent-bigram mass) used as a quality
  pre-filter.
* ``stratified_sample`` — deterministic per-source hash sampling (keep a
  configurable per-mille of each source), the reproducible alternative to
  ``DataFrame.sample`` whose output is stable across runs, partitionings
  and engines.

Scale notes (100 TB):
* decontamination joins EXPLODED train grams against the DISTINCT gram ids
  of the benchmark side only. Benchmark/eval sets are tiny relative to the
  corpus, so the gram-id set is explicitly ``broadcast()`` — the corpus
  side never shuffles; the per-doc overlap agg is keyed by ``doc_id``
  (no skew: a document only meets its own grams).
* gram ids are the cross-engine sha2-prefix hash (operators/hashing.py)
  — native-codegen map-side arithmetic (the per-character Horner fold
  evaluates interpreted and cost ~3x on these ~30-char grams), an
  8-byte join key instead of a 40-byte string, and DuckDB-reproducible
  so the query stays oracle-checked. Production corpora wanting a 64-bit range swap in
  ``F.xxhash64`` at the one call site (same seam as dedup.py).
* repetition scoring's only shuffle is the per-(doc_id, bigram) count —
  keyed by doc_id, embarrassingly parallel, no skew.
* stratified sampling is a pure narrow filter (no shuffle, no sort, no
  driver state); the hash-bucket predicate pushes the kept fraction's
  row-group pruning to nothing but stays a scan-side filter.

Reference parity: the reference has no corpus-curation surface (it is a
weather ETL); these operators implement the [EXT] LLM-data mandate of
SURVEY.md §2.11 with the same oracle discipline as the §2 rows.

Cache lifecycle: multi-branch operators here persist() shared
intermediates LAZILY and never unpersist them inline (deregistering a
cache before the consumer's action executes forces the subplan to
recompute per branch). Eviction is the CALLER's seam — call
`operators.artifacts.clear_caches(spark)` between logical units of work
(bench.py, the test fixtures and the verify sweep all do), which also
drops the artifact layer's memoized fallbacks; Spark's LRU still evicts
under memory pressure for callers that never do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import (
    char_poly_hash,
    char_poly_hash_sql,
    sha_prefix_hash,
    sha_prefix_hash_sql,
)

# ---------------------------------------------------------------------------
# shared: word n-grams as a per-row array (narrow, codegen'd)
# ---------------------------------------------------------------------------


def _word_ngrams(n: int, col: str = "text") -> Column:
    """Array of space-joined word n-grams; empty when the doc has fewer
    than n tokens. Built as a zip_with ladder over shifted token slices
    (the dedup.py shingle pattern): each step is one narrow concat per
    element in WholeStageCodegen — the per-index array_join(slice(...))
    form re-sliced the token array per gram and measured ~3x slower on
    this corpus. zip_with pads the shorter side with null, so the tail
    positions (and any doc shorter than n) concat to null and are
    filtered, leaving exactly the n-gram list in document order."""
    toks = F.split(F.col(col), " ")
    grams = toks
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.filter(grams, lambda x: x.isNotNull())


def _ngrams_sql(n: int) -> str:
    """The identical n-gram list in DuckDB (range is end-exclusive; list
    slicing is 1-based end-inclusive; range(1, k) with k <= 1 is [])."""
    return (
        f"list_transform(range(1, len(toks) - {n - 2}), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' '))"
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    documents: DataFrame,
    n: int = 5,
    benchmark_mod: int = 20,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: every training document is scored by the
    fraction of its distinct word n-grams that also occur in the held-out
    benchmark set (here: doc_id % benchmark_mod == 0, standing in for an
    eval suite), and flagged when the fraction reaches ``threshold``.

    Plan shape: per-row gram arrays (narrow) -> distinct benchmark gram
    ids, broadcast -> explode train grams, hash-join on the 8-byte gram id
    -> per-doc distinct-overlap count -> left join back to the per-doc
    gram totals. The corpus never shuffles; only its exploded gram ids
    flow into a broadcast join keyed by doc_id afterwards.
    """
    grams = F.array_distinct(_word_ngrams(n))
    # the gram-array construction feeds THREE branches (benchmark ids,
    # train explode, per-doc totals) — lazily persist so it evaluates
    # once per document, not three times.
    # MEASURED AND REJECTED (r13): caching 8-byte hashed gids instead of
    # the gram strings (persist-narrow, guide §5.2) ran +22% SLOWER at
    # sf0.1 — the hash must then run INSIDE transform(), an interpreted
    # per-element higher-order function, while the post-explode form
    # below hashes in WholeStageCodegen; the cached-byte savings never
    # paid back the interpretation cost.
    # MEASURED AND REJECTED AGAIN (r14, VERDICT r13 directive 7, incl.
    # the sf1.0 re-check): (a) caching the EXPLODED (doc_id, gid) rows —
    # hash post-explode stays in codegen, avoiding the r13 transform
    # trap — ran +50% at sf0.1 (1.67 -> 2.52 s) and a WASH at sf1.0
    # (head 7.7-11.3 vs 7.3-10.8 s, same-process alternation on a noisy
    # window): materializing ~n_tokens rows/doc into the cache costs
    # more than the strings it saves at both scales measured; (b) no
    # persist at all (three gram recomputes) ran +80% at sf0.1. The
    # string-array cache stays.
    with_g = documents.select("doc_id", grams.alias("grams")).persist()
    is_bench = (F.col("doc_id") % benchmark_mod) == 0

    bench_ids = (
        with_g.filter(is_bench)
        .select(F.explode("grams").alias("gram"))
        .select(sha_prefix_hash("gram").alias("gid"))
        .distinct()
    )
    train = with_g.filter(~is_bench)
    train_docs = train.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    overlap = (
        train.select("doc_id", F.explode("grams").alias("gram"))
        .select("doc_id", sha_prefix_hash("gram").alias("gid"))
        .join(F.broadcast(bench_ids), "gid")
        .groupBy("doc_id")
        .agg(F.count_distinct("gid").cast("long").alias("n_overlap"))
    )
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    ratio = n_overlap / F.greatest(F.col("n_grams"), F.lit(1).cast("long"))
    return (
        train_docs.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_overlap.alias("n_overlap"),
            F.round(ratio, 6).alias("contamination_ratio"),
            (ratio >= threshold).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id,
    list_distinct({_ngrams_sql(5)}) AS grams
  FROM w
),
ids AS (
  SELECT doc_id, len(grams) AS n_grams,
    list_transform(grams, gram -> {sha_prefix_hash_sql('gram')}) AS gids
  FROM g
),
bench AS (
  SELECT DISTINCT unnest(gids) AS gid FROM ids WHERE doc_id % 20 = 0
),
train AS (
  SELECT doc_id, n_grams, gids FROM ids WHERE doc_id % 20 <> 0
),
ov AS (
  SELECT t.doc_id, COUNT(DISTINCT t.gid) AS n_overlap
  FROM (SELECT doc_id, unnest(gids) AS gid FROM train) t
  JOIN bench USING (gid)
  GROUP BY t.doc_id
)
SELECT t.doc_id,
  CAST(t.n_grams AS BIGINT) AS n_grams,
  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
  round(COALESCE(ov.n_overlap, 0) / (GREATEST(t.n_grams, 1) * 1.0), 6)
    AS contamination_ratio,
  COALESCE(ov.n_overlap, 0) / (GREATEST(t.n_grams, 1) * 1.0) >= 0.05
    AS contaminated
FROM train t LEFT JOIN ov ON ov.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# repetition scoring (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_score(
    documents: DataFrame,
    dup_threshold: float = 0.8,
    bigram_threshold: float = 0.08,
) -> DataFrame:
    """Within-document repetition signals: duplicate-token fraction
    (1 - distinct/total) and the mass of the single most frequent bigram —
    the cheap repetition filters applied to pretraining corpora.

    The bigram mode requires a per-(doc, gram) count: explode + two aggs
    keyed by doc_id (each document meets only its own grams, so the
    shuffle is skew-free and the combine is map-side partial).
    """
    toks = F.split(F.col("text"), " ")
    nt = F.size(toks)
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    per_gram = (
        documents.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("n_bigrams"))
    )
    per_doc = documents.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    dup_ratio = 1.0 - F.col("n_distinct") / F.col("n_tokens")
    big_frac = F.coalesce(
        F.col("max_c") / F.col("n_bigrams"), F.lit(0.0)
    )
    # a bigram seen once is not repetition: the mass test only applies
    # when the top bigram actually repeats (matters for short docs, where
    # 1/n_bigrams alone can clear the threshold)
    repeats = F.coalesce(F.col("max_c"), F.lit(0)) >= 2
    return per_doc.join(per_gram, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.round(dup_ratio, 6).alias("dup_token_ratio"),
        F.round(big_frac, 6).alias("top_bigram_frac"),
        (
            (dup_ratio >= dup_threshold)
            | (repeats & (big_frac >= bigram_threshold))
        ).alias("repetitive"),
    )


REPETITION_SCORE_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
per_doc AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct
  FROM w
),
grams AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))
      AS gram
  FROM w
),
per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
),
modes AS (
  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_bigrams
  FROM per_gram GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(d.n_tokens AS BIGINT) AS n_tokens,
  round(1.0 - d.n_distinct / (d.n_tokens * 1.0), 6) AS dup_token_ratio,
  round(COALESCE(m.max_c / (m.n_bigrams * 1.0), 0.0), 6) AS top_bigram_frac,
  (1.0 - d.n_distinct / (d.n_tokens * 1.0)) >= 0.8
    OR (COALESCE(m.max_c, 0) >= 2
        AND COALESCE(m.max_c / (m.n_bigrams * 1.0), 0.0) >= 0.08) AS repetitive
FROM per_doc d LEFT JOIN modes m ON m.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

DEFAULT_SAMPLE_RATES: dict[str, int] = {"src0": 500, "src1": 250}
DEFAULT_SAMPLE_PERMILLE = 100


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int] | None = None,
    default_permille: int = DEFAULT_SAMPLE_PERMILLE,
) -> DataFrame:
    """Deterministic per-source sampling: keep a document iff its hash
    bucket (Horner hash of ``doc_id:source``, mod 1000) falls below the
    source's per-mille rate. Unlike ``DataFrame.sample`` the kept set is a
    pure function of the row — stable across runs, partitionings, engines
    and (crucially for incremental pipelines) across corpus growth.
    """
    rates = DEFAULT_SAMPLE_RATES if rates is None else rates
    bucket = char_poly_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    ) % 1000
    rate: Column = F.lit(default_permille)
    for src, permille in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(permille)).otherwise(rate)
    return (
        documents.select(
            "doc_id",
            "source",
            "lang",
            bucket.alias("bucket"),
            rate.cast("int").alias("rate_permille"),
        )
        .filter(F.col("bucket") < F.col("rate_permille"))
    )


def _sample_rate_case(rates: dict[str, int], default_permille: int) -> str:
    whens = " ".join(
        f"WHEN '{src}' THEN {permille}" for src, permille in sorted(rates.items())
    )
    return f"CASE source {whens} ELSE {default_permille} END"


STRATIFIED_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, source, lang,
    {char_poly_hash_sql("CAST(doc_id AS VARCHAR) || ':' || source")} % 1000
      AS bucket,
    CAST({_sample_rate_case(DEFAULT_SAMPLE_RATES, DEFAULT_SAMPLE_PERMILLE)}
      AS INTEGER) AS rate_permille
  FROM documents
)
SELECT doc_id, source, lang, bucket, rate_permille
FROM b WHERE bucket < rate_permille
"""


# ---------------------------------------------------------------------------
# deterministic k-per-group sampling
# ---------------------------------------------------------------------------


def sample_k_per_group(documents: DataFrame, k: int = 3) -> DataFrame:
    """Exactly-k-per-source sampling (vs `stratified_sample`'s
    rate-based form): rank docs within each source by their hash bucket
    and keep the first k — a uniform without-replacement draw that is a
    pure function of the rows. The window is partitioned by source, so
    no global sort; at 100 TB this is the reproducible replacement for
    per-group reservoir sampling."""
    h = char_poly_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    )
    w = Window.partitionBy("source").orderBy(F.col("h"), F.col("doc_id"))
    return (
        documents.select("doc_id", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "rk")
    )


SAMPLE_K_PER_GROUP_SQL = f"""
SELECT doc_id, source,
  CAST(row_number() OVER (PARTITION BY source
    ORDER BY {char_poly_hash_sql("CAST(doc_id AS VARCHAR) || ':' || source")},
             doc_id) AS INTEGER) AS rk
FROM documents
QUALIFY rk <= 3
"""


# ---------------------------------------------------------------------------
# the full curation funnel (composition showcase)
# ---------------------------------------------------------------------------

QUALITY_KEEP_THRESHOLD = 0.75


def curation_funnel(
    documents: DataFrame, quality_threshold: float = QUALITY_KEEP_THRESHOLD
) -> DataFrame:
    """The end-to-end corpus-curation pipeline as ONE query — per-stage
    retention counts for: near-dup clustering (keep canonical docs) ->
    quality floor -> benchmark decontamination -> repetition filter.
    This is the composition a pretraining data pipeline actually runs;
    each stage reuses the registered operator unchanged, so the funnel's
    oracle doubles as an integration check across dedup.py / text.py /
    curation.py.

    Scale: each stage yields a doc_id set; stages intersect via inner
    joins keyed on doc_id (no broadcast needed — both sides are
    corpus-sized, co-partitioned by the same key after the first
    shuffle). Counts are 1-row aggregates unioned at the end."""
    from .dedup import dedup_clusters
    from .text import quality_score

    total = documents.select("doc_id")
    # each stage's doc_id set feeds MULTIPLE count branches (canon is
    # under 4 of the 5) — lazily persist the narrow id frames so the
    # single unioned action computes each heavy stage subplan once
    canon = (
        dedup_clusters(documents)
        .filter(F.col("canonical_doc_id") == F.col("doc_id"))
        .select("doc_id")
        .persist()
    )
    quality_keep = (
        quality_score(documents)
        .filter(F.col("quality_score") >= quality_threshold)
        .select("doc_id")
    )
    s2 = canon.join(quality_keep, "doc_id").persist()
    # decontaminate() emits train docs only: the benchmark slice leaves
    # the corpus here too (it is eval data, not training data)
    decon_keep = (
        decontaminate(documents)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    s3 = s2.join(decon_keep, "doc_id").persist()
    rep_keep = (
        repetition_score(documents)
        .filter(~F.col("repetitive"))
        .select("doc_id")
    )
    s4 = s3.join(rep_keep, "doc_id")

    out = None
    for name, frame in [
        ("0_total", total),
        ("1_near_dedup", canon),
        ("2_quality", s2),
        ("3_decontaminated", s3),
        ("4_final", s4),
    ]:
        c = frame.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )
        out = c if out is None else out.unionByName(c)
    return out


def _funnel_sql() -> str:
    from .dedup import DEDUP_CLUSTERS_SQL
    from .text import QUALITY_SCORE_SQL

    return f"""
WITH clusters AS ({DEDUP_CLUSTERS_SQL}),
quality AS ({QUALITY_SCORE_SQL}),
decon AS ({DECONTAMINATE_SQL}),
rep AS ({REPETITION_SCORE_SQL}),
canon AS (SELECT doc_id FROM clusters WHERE canonical_doc_id = doc_id),
s2 AS (
  SELECT c.doc_id FROM canon c
  JOIN quality q ON q.doc_id = c.doc_id AND q.quality_score >= 0.75
),
s3 AS (
  SELECT s.doc_id FROM s2 s
  JOIN decon d ON d.doc_id = s.doc_id AND NOT d.contaminated
),
s4 AS (
  SELECT s.doc_id FROM s3 s
  JOIN rep r ON r.doc_id = s.doc_id AND NOT r.repetitive
)
SELECT '0_total' AS stage, COUNT(*) AS n_docs FROM documents
UNION ALL SELECT '1_near_dedup', COUNT(*) FROM canon
UNION ALL SELECT '2_quality', COUNT(*) FROM s2
UNION ALL SELECT '3_decontaminated', COUNT(*) FROM s3
UNION ALL SELECT '4_final', COUNT(*) FROM s4
"""


CURATION_FUNNEL_SQL = _funnel_sql()


# ---------------------------------------------------------------------------
# data-mixture weighting + sequence packing (pretraining batch prep)
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 512


def mixture_weights(documents: DataFrame) -> DataFrame:
    """Temperature-scaled source mixture (alpha = 0.5): weight_s ∝
    sqrt(n_s), the standard up-weighting of small sources when sampling a
    pretraining mix. sqrt and / are IEEE-correctly-rounded, so both
    engines derive identical weights (no log/pow in sight). The total
    arrives via a 1-row broadcast cross-join — no partition-less window,
    no driver action."""
    per_source = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scaled = per_source.withColumn("w", F.sqrt(F.col("n_docs")))
    total = scaled.agg(F.sum("w").alias("w_total"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            F.round(F.col("w") / F.col("w_total"), 6).alias("weight"),
            F.round(F.col("w") / F.col("w_total") * 100000)
            .cast("long")
            .alias("per_100k"),
        )
    )


MIXTURE_WEIGHTS_SQL = """
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
scaled AS (SELECT source, n_docs, sqrt(n_docs) AS w FROM per_source),
total AS (SELECT SUM(w) AS w_total FROM scaled)
SELECT source, n_docs,
  round(w / w_total, 6) AS weight,
  CAST(round(w / w_total * 100000) AS BIGINT) AS per_100k
FROM scaled CROSS JOIN total
"""


def pack_sequences(
    documents: DataFrame, budget_tokens: int = PACK_BUDGET_TOKENS
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each source, documents
    are laid end-to-end in doc_id order and cut into fixed-token
    sequences; a doc belongs to the sequence its FIRST token lands in.
    This is the deterministic packing plan a pretraining tokenizer
    executes — computed here as a windowed running sum (partitioned by
    source: no global sort) and an integer bin division.
    """
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    placed = documents.select(
        "doc_id", "source", n_tok.alias("n_tokens")
    ).withColumn("seq_id", F.floor(cum_before / budget_tokens).cast("long"))
    return (
        placed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .select(
            "source",
            "seq_id",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "first_doc_id",
        )
    )


PACK_SEQUENCES_SQL = f"""
WITH placed AS (
  SELECT doc_id, source,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
        PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM documents
)
SELECT source,
  cum_before // {PACK_BUDGET_TOKENS} AS seq_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS first_doc_id
FROM placed
GROUP BY source, cum_before // {PACK_BUDGET_TOKENS}
"""


SPLIT_SALT = "split-v1"
SPLIT_BOUNDS = (80, 90)  # train < 80 <= val < 90 <= test


def split_assignment(id_col) -> F.Column:
    """THE split expression: bucket = cross-engine char hash of
    "<id>:<salt>" mod 100 → train/val/test by SPLIT_BOUNDS. Single
    definition shared by every split consumer (dataset_split,
    curated_snapshot, the leakage audits) so the registered split and
    its audits can never desynchronize."""
    from .hashing import char_poly_hash

    bucket = char_poly_hash(
        F.concat_ws(":", id_col.cast("string"), F.lit(SPLIT_SALT))
    ) % 100
    lo, hi = SPLIT_BOUNDS
    return (
        F.when(bucket < lo, "train").when(bucket < hi, "val").otherwise("test")
    )


def split_case_sql(expr: str) -> str:
    """DuckDB form of `split_assignment` — the same single definition
    for every oracle that references the split."""
    from .hashing import char_poly_hash_sql

    h = char_poly_hash_sql(f"CAST({expr} AS VARCHAR) || ':{SPLIT_SALT}'")
    lo, hi = SPLIT_BOUNDS
    return (
        f"CASE WHEN ({h}) % 100 < {lo} THEN 'train' "
        f"WHEN ({h}) % 100 < {hi} THEN 'val' ELSE 'test' END"
    )


def dataset_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test split (`split_assignment` — pure
    map-side arithmetic, no shuffle for the assignment, stable under
    corpus growth and engine choice). One aggregate over (split, lang)
    reports the resulting composition."""
    split = split_assignment(F.col("doc_id"))
    return (
        documents.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
    )


def _dataset_split_sql() -> str:
    return f"""
SELECT {split_case_sql('doc_id')} AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


DATASET_SPLIT_SQL = _dataset_split_sql()


def source_overlap(documents: DataFrame) -> DataFrame:
    """Vocabulary overlap between corpus sources (corpus diagnostics:
    which slices duplicate each other's content): distinct (source,
    token) reduction first — the only fact-sized shuffle — then the
    pairwise intersection is a token-keyed self-join of the REDUCED
    frame and the Jaccard is integer arithmetic over three counts."""
    st = (
        documents.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    inter = (
        st.alias("x")
        .join(
            st.alias("y"),
            (F.col("x.tok") == F.col("y.tok"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("source_a"), F.col("n_vocab").alias("n_a"))
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("source_b"), F.col("n_vocab").alias("n_b"))
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


SOURCE_OVERLAP_SQL = """
WITH st AS (
  SELECT DISTINCT source, t AS tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE length(t) > 0
),
sizes AS (SELECT source, COUNT(*) AS n_vocab FROM st GROUP BY source),
inter AS (
  SELECT x.source AS source_a, y.source AS source_b, COUNT(*) AS n_common
  FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_common,
       sa.n_vocab AS n_a, sb.n_vocab AS n_b,
       round(i.n_common / CAST(sa.n_vocab + sb.n_vocab - i.n_common AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


SAMPLE_K = 100


def hash_sample_k(documents: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Deterministic global k-sample: order by a per-row hash, take k.
    Spark plans ORDER BY + LIMIT as TakeOrdered (per-partition top-k
    heaps merged on one reducer over k rows each) — no full global
    sort, so this is the scale-safe way to draw a stable pseudo-random
    sample without rand() (reproducible across runs, engines, and
    corpus growth: a doc's key never changes)."""
    from .hashing import sha_prefix_hash

    key = sha_prefix_hash(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("sample-k"))
    )
    return (
        documents.select("doc_id", "lang", "source", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(k)
    )


def _hash_sample_sql() -> str:
    from .hashing import sha_prefix_hash_sql

    h = sha_prefix_hash_sql("CAST(doc_id AS VARCHAR) || ':sample-k'")
    return f"""
SELECT doc_id, lang, source, {h} AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT {SAMPLE_K}
"""


HASH_SAMPLE_K_SQL = _hash_sample_sql()


TOKEN_BUDGET_PER_SOURCE = 50_000


def budget_fill(
    documents: DataFrame, budget_tokens: int = TOKEN_BUDGET_PER_SOURCE
) -> DataFrame:
    """Greedy token-budget planner: each source gets a token quota, docs
    are admitted best-first (average word length as the deterministic
    quality proxy — exact integer micro-units, doc_id tie-break) until
    the running token total would exceed the quota. The decision is a
    per-source windowed cumulative sum — partitioned by source, never a
    global sort — and the output is the bounded per-source admission
    summary a scheduler consumes.

    This is the step between curation and tokenization in a pretraining
    pipeline: mixture weights say WHAT fraction each source deserves;
    the budget fill decides WHICH documents spend it."""
    n_tokens = F.size(F.split("text", " "))
    # avg chars per token in exact micro-units: length(text) is engine-
    # identical and the division is one IEEE op -> floor to micros
    prio = F.floor(
        F.length("text").cast("long") * 1_000_000 / n_tokens
    ).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("prio_micros"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = documents.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        prio.alias("prio_micros"),
    )
    admitted = (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )
    return admitted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_admitted"),
        F.max("cum_tokens").alias("tokens_used"),
        F.min("prio_micros").alias("worst_prio_micros"),
        F.max("prio_micros").alias("best_prio_micros"),
    )


BUDGET_FILL_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(floor(length(text) * 1000000 / len(string_split(text, ' ')))
         AS BIGINT) AS prio_micros
  FROM documents
),
cum AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY prio_micros DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_tokens
  FROM scored
)
SELECT source, COUNT(*) AS n_admitted,
  MAX(cum_tokens) AS tokens_used,
  MIN(prio_micros) AS worst_prio_micros,
  MAX(prio_micros) AS best_prio_micros
FROM cum WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
GROUP BY source
"""


def lang_drift(documents: DataFrame) -> DataFrame:
    """Per-source language-distribution drift vs the corpus-wide mix: a
    chi-square-style divergence sum((p_sl - p_l)^2 / p_l) over languages
    — the monitor a multi-source pipeline alarms on when one feed's
    language mix shifts. Log-free (cross-engine determinism: only +,-,
    *,/ in a fixed order on exact integer counts), computed from two
    tiny aggregates: (source, lang) counts and corpus lang counts
    broadcast back. Output is one bounded row per source."""
    sl = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_sl")
    )
    s_tot = documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    l_tot = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_tot = documents.count()  # bounded driver scalar (one long)
    # the FULL source x lang grid (tiny x tiny cross join), not just the
    # observed pairs: a language a source has ZERO documents in carries
    # the ((0 - p_l)^2 / p_l) term — dropping it (the inner-join form)
    # understates exactly the feed-broke-entirely drift this monitor
    # exists to catch
    grid = s_tot.crossJoin(F.broadcast(l_tot))
    n_sl = F.coalesce("n_sl", F.lit(0).cast("long"))
    term = (
        (n_sl / F.col("n_s") - F.col("n_l") / F.lit(n_tot))
        * (n_sl / F.col("n_s") - F.col("n_l") / F.lit(n_tot))
        / (F.col("n_l") / F.lit(n_tot))
    )
    return (
        grid.join(sl, ["source", "lang"], "left")
        .select(
            "source",
            term.alias("t"),
            (n_sl > 0).alias("present"),
        )
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.round(F.col("t") * 1_000_000_000).cast("long"))
                / 1_000_000_000.0,
                6,
            ).alias("chi2_drift"),
            F.count(F.when(F.col("present"), F.lit(1))).alias("n_langs"),
        )
    )


LANG_DRIFT_SQL = """
WITH sl AS (
  SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY source, lang
),
s_tot AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
l_tot AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
n_tot AS (SELECT COUNT(*) AS n FROM documents),
grid AS (SELECT s.source, s.n_s, l.lang, l.n_l FROM s_tot s CROSS JOIN l_tot l),
terms AS (
  SELECT g.source,
    (COALESCE(sl.n_sl, 0) / g.n_s - g.n_l / n_tot.n)
      * (COALESCE(sl.n_sl, 0) / g.n_s - g.n_l / n_tot.n)
      / (g.n_l / n_tot.n) AS t,
    COALESCE(sl.n_sl, 0) > 0 AS present
  FROM grid g
  LEFT JOIN sl USING (source, lang)
  CROSS JOIN n_tot
)
SELECT source,
  round(CAST(SUM(CAST(round(t * 1000000000) AS BIGINT)) AS BIGINT)
        / 1000000000.0, 6) AS chi2_drift,
  COUNT(CASE WHEN present THEN 1 END) AS n_langs
FROM terms GROUP BY source
"""


# ---------------------------------------------------------------------------
# end-to-end curated snapshot (filter -> dedup -> decontaminate -> split
# -> MATERIALIZE), manifest read back from the written files
# ---------------------------------------------------------------------------


def curated_snapshot(documents: DataFrame) -> DataFrame:
    """[EXT] The curation pipeline's terminal step: actually WRITE the
    curated corpus. Survivors are the intersection of three oracle-
    checked stages, each reused unchanged — exact-dedup winners
    (dedup.exact_dedup), near-dup cluster canonicals
    (dedup.dedup_clusters over the shared pair-graph artifact), and
    uncontaminated train docs (decontaminate: held-out docs themselves
    are excluded — eval data never lands in a training snapshot). The
    split assignment is the registered hash split; the snapshot is
    written PARTITIONED BY SPLIT (the layout a trainer consumes — one
    directory per split, prunable), and the returned manifest is
    aggregated from a READ-BACK of the written files, so the query pins
    the whole write/read lifecycle, not just the plan.

    Scale shape: three doc_id-keyed joins sharing one key (AQE reuses
    the clustering), a map-side split expression, one partitioned write.
    Nothing fact-sized shuffles more than the dedup stages already did.
    """
    import os

    from .artifacts import scratch_dir
    from .dedup import dedup_clusters, exact_dedup

    winners = exact_dedup(documents).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    canon = (
        dedup_clusters(documents)
        .filter(F.col("doc_id") == F.col("canonical_doc_id"))
        .select("doc_id")
    )
    clean = (
        decontaminate(documents)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    split = split_assignment(F.col("doc_id"))
    survivors = (
        documents.join(winners, "doc_id")
        .join(canon, "doc_id")
        .join(clean, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            split.alias("split"),
        )
    )
    out = os.path.join(scratch_dir("curated_snapshot_"), "snapshot")
    survivors.write.partitionBy("split").mode("overwrite").parquet(out)
    return (
        documents.sparkSession.read.parquet(out)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _curated_snapshot_sql() -> str:
    from .dedup import DEDUP_CLUSTERS_SQL

    return f"""
WITH clusters AS (SELECT * FROM ({DEDUP_CLUSTERS_SQL})),
decon AS (SELECT * FROM ({DECONTAMINATE_SQL})),
winners AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
survivors AS (
  SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
         {split_case_sql('d.doc_id')} AS split
  FROM documents d
  JOIN winners w ON w.doc_id = d.doc_id
  JOIN clusters c ON c.doc_id = d.doc_id AND c.canonical_doc_id = d.doc_id
  JOIN (SELECT doc_id AS x_doc_id, contaminated FROM decon) x
    ON x.x_doc_id = d.doc_id AND NOT x.contaminated
)
SELECT split, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM survivors GROUP BY split, source
"""


CURATED_SNAPSHOT_SQL = _curated_snapshot_sql()


# ---------------------------------------------------------------------------
# cross-split near-dup leakage audit
# ---------------------------------------------------------------------------


def _pair_leakage_report(
    pairs: DataFrame, assign: DataFrame
) -> DataFrame:
    """Count near-dup pairs per unordered (split_a, split_b) side pair —
    the shared tail of both leakage audits (they differ only in how
    `assign` maps doc_id → split)."""
    sided = (
        pairs.join(assign.toDF("doc_a", "split_a"), "doc_a")
        .join(assign.toDF("doc_b", "split_b"), "doc_b")
        .select(
            F.least("split_a", "split_b").alias("split_a"),
            F.greatest("split_a", "split_b").alias("split_b"),
        )
    )
    return sided.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
    ).withColumn(
        "leaks", F.col("split_a") != F.col("split_b")
    )


def split_leakage(documents: DataFrame) -> DataFrame:
    """[EXT] Near-duplicate leakage across train/val/test: a random hash
    split CANNOT see near-duplicates, so paraphrases of one document
    land in different splits and the eval set leaks into training —
    the reason production pipelines split by CLUSTER, not by document.
    This audit counts near-dup pairs straddling each (split_a, split_b)
    combination; the off-diagonal counts are the leak.

    The pair graph is the shared per-snapshot artifact (one LSH pass);
    the split is the registered hash assignment recomputed map-side on
    both endpoints — two broadcast-sized joins, no new fact shuffle."""
    from .dedup import shared_minhash_pairs

    assign = documents.select(
        "doc_id", split_assignment(F.col("doc_id")).alias("split")
    )
    pairs = shared_minhash_pairs(documents).select("doc_a", "doc_b")
    return _pair_leakage_report(pairs, assign)


def _split_leakage_sql() -> str:
    from .dedup import MINHASH_PAIRS_SQL

    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({MINHASH_PAIRS_SQL})),
sided AS (
  SELECT LEAST({split_case_sql('doc_a')}, {split_case_sql('doc_b')})
           AS split_a,
         GREATEST({split_case_sql('doc_a')}, {split_case_sql('doc_b')})
           AS split_b
  FROM pairs
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
       split_a <> split_b AS leaks
FROM sided GROUP BY split_a, split_b
"""


SPLIT_LEAKAGE_SQL = _split_leakage_sql()


def cluster_split_leakage(documents: DataFrame) -> DataFrame:
    """[EXT] The fix for `split_leakage`: assign splits by the NEAR-DUP
    CLUSTER's canonical id, not the document id — every member of a
    component lands in one split, so cross-split near-dup pairs are
    zero BY CONSTRUCTION (the off-diagonal rows vanish; the oracle
    proves it, not just asserts it). Same artifact-backed pair graph,
    one extra doc_id-keyed join against the cluster labels."""
    from .dedup import dedup_clusters, shared_minhash_pairs

    labels = dedup_clusters(documents)
    assign = labels.select(
        "doc_id", split_assignment(F.col("canonical_doc_id")).alias("split")
    )
    pairs = shared_minhash_pairs(documents).select("doc_a", "doc_b")
    return _pair_leakage_report(pairs, assign)


def _cluster_split_leakage_sql() -> str:
    from .dedup import DEDUP_CLUSTERS_SQL, MINHASH_PAIRS_SQL

    return f"""
WITH clusters AS (SELECT * FROM ({DEDUP_CLUSTERS_SQL})),
assign AS (
  SELECT doc_id, {split_case_sql('canonical_doc_id')} AS split
  FROM clusters
),
pairs AS (SELECT doc_a, doc_b FROM ({MINHASH_PAIRS_SQL})),
sided AS (
  SELECT LEAST(a.split, b.split) AS split_a,
         GREATEST(a.split, b.split) AS split_b
  FROM pairs p
  JOIN assign a ON a.doc_id = p.doc_a
  JOIN assign b ON b.doc_id = p.doc_b
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
       split_a <> split_b AS leaks
FROM sided GROUP BY split_a, split_b
"""


CLUSTER_SPLIT_LEAKAGE_SQL = _cluster_split_leakage_sql()
