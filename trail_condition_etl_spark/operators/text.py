"""[EXT] Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11,
BASELINE.json north_star): token stats, quality scoring, language-ID
heuristic, document fingerprinting.

All computed with built-in `pyspark.sql.functions` (JVM-side, codegen'd);
no Python UDFs anywhere. Array work uses higher-order functions
(transform/filter/aggregate), which run inside WholeStageCodegen.

Scale: every operator here is embarrassingly parallel per-document
(narrow maps) — including the fingerprint, whose token ids are the
cross-engine Horner char hash (operators/hashing.py): no vocabulary, no
global sort, no shuffle before the (optional) per-doc aggregation, and
still oracle-checked. An xxhash64 variant (`doc_fingerprint_fast`) is
kept for corpora wanting a 64-bit hash range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import char_poly_hash, char_poly_hash_sql

STOPWORDS = ("the", "a", "of", "and", "to")

# small deterministic keyword sets for the language-ID heuristic
LANG_KEYWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("table", "row", "column"),
    "es": ("data", "value", "stream"),
    "fr": ("query", "filter", "join"),
    "zh": ("hash", "merge", "sort"),
}


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, char lengths.

    The BPE-ish regex count approximates subword token counts the way
    data-pipeline heuristics do (length/4 and word-piece splits).
    """
    toks = _toks()
    return documents.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        # BPE-ish proxy: ~4 chars per subword token, per word
        F.aggregate(
            F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_bpeish_tokens"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id, lang,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  length(text) AS n_chars_actual,
  CAST(list_sum(list_transform(string_split(text, ' '),
      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpeish_tokens
FROM documents
"""


def quality_score(documents: DataFrame) -> DataFrame:
    """Quality scoring: length / stopword-ratio / distinct-ratio features
    combined into a deterministic [0,1]-ish score — the standard cheap
    pre-filter in training-data pipelines.
    """
    toks = _toks()
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_dist = F.size(F.array_distinct(toks))
    avg_tok_len = (F.length("text") - (n_tok - 1)) / n_tok
    stop_ratio = n_stop / n_tok
    dist_ratio = n_dist / n_tok
    length_factor = F.least(F.length("text") / 200.0, F.lit(1.0))
    score = (
        0.4 * length_factor + 0.3 * dist_ratio + 0.3 * (1.0 - stop_ratio)
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").alias("n_chars"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(dist_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


QUALITY_SCORE_SQL = """
WITH feat AS (
  SELECT doc_id, lang, source, n_chars,
    len(string_split(text, ' ')) AS n_tok,
    len(list_filter(string_split(text, ' '),
        t -> t IN ('the','a','of','and','to'))) AS n_stop,
    len(list_distinct(string_split(text, ' '))) AS n_dist,
    length(text) AS n_len
  FROM documents
)
SELECT doc_id, lang, source, n_chars,
  round((n_len - (n_tok - 1)) / (n_tok * 1.0), 6) AS avg_token_len,
  round(n_stop / (n_tok * 1.0), 6) AS stopword_ratio,
  round(n_dist / (n_tok * 1.0), 6) AS distinct_ratio,
  round(0.4 * least(n_len / 200.0, 1.0)
      + 0.3 * (n_dist / (n_tok * 1.0))
      + 0.3 * (1.0 - n_stop / (n_tok * 1.0)), 6) AS quality_score
FROM feat
"""


def language_id(documents: DataFrame) -> DataFrame:
    """Language-ID heuristic: score each candidate language by keyword
    occurrences; argmax with lexicographic tie-break. (An n-gram
    frequency heuristic — the standard cheap langid in data pipelines;
    the synthetic corpus shares one vocabulary so predictions are
    arbitrary-but-deterministic, which is what the correctness check
    needs.)
    """
    toks = _toks()
    scores = []
    for lang, kws in sorted(LANG_KEYWORDS.items()):
        arr = F.array(*[F.lit(k) for k in kws])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                    "score"
                ),
                # negative-lex trick not needed: array_max picks max struct
                # by (score, lang); to make ties pick the SMALLEST lang we
                # order langs descending so later (smaller) wins on equal
                # score is wrong — instead compare explicitly below.
                F.lit(lang).alias("lang"),
            )
        )
    # fold for argmax: larger score wins; on tie, lexicographically
    # smaller lang wins (deterministic in both engines)
    best = scores[0]
    for s in scores[1:]:
        best = F.when(
            (s["score"] > best["score"])
            | ((s["score"] == best["score"]) & (s["lang"] < best["lang"])),
            s,
        ).otherwise(best)
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best["lang"].alias("predicted_lang"),
        best["score"].alias("keyword_hits"),
        (best["lang"] == F.col("lang")).alias("agrees"),
    )


_LANGID_SCORE = (
    "len(list_filter(string_split(text, ' '), t -> t IN ({kws}))) "
)


def _langid_sql() -> str:
    cases = []
    for lang, kws in sorted(LANG_KEYWORDS.items()):
        kwlist = ",".join(f"'{k}'" for k in kws)
        cases.append(
            f"STRUCT_PACK(score := {_LANGID_SCORE.format(kws=kwlist)}, lang := '{lang}')"
        )
    fold = cases[0]
    for c in cases[1:]:
        fold = (
            f"CASE WHEN ({c}).score > ({fold}).score OR "
            f"(({c}).score = ({fold}).score AND ({c}).lang < ({fold}).lang) "
            f"THEN {c} ELSE {fold} END"
        )
    return f"""
WITH best AS (
  SELECT doc_id, lang AS labeled_lang, {fold} AS b FROM documents
)
SELECT doc_id, labeled_lang, b.lang AS predicted_lang,
       CAST(b.score AS INT) AS keyword_hits,
       b.lang = labeled_lang AS agrees
FROM best
"""


LANGUAGE_ID_SQL = _langid_sql()


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprinting via position-weighted polynomial over
    Horner-hashed token ids, mod a prime — a rolling-hash-style content
    fingerprint.

    fp(doc) = sum_i ((pos_i + 1) * h(token_i)) mod 1_000_003

    Entirely per-row (zip_with the token array with its index sequence,
    fold) — a narrow map over the scan, no explode/shuffle at any scale;
    the identical arithmetic runs in DuckDB, so it stays oracle-checked.
    """
    toks = _toks()
    fp = (
        F.aggregate(
            F.zip_with(
                toks,
                F.sequence(F.lit(1), F.size(toks)),
                lambda t, i: i.cast("long") * char_poly_hash(t),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        % 1_000_003
    )
    return documents.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
  CAST(list_sum(list_transform(string_split(text, ' '),
      (t, i) -> i * {char_poly_hash_sql('t')})) % 1000003 AS BIGINT) AS fingerprint,
  len(string_split(text, ' ')) AS n_tokens
FROM documents
"""


def doc_fingerprint_fast(documents: DataFrame) -> DataFrame:
    """xxhash64 variant of `doc_fingerprint` (64-bit hash range for
    production corpora). Same narrow per-row shape; not oracle-checkable
    because DuckDB has no xxhash64 — covered by a consistency test
    against `doc_fingerprint` instead."""
    toks = _toks()
    fp = (
        F.aggregate(
            F.zip_with(
                toks,
                F.sequence(F.lit(1), F.size(toks)),
                lambda t, i: i.cast("long")
                * F.pmod(F.xxhash64(t), F.lit(1_000_003)),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        % 1_000_003
    )
    return documents.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def ngram_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k token bigrams per language by DOCUMENT frequency (distinct
    docs containing the gram) — the vocabulary profile step of a
    training-data pipeline. Bigram arrays are built per-row (zip_with a
    sliced token array — narrow); the only shuffles are the count agg
    and the tiny per-language top-k window."""
    toks = _toks()
    grams = F.array_distinct(
        F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.size(toks)),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda x: x.isNotNull(),
        )
    )
    counts = (
        documents.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n_docs"), "gram")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lang", "rk", "gram", "n_docs")
    )


NGRAM_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
    unnest(string_split(text, ' ')) AS token,
    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
  FROM documents
),
grams AS (
  SELECT DISTINCT a.doc_id, a.lang, a.token || ' ' || b.token AS gram
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
counts AS (
  SELECT lang, gram, COUNT(*) AS n_docs FROM grams GROUP BY lang, gram
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n_docs DESC, gram) AS rk
  FROM counts
)
SELECT lang, rk, gram, n_docs FROM ranked WHERE rk <= 5
"""


def tfidf_topk(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf, with a
    BM25-style RATIONAL idf, (N - df + 0.5) / (df + 0.5), instead of the
    textbook log form: +,-,*,/ are IEEE-correctly-rounded and therefore
    bit-identical across engines, while ln() may differ in the last ulp
    between libms — which would make cross-engine ranking undecidable at
    the margin. Determinism of the ORDER is what the oracle checks.

    Shuffle budget: tf agg keyed (doc, term); df agg keyed term; the
    tf⋈df join is term-keyed (stopword skew is modest after the per-doc
    distinct; AQE skew-split covers the tail); final per-doc top-k is a
    partitioned window. N arrives via a 1-row broadcast cross-join — no
    driver-side count() action in the plan.
    """
    toks = F.explode(F.split("text", " ")).alias("term")
    flat = documents.select("doc_id", toks)
    tf = flat.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_len = documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_terms")
    )
    df_ = flat.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") / F.col("n_terms")) * (
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "rk", "term", F.round("score", 6).alias("score"))
    )


TFIDF_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
doc_len AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_terms FROM documents
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
    (tf.tf / (doc_len.n_terms * 1.0))
      * ((nd.n_docs - df.df + 0.5) / (df.df + 0.5)) AS score
  FROM tf
  JOIN doc_len USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN nd
)
SELECT doc_id,
  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
    AS INTEGER) AS rk,
  term, round(score, 6) AS score
FROM scored
QUALIFY rk <= 3
"""


QUALITY_MAD_SCHEMA = "source string, n long, median double, mad double"


def quality_mad_by_source(documents: DataFrame) -> DataFrame:
    """Per-source robust quality statistics (exact median + median
    absolute deviation) via `groupBy().applyInPandas` — the grouped-map
    Arrow seam, used where the statistic is an exact order statistic
    that mergeable JVM aggregates can't express. (At 100 TB you would
    reach for percentile_approx — operators/sketches.py — unless the
    exact value is contractual; this operator is the seam demo AND the
    exact fallback.) One shuffle keyed by source; each group's rows
    arrive as a single Arrow batch.

    pandas' even-n median is the midpoint average — identical to
    DuckDB's quantile_cont(0.5), so the oracle reproduces it exactly.
    """
    q = quality_score(documents).select("source", "quality_score")

    def mad_stats(pdf):
        import pandas as pd

        med = pdf["quality_score"].median()
        mad = (pdf["quality_score"] - med).abs().median()
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "n": len(pdf),
                    "median": round(med, 6),
                    "mad": round(mad, 6),
                }
            ]
        )

    return q.groupBy("source").applyInPandas(mad_stats, QUALITY_MAD_SCHEMA)


QUALITY_MAD_SQL = f"""
WITH q AS ({QUALITY_SCORE_SQL}),
med AS (
  SELECT source, COUNT(*) AS n, median(quality_score) AS m
  FROM q GROUP BY source
)
SELECT m.source, m.n,
  round(m.m, 6) AS median,
  round(median(abs(q.quality_score - m.m)), 6) AS mad
FROM q JOIN med m USING (source)
GROUP BY m.source, m.n, m.m
"""


def heavy_hitters(documents: DataFrame, min_share: float = 0.005) -> DataFrame:
    """Corpus heavy hitters: tokens whose frequency is >= min_share of
    all tokens. One explode + one partial+final count agg (map-side
    combine absorbs the per-doc repetition), the corpus-wide total is a
    second 1-row aggregate cross-joined back (broadcast) — never an
    empty-partitionBy window. Share division is the same IEEE op on the
    same integers in both engines."""
    toks = documents.select(F.explode(_toks()).alias("tok")).filter(
        F.length("tok") > 0
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("total_n"), 6))
        .filter(F.col("n") / F.col("total_n") >= min_share)
        .select("tok", "n", "share")
    )


HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT tok, COUNT(*) AS n FROM toks WHERE length(tok) > 0 GROUP BY tok
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM counts)
SELECT tok, n, round(n / CAST(total_n AS DOUBLE), 6) AS share
FROM counts CROSS JOIN total
WHERE n / CAST(total_n AS DOUBLE) >= 0.005
"""


def regex_kit(documents: DataFrame) -> DataFrame:
    """Regex scalar surface (§2.7): extract / extract-group / replace /
    match-count per row — all JVM expressions inside whole-stage
    codegen. Patterns stick to character classes so Java-regex and
    RE2-family oracles agree; both engines return '' on no-match."""
    return documents.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.regexp_extract("text", "([a-z]+)[0-9]", 1).alias("word_before_digit"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("len_no_vowels"),
        F.size(F.split("text", "[0-9]+")).cast("long").alias("n_digit_splits"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
    )


REGEX_KIT_SQL = """
SELECT doc_id,
  regexp_extract(text, '[0-9]+') AS first_number,
  regexp_extract(text, '([a-z]+)[0-9]', 1) AS word_before_digit,
  length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels,
  len(regexp_split_to_array(text, '[0-9]+')) AS n_digit_splits,
  regexp_matches(text, '[0-9]') AS has_digit
FROM documents
"""


def array_kit(documents: DataFrame) -> DataFrame:
    """Array scalar surface (§2.7): sort, slice, distinct, set-ops and
    higher-order transforms over the token array — per-row narrow
    expressions, no shuffle at all."""
    toks = _toks()
    return documents.select(
        "doc_id",
        F.concat_ws("|", F.slice(F.sort_array(toks), 1, 3)).alias("first3_sorted"),
        # NB: distinct THEN sort — DuckDB's list_distinct does not
        # preserve first-seen order, so order-stable output re-sorts
        F.concat_ws("|", F.slice(F.sort_array(F.array_distinct(toks)), 1, 2)).alias(
            "first2_distinct_sorted"
        ),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.array_intersect(toks, F.array(F.lit("data"), F.lit("query"))))
        .cast("long")
        .alias("n_keyword_hits"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: F.greatest(acc, x),
        ).alias("longest_token_len"),
    )


ARRAY_KIT_SQL = """
SELECT doc_id,
  array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), '|')
    AS first3_sorted,
  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 2), '|')
    AS first2_distinct_sorted,
  list_contains(string_split(text, ' '), 'data') AS has_data,
  len(list_intersect(string_split(text, ' '), ['data', 'query']))
    AS n_keyword_hits,
  CAST(list_max(list_transform(string_split(text, ' '), t -> length(t)))
       AS BIGINT) AS longest_token_len
FROM documents
"""


CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def chunk_documents(documents: DataFrame) -> DataFrame:
    """RAG-style document chunking: fixed-size character windows with
    overlap, as a narrow sequence+explode — one row per chunk, no
    shuffle at all. Each chunk carries its offset and a content id
    (sha2-prefix of the chunk text) so downstream embedding/dedup
    stages can key on chunks exactly like documents."""
    from .hashing import sha_prefix_hash

    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunked = documents.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_ix", "start_char"),
        F.col("text"),
    ).withColumn(
        "chunk", F.substring(F.col("text"), F.col("start_char") + 1, CHUNK_CHARS)
    )
    return chunked.select(
        "doc_id",
        "chunk_ix",
        F.col("start_char").cast("long").alias("start_char"),
        F.length("chunk").cast("long").alias("chunk_len"),
        sha_prefix_hash(F.col("chunk")).alias("chunk_id"),
    )


def _chunk_sql() -> str:
    from .hashing import sha_prefix_hash_sql

    h = sha_prefix_hash_sql(f"substr(text, start_char + 1, {CHUNK_CHARS})")
    return f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(length(text) - 1, 0),
                                {CHUNK_STRIDE})) AS start_char,
         unnest(generate_series(0,
             greatest(length(text) - 1, 0) // {CHUNK_STRIDE}))
           AS chunk_ix
  FROM documents
)
SELECT doc_id, CAST(chunk_ix AS INT) AS chunk_ix,
       CAST(start_char AS BIGINT) AS start_char,
       CAST(length(substr(text, start_char + 1, {CHUNK_CHARS})) AS BIGINT)
         AS chunk_len,
       {h} AS chunk_id
FROM starts
"""


CHUNK_DOCUMENTS_SQL = _chunk_sql()


def map_kit(documents: DataFrame) -> DataFrame:
    """MapType surface (SURVEY §1.2): per-doc token->count map built
    with map_from_arrays, consumed with element_at / map_entries /
    map_values — all narrow per-row expressions (work bounded by the
    doc's own token count). The oracle recomputes the same scalars from
    the token multiset, so map construction/lookup semantics are pinned
    without DuckDB needing Spark's MAP representation."""
    toks = _toks()
    ds = F.array_sort(F.array_distinct(toks))
    counts = F.transform(
        ds, lambda t: F.size(F.filter(toks, lambda x: x == t))
    )
    m = F.map_from_arrays(ds, counts)
    entries = F.map_entries(m)
    best = F.array_min(
        F.transform(
            entries,
            lambda e: F.struct((-e["value"]).alias("negc"), e["key"].alias("k")),
        )
    )
    return documents.select(
        "doc_id",
        F.size(m).cast("long").alias("n_keys"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_tokens"),
        F.coalesce(F.element_at(m, F.lit("data")), F.lit(0))
        .cast("long")
        .alias("data_count"),
        best["k"].alias("top_token"),
        (-best["negc"]).cast("long").alias("top_count"),
    )


MAP_KIT_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
per_tok AS (
  SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS total_tokens,
         CAST(COALESCE(SUM(CASE WHEN t = 'data' THEN c END), 0) AS BIGINT)
           AS data_count,
         (MIN({'negc': -c, 'k': t})).k AS top_token,
         CAST(-(MIN({'negc': -c, 'k': t})).negc AS BIGINT) AS top_count
  FROM per_tok GROUP BY doc_id
)
SELECT * FROM per_doc
"""


BIGRAM_MIN_COUNT = 30


def token_bigrams(documents: DataFrame) -> DataFrame:
    """Corpus bigram model: P(b | a) for adjacent token pairs. Pair
    extraction is the same narrow zip_with-adjacent trick as shingling
    (no window, no explode-join); one count aggregation; the
    denominator marginals are a tiny re-aggregate broadcast back.
    Output bounded by a count floor, never a global-sort top-k."""
    toks = F.split("text", " ")
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.size(toks)),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    exploded = (
        documents.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.b").isNotNull())
        .select("p.a", "p.b")
    )
    counts = exploded.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    marg = counts.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    return (
        counts.filter(F.col("n_ab") >= BIGRAM_MIN_COUNT)
        .join(F.broadcast(marg), "a")
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias("p_b_given_a"),
        )
    )


TOKEN_BIGRAMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
pairs AS (
  SELECT ts[i] AS a, ts[i + 1] AS b
  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks)
),
counts AS (SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY a, b),
marg AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM counts GROUP BY a)
SELECT c.a, c.b, c.n_ab, m.n_a,
       round(c.n_ab / CAST(m.n_a AS DOUBLE), 6) AS p_b_given_a
FROM counts c JOIN marg m USING (a)
WHERE c.n_ab >= {BIGRAM_MIN_COUNT}
"""


BPE_TOP_K = 20


def bpe_merge_candidates(documents: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """The first BPE merge iteration: corpus-wide counts of adjacent
    character pairs WITHIN whitespace-pretokenized words, top-k by
    frequency — the statistic a tokenizer trainer computes before its
    first merge. Pair construction is the narrow zip_with ladder over
    the char array (no explode until the pair rows); the only wide ops
    are one (pair -> count) aggregation with map-side combine and the
    TakeOrderedAndProject top-k (count DESC, pair ASC tie-break)."""
    toks = F.explode(F.split("text", " ")).alias("tok")
    chars = F.split(F.col("tok"), "")
    pairs = F.filter(
        F.zip_with(
            chars,
            F.slice(chars, 2, F.size(chars)),
            lambda a, b: F.concat(a, b),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        documents.select(toks)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(k)
    )


BPE_MERGE_CANDIDATES_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
chars AS (
  SELECT regexp_split_to_array(tok, '') AS cs FROM toks
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(cs)), i -> cs[i] || cs[i+1]))
    AS pair
  FROM chars
)
SELECT pair, COUNT(*) AS n FROM pairs
GROUP BY pair ORDER BY n DESC, pair LIMIT {BPE_TOP_K}
"""


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns kept to syntax with IDENTICAL semantics in Java regex (Spark)
# and RE2 (DuckDB): literal chars, char classes, bounded repetition.
EMAIL_RE = "user[0-9]+@example\\.com"
PHONE_RE = "555-[0-9]{4}"


def pii_scrub_report(documents: DataFrame) -> DataFrame:
    """[EXT] PII redaction pass + per-source audit, the pre-training
    compliance step every corpus pipeline runs before packing: replace
    email/phone matches with typed placeholder tokens and report how
    much was removed, per source.

    The shipped corpus is synthetic and PII-free, so the query PLANTS
    deterministic PII first (doc_id-keyed emails on every 5th doc,
    phone numbers on every 7th) and then scrubs it — the operator under
    test is the scrub+audit, and the oracle replays plant and scrub
    identically. All narrow per-row regex work in one projection; the
    only shuffle is the final per-source rollup."""
    planted = documents.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10_000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    scrubbed = planted.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.length("text").alias("len_before"),
        F.length(
            F.regexp_replace(
                F.regexp_replace("text", EMAIL_RE, "[EMAIL]"),
                PHONE_RE,
                "[PHONE]",
            )
        ).alias("len_after"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum(F.col("len_before") - F.col("len_after")).alias("chars_removed"),
    )


PII_SCRUB_SQL = f"""
WITH planted AS (
  SELECT doc_id, source,
    CASE
      WHEN doc_id % 5 = 0 THEN
        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN doc_id % 7 = 0 THEN
        text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      ELSE text
    END AS text
  FROM documents
),
scrubbed AS (
  SELECT source,
    CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
    CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
    length(text) AS len_before,
    length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g')) AS len_after
  FROM planted
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS n_emails,
       CAST(SUM(n_phones) AS BIGINT) AS n_phones,
       CAST(SUM(len_before - len_after) AS BIGINT) AS chars_removed
FROM scrubbed GROUP BY source
"""
