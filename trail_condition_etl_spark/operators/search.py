"""[EXT] Keyword search over the documents table: inverted-index build
and conjunctive (AND) term queries — the retrieval counterpart of the
similarity operators in operators/similarity.py.

Scale shape:
* the index build explodes (doc, token) pairs once (narrow), reduces to
  one row per (token, doc) map-side, then groups by token; posting
  lists are CAPPED per token (rank window before the collect) so no
  single group materializes an unbounded array — at 100 TB hot tokens
  would otherwise collect millions of ids into one row. df (document
  frequency) is still exact over all docs, computed before the cap.
* the query side never builds the index: a conjunctive term filter is a
  groupBy(doc) counting distinct matched terms — one shuffle on doc_id,
  with the token filter pushed into the scan projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_POSTINGS = 50
QUERY_TERMS = ("fast", "merge", "window")


def inverted_index(documents: DataFrame, cap: int = MAX_POSTINGS) -> DataFrame:
    """token -> (exact df, first-`cap` posting list ordered by doc_id).

    The posting list is emitted as a comma-joined STRING, not an
    ArrayType column: registered query outputs must be flat scalars so
    every harness (driver canonicalizer, DuckDB oracle hash, pandas
    sort) can order and hash them — the same convention as timestamps
    (always formatted strings, never raw)."""
    pairs = (
        documents.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
        )
    )
    ranked = pairs.withColumn(
        "rk", F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    )
    return (
        ranked.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rk") <= cap, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


INVERTED_INDEX_SQL = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rk
  FROM pairs
)
SELECT token, COUNT(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         FILTER (WHERE rk <= 50) AS postings
FROM ranked GROUP BY token
"""


def keyword_search(
    documents: DataFrame, terms: tuple[str, ...] = QUERY_TERMS, k: int = 10
) -> DataFrame:
    """Conjunctive keyword query: documents containing ALL terms, ranked
    by total term frequency (ties to smallest doc_id), top k."""
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token").isin(*terms))
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count_distinct("token").alias("n_terms"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id", "total_tf")
        .orderBy(F.desc("total_tf"), "doc_id")
        .limit(k)
    )


KEYWORD_SEARCH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
matched AS (
  SELECT doc_id, COUNT(DISTINCT token) AS n_terms, COUNT(*) AS total_tf
  FROM toks WHERE token IN ('fast', 'merge', 'window')
  GROUP BY doc_id
)
SELECT doc_id, total_tf FROM matched
WHERE n_terms = 3
ORDER BY total_tf DESC, doc_id
LIMIT 10
"""


HYBRID_TERMS = ("fast", "merge")
HYBRID_K = 10


def hybrid_retrieval(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Hybrid retrieval: a disjunctive keyword stage produces the
    candidate set (small — only matching docs survive), then a semantic
    stage reranks candidates by cosine similarity to the query document
    (doc 0's embedding, broadcast as one row). The corpus embedding
    table is touched ONLY for candidate ids (broadcast semi-sized join)
    — at 100 TB the keyword index prunes before any vector math runs.
    Testdata ships embeddings aligned 1:1 with documents
    (vec_id = doc_id)."""
    from .similarity import _dot, with_norm

    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token").isin(*HYBRID_TERMS))
    cands = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tf"))
    emb = with_norm(embeddings)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("emb_d").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        emb.join(F.broadcast(cands), emb.vec_id == cands.doc_id)
        .crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select(
            "doc_id",
            "tf",
            F.round(
                _dot(F.col("emb_d"), F.col("qv")) / (F.col("norm") * F.col("qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(
        F.desc("cos_sim"), F.desc("tf"), "doc_id"
    ).limit(HYBRID_K)


HYBRID_RETRIEVAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cands AS (
  SELECT doc_id, COUNT(*) AS tf FROM toks
  WHERE token IN ('fast', 'merge') GROUP BY doc_id
),
emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
qv AS (SELECT e AS q, nrm AS qn FROM emb WHERE vec_id = 0)
SELECT c.doc_id, c.tf,
       round(list_dot_product(e.e, qv.q) / (e.nrm * qv.qn), 6) AS cos_sim
FROM cands c JOIN emb e ON e.vec_id = c.doc_id CROSS JOIN qv
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, tf DESC, doc_id
LIMIT {HYBRID_K}
"""
