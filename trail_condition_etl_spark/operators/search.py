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
    """token -> (exact df, first-`cap` posting list ordered by doc_id)."""
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
            F.array_sort(
                F.collect_list(F.when(F.col("rk") <= cap, F.col("doc_id")))
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
       list(doc_id ORDER BY doc_id) FILTER (WHERE rk <= 50) AS postings
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
