"""Curation-operator invariants beyond the SQL-oracle parity check
(tests/test_parity.py covers decontaminate / repetition_score /
stratified_sample row-for-row): edge-case guards and the determinism
properties the sampling contract promises."""

from __future__ import annotations

from trail_condition_etl_spark import catalog
from trail_condition_etl_spark.operators import curation
from conftest import SF_DIR


def _docs(spark):
    return catalog.load_table(spark, SF_DIR, "documents")


def _mini(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_decontaminate_excludes_benchmark_and_guards_short_docs(spark):
    df = _mini(
        spark,
        [
            # benchmark doc (doc_id % 20 == 0)
            (0, "alpha beta gamma delta epsilon zeta", "en", "src0", 35),
            # exact 6-token overlap with the benchmark doc -> 2/2 grams hit
            (1, "alpha beta gamma delta epsilon zeta", "en", "src1", 35),
            # no overlap
            (2, "one two three four five six seven", "en", "src1", 33),
            # shorter than n=5 tokens: zero grams, ratio 0, not contaminated
            (3, "tiny doc", "en", "src1", 8),
        ],
    )
    out = {r.doc_id: r for r in curation.decontaminate(df).collect()}
    assert set(out) == {1, 2, 3}, "benchmark docs must not appear in output"
    assert out[1].contaminated and out[1].n_overlap == out[1].n_grams == 2
    assert not out[2].contaminated and out[2].n_overlap == 0
    assert out[3].n_grams == 0 and out[3].contamination_ratio == 0.0
    assert not out[3].contaminated


def test_repetition_score_flags_repeats_and_guards_single_token(spark):
    df = _mini(
        spark,
        [
            (1, "spam spam spam spam spam spam", "en", "src0", 29),
            (2, "all tokens here are fully distinct", "en", "src0", 34),
            (3, "solo", "en", "src0", 4),  # no bigrams at all
        ],
    )
    out = {r.doc_id: r for r in curation.repetition_score(df).collect()}
    assert out[1].repetitive and out[1].dup_token_ratio > 0.8
    assert out[1].top_bigram_frac == 1.0
    assert not out[2].repetitive and out[2].dup_token_ratio == 0.0
    assert out[3].n_tokens == 1 and out[3].top_bigram_frac == 0.0


def test_stratified_sample_deterministic_and_rate_monotone(spark):
    docs = _docs(spark)
    once = {r.doc_id for r in curation.stratified_sample(docs).collect()}
    again = {r.doc_id for r in curation.stratified_sample(docs).collect()}
    assert once == again, "hash sampling must be run-stable"
    # a kept doc stays kept when its source's rate increases (buckets are
    # independent of the rate), so samples are nested across rates
    bigger = {
        r.doc_id
        for r in curation.stratified_sample(
            docs, rates={"src0": 900, "src1": 500}, default_permille=300
        ).collect()
    }
    assert once <= bigger
    # rate-0 sources vanish entirely
    none = curation.stratified_sample(
        docs, rates={f"src{i}": 0 for i in range(20)}, default_permille=0
    )
    assert none.count() == 0


def test_stratified_sample_rates_are_respected_statistically(spark):
    docs = _docs(spark)
    out = curation.stratified_sample(docs).collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, 0)
        per_source[r.source] += 1
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    # src0 at 500 per-mille must keep a visibly larger fraction than the
    # 100 per-mille default sources (coarse bound — tiny per-source counts)
    frac0 = per_source.get("src0", 0) / totals["src0"]
    rest = sum(v for s, v in per_source.items() if s not in ("src0", "src1"))
    rest_total = sum(v for s, v in totals.items() if s not in ("src0", "src1"))
    assert frac0 > rest / rest_total


def test_budget_fill_respects_the_quota(spark):
    from trail_condition_etl_spark.operators import curation

    docs = _docs(spark)
    out = curation.budget_fill(docs, budget_tokens=1000).collect()
    assert out, "every source should admit at least one document"
    for r in out:
        assert r.tokens_used <= 1000
        assert r.n_admitted >= 1
        assert r.best_prio_micros >= r.worst_prio_micros


def test_lang_drift_zero_for_a_mirrored_source(spark):
    """A synthetic source whose language mix EQUALS the corpus mix must
    score (near-)zero drift; the real skewed sources must not."""
    from pyspark.sql import functions as F

    from trail_condition_etl_spark.operators import curation

    docs = _docs(spark).select("doc_id", "source", "lang", "text")
    # one source, all languages in corpus proportion == corpus is one source
    uniform = docs.withColumn("source", F.lit("all"))
    row = curation.lang_drift(uniform).collect()
    assert len(row) == 1 and abs(row[0].chi2_drift) < 1e-9
    skewed = sorted(
        curation.lang_drift(docs).collect(), key=lambda r: -r.chi2_drift
    )
    assert skewed[0].chi2_drift > 0.0


def test_lang_drift_counts_missing_languages(spark):
    """A source with ZERO documents in some corpus language must carry
    that language's ((0 - p_l)^2 / p_l) term — the inner-join form
    silently dropped it, understating exactly the feed-broke-entirely
    drift this monitor exists to catch (and the oracle replays the same
    semantics, so only this test can see it)."""
    from pyspark.sql import functions as F

    from trail_condition_etl_spark.operators import curation

    docs = _docs(spark).filter(F.col("lang").isin("en", "zh"))
    split = docs.withColumn(
        "source", F.when(F.col("lang") == "en", "only_en").otherwise("other")
    )
    rows = {r.source: r for r in curation.lang_drift(split).collect()}
    # p_zh = fraction of zh docs; the missing-zh term alone is
    # (0 - p_zh)^2 / p_zh = p_zh, and the en term adds more
    n = docs.count()
    p_zh = docs.filter(F.col("lang") == "zh").count() / n
    assert rows["only_en"].chi2_drift > p_zh * 0.99
    assert rows["only_en"].n_langs == 1  # only languages PRESENT count
