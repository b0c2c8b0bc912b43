"""Dedup-operator invariants that the SQL oracle can't see: the xxhash64
production variants must agree with the Horner-hash (oracle-checked)
variants, since both are id-assignments over the same shingle sets."""

from __future__ import annotations

from trail_condition_etl_spark import catalog
from trail_condition_etl_spark.operators import dedup, text
from conftest import SF_DIR


def _docs(spark):
    return catalog.load_table(spark, SF_DIR, "documents")


def test_minhash_xxhash_agrees_with_horner(spark):
    """Near-dup PAIR SET equality between hash families. The minhash
    signatures differ (different hash values) so the LSH candidate sets
    can differ at the margin — but every true near-dup pair (jaccard >=
    threshold, and the planted pairs sit at >=0.9 vs 0.03 background)
    must surface under both."""
    docs = _docs(spark)
    horner = {
        (r.doc_a, r.doc_b) for r in dedup.minhash_pairs(docs).collect()
    }
    xx = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_pairs(docs, use_xxhash=True).collect()
    }
    assert horner == xx, (
        f"pair sets diverge: only-horner={horner - xx} only-xxhash={xx - horner}"
    )
    assert len(horner) > 0, "corpus has planted near-dups; none found"


def test_doc_fingerprint_fast_shape_and_determinism(spark):
    docs = _docs(spark)
    fast = text.doc_fingerprint_fast(docs)
    rows = {r.doc_id: (r.fingerprint, r.n_tokens) for r in fast.collect()}
    slow = {
        r.doc_id: (r.fingerprint, r.n_tokens)
        for r in text.doc_fingerprint(docs).collect()
    }
    # same docs, same token counts; fingerprints differ (different hash)
    assert rows.keys() == slow.keys()
    assert all(rows[d][1] == slow[d][1] for d in rows)
    # deterministic across evaluations
    again = {r.doc_id: (r.fingerprint, r.n_tokens) for r in fast.collect()}
    assert rows == again


def test_dedup_clusters_converged_and_consistent(spark):
    docs = _docs(spark)
    labels = {
        r.doc_id: r.canonical_doc_id
        for r in dedup.dedup_clusters(docs).collect()
    }
    # CLUSTER_ROUNDS covers the component diameter: one more round is a
    # fixed point
    more = {
        r.doc_id: r.canonical_doc_id
        for r in dedup.dedup_clusters(
            docs, rounds=dedup.CLUSTER_ROUNDS + 1
        ).collect()
    }
    assert labels == more, "label propagation had not converged"
    # every doc labeled; canonical is the component minimum (<= member)
    assert labels.keys() == {r.doc_id for r in docs.select("doc_id").collect()}
    assert all(c <= d for d, c in labels.items())
    # each near-dup pair lands in one cluster; clusters exist
    pairs = dedup.minhash_pairs(docs).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
    # docs not in any pair stay their own canonical
    in_pairs = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    singles = [d for d in labels if d not in in_pairs]
    assert all(labels[d] == d for d in singles)


def test_exact_dedup_finds_planted_copies(spark):
    docs = _docs(spark)
    dups = dedup.exact_dedup(docs).filter("n_copies > 1").collect()
    total = docs.count()
    uniq = dedup.exact_dedup(docs).count()
    assert uniq <= total
    # every group accounts for its copies
    assert sum(r.n_copies for r in dedup.exact_dedup(docs).collect()) == total
    assert all(r.n_copies >= 2 for r in dups)


def test_pair_graph_artifact_built_once_and_identical(spark):
    """The shared pair-graph artifact: one LSH pass per corpus snapshot
    (both calls read the SAME materialized files), values byte-identical
    to the inline computation — so every graph consumer's oracle is
    unchanged by the artifact indirection."""
    docs = _docs(spark)
    a = dedup.shared_minhash_pairs(docs)
    files_a = set(a.inputFiles())
    b = dedup.shared_minhash_pairs(docs)
    assert files_a and set(b.inputFiles()) == files_a
    inline = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_pairs(docs).collect()
    }
    shared = {(r.doc_a, r.doc_b, r.jaccard) for r in a.collect()}
    assert inline == shared


def test_pair_graph_shared_across_thresholds(spark):
    """Directive: distinct thresholds over one corpus snapshot must
    amortize the SAME floor-keyed artifact — the second threshold pays
    zero LSH builds (artifacts.build_count is flat) and its rows equal
    the inline computation at that threshold."""
    from trail_condition_etl_spark.operators import artifacts

    docs = _docs(spark)
    base = dedup.shared_minhash_pairs(docs, threshold=0.5)
    base.count()  # force the (possibly first) build
    before = artifacts.build_count()
    tighter = dedup.shared_minhash_pairs(docs, threshold=0.8)
    rows = {(r.doc_a, r.doc_b, r.jaccard) for r in tighter.collect()}
    assert artifacts.build_count() == before, "second threshold rebuilt the pair graph"
    inline = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_pairs(docs, threshold=0.8).collect()
    }
    assert rows == inline
    # both thresholds read the same materialized files
    assert set(tighter.inputFiles()) == set(base.inputFiles())


def test_x64_pair_graph_artifact_identical_to_inline(spark):
    docs = _docs(spark)
    shared = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.shared_minhash_pairs_x64(docs).collect()
    }
    inline = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_pairs(docs, use_xxhash=True).collect()
    }
    assert shared == inline and shared
