"""Semantic-quality checks for the approximate similarity operators: the
SQL oracle proves Spark and DuckDB run the SAME algorithm; these prove
the algorithm is a good approximation of the exact baseline.

Floors are set from measured values on this corpus (which is isotropic —
the hardest case for LSH/IVF): ann_lsh 0.84+, near-dup pair recall
0.95+, ivf 0.52+ across sf0.001/0.01/0.1.
"""

from __future__ import annotations

from trail_condition_etl_spark import catalog
from trail_condition_etl_spark.operators import similarity
from conftest import SF_DIR


def _emb(spark):
    return catalog.load_table(spark, SF_DIR, "embeddings")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def test_ann_lsh_recall_floor(spark):
    emb = _emb(spark)
    truth = _topk_sets(similarity.cosine_topk(emb))
    approx = _topk_sets(similarity.ann_lsh_topk(emb))
    assert truth.keys() == approx.keys(), "every query must return results"
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.7, f"ann_lsh recall@5 {recall:.2f} < 0.7 floor"


def test_ivf_recall_floor(spark):
    emb = _emb(spark)
    truth = _topk_sets(similarity.cosine_topk(emb))
    approx = _topk_sets(similarity.ivf_topk(emb))
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = sum(recalls) / len(recalls)
    # isotropic corpus, 4/16 cells probed (~25% scanned): 0.52 measured;
    # random sampling at the same scan fraction would give ~0.25
    assert recall >= 0.4, f"ivf recall@5 {recall:.2f} < 0.4 floor"


def test_near_dup_lsh_pair_recall_floor(spark):
    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_exact(emb).collect()
    }
    lsh = {
        (r.id_a, r.id_b) for r in similarity.embedding_near_dup(emb).collect()
    }
    assert lsh <= exact, "LSH must never invent a pair the exact path lacks"
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.85, f"near-dup pair recall {recall:.2f} < 0.85 floor"


def test_ann_results_are_true_cosines(spark):
    # every (q, v, cosine) the ANN path returns must agree with the
    # exact computation — approximation may drop neighbors, never
    # fabricate similarities
    emb = _emb(spark)
    base = {
        (r.q_id, r.vec_id): r.cosine
        for r in similarity.cosine_topk(emb, k=1_000_000).collect()
    }
    for r in similarity.ann_lsh_topk(emb).collect():
        assert abs(base[(r.q_id, r.vec_id)] - r.cosine) < 1e-9


def test_pq_recall_floor(spark):
    emb = _emb(spark)
    truth = _topk_sets(similarity.cosine_topk(emb))
    approx = _topk_sets(similarity.pq_topk(emb))
    assert truth.keys() == approx.keys(), "every query must return results"
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = sum(recalls) / len(recalls)
    # 16 subspaces x 16 codes (64-bit PQ) on an isotropic corpus:
    # 0.40/0.31 measured at sf0.001/sf0.1 vs ~0.001 for random top-5
    assert recall >= 0.2, f"pq recall@5 {recall:.2f} < 0.2 floor"


def test_ivf_pq_composition(spark):
    """The IVF∘PQ scale path: (a) its results are a SUBSET of flat-ADC
    PQ ranking restricted to probed cells — every returned (q, v) must
    carry the identical ADC distance the flat path computes; (b) recall
    vs the exact baseline stays above the floor implied by composing
    cell pruning with PQ distortion."""
    emb = _emb(spark)
    flat = {
        (r.q_id, r.vec_id): r.adc_d2
        for r in similarity.pq_topk(emb, k=1_000_000).collect()
    }
    composed = similarity.ivf_pq_topk(emb).collect()
    for r in composed:
        assert abs(flat[(r.q_id, r.vec_id)] - r.adc_d2) < 1e-9, (
            "composition changed an ADC distance"
        )
    truth = _topk_sets(similarity.cosine_topk(emb))
    approx = _topk_sets(similarity.ivf_pq_topk(emb))
    assert truth.keys() == approx.keys(), "every query must return results"
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.1, f"ivf_pq recall@5 {recall:.2f} < 0.1 floor"


def test_semantic_dedup_refines_exact_components(spark):
    """LSH edges are a subset of the exact near-dup edges, so the LSH
    components must REFINE the exact components: any two vectors the
    LSH path merges must also be connected under the exact pair set
    (the approximation may split clusters, never invent merges)."""
    emb = _emb(spark)
    lsh_labels = {
        r.vec_id: r.canonical_vec_id
        for r in similarity.semantic_dedup(emb).collect()
    }
    # brute-force components over the EXACT pair set
    parent = {v: v for v in lsh_labels}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in similarity.embedding_near_dup_exact(emb).collect():
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    by_lsh: dict[int, set[int]] = {}
    for v, c in lsh_labels.items():
        by_lsh.setdefault(c, set()).add(v)
    for members in by_lsh.values():
        exact_roots = {find(v) for v in members}
        assert len(exact_roots) == 1, (
            "LSH merged vectors the exact pair set does not connect"
        )


def test_embedding_pair_graph_shared_across_thresholds(spark):
    """semantic_dedup(0.42) and semantic_dedup(0.6) over one snapshot
    must share the floor-keyed pair-graph artifact: the second threshold
    pays zero builds, and its pair set equals the inline banded path at
    that threshold."""
    from trail_condition_etl_spark.operators import artifacts

    emb = _emb(spark)
    a = similarity.shared_embedding_pairs(emb, threshold=0.42)
    a.count()
    before = artifacts.build_count()
    b = similarity.shared_embedding_pairs(emb, threshold=0.6)
    rows = {(r.id_a, r.id_b, r.cosine) for r in b.collect()}
    assert artifacts.build_count() == before, "second threshold rebuilt the artifact"
    inline = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.embedding_near_dup(emb, threshold=0.6).collect()
    }
    assert rows == inline
    assert set(b.inputFiles()) == set(a.inputFiles())
    # semantic_dedup at the second threshold also stays build-free
    similarity.semantic_dedup(emb, threshold=0.6).count()
    assert artifacts.build_count() == before
