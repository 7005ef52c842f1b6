"""Round-11 operator tests: layered ANN reciprocity structure (level-1
subgraph laws), the dedup/quality Pareto frontier's monotonicity and
its reconciliation against the purge-savings audit, and the backfill
idempotency proof's self-verdict — each against a conservation law or
a sibling query, the repo's standing test model (SURVEY.md §5)."""

from __future__ import annotations

from finance_reporting_etl_spark.queries import CATALOG
from finance_reporting_etl_spark.tables import _read_parquet
from tests.conftest import SF_SMOKE


# --- HNSW-style layered reciprocity ------------------------------------------


def test_hnsw_layers_structure(spark):
    """Layer laws: exactly rows {0, 1}; level-1 node count equals the
    deterministic 1-in-8 assignment counted straight off the fixture;
    the level-1 graph (a node subset) cannot have more edges than
    level 0; every ppm sits in [0, 1e6] and mutual <= edges."""
    rows = {r.layer: r for r in
            CATALOG["hnsw_layer_reciprocity"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    emb = _read_parquet(spark, f"{SF_SMOKE}/embeddings.parquet")
    n_all = emb.count()
    n_l1 = emb.filter("vec_id % 8 = 0").count()
    assert rows[0].n_nodes == n_all
    assert rows[1].n_nodes == n_l1
    for r in rows.values():
        for k in (5, 10):
            edges = getattr(r, f"edges_{k}")
            mutual = getattr(r, f"mutual_{k}")
            ppm = getattr(r, f"recip_ppm_{k}")
            assert 0 <= mutual <= edges
            if edges:
                assert ppm == mutual * 1_000_000 // edges
                assert 0 <= ppm <= 1_000_000
        # k=5 edges can't exceed k=10 edges (prefix of the same lists)
        assert r.edges_5 <= r.edges_10
    # the sparse level-1 graph can't have more edges than level 0
    assert rows[1].edges_10 <= rows[0].edges_10


def test_hnsw_level1_is_own_ranking_not_filtered_level0(spark):
    """Level 1 re-ranks within the layer: its per-src lists are drawn
    from level-1 candidates only, so every level-1 edge endpoint obeys
    the 1-in-8 assignment — and the edge count matches a literal
    re-derivation from the persisted pair table."""
    from finance_reporting_etl_spark.queries import _AUX_DIR

    rows = {r.layer: r for r in
            CATALOG["hnsw_layer_reciprocity"].fn(spark, SF_SMOKE).collect()}
    pairs = spark.read.parquet(f"{_AUX_DIR}/hnsw_scored_pairs").collect()
    per_src: dict[int, list] = {}
    for p in pairs:
        if p.src % 8 == 0 and p.dst % 8 == 0:
            per_src.setdefault(p.src, []).append(p)
    edges_10 = 0
    for src, ps in per_src.items():
        ps.sort(key=lambda p: (-p.score_micro, p.dst))
        edges_10 += min(len(ps), 10)
    assert rows[1].edges_10 == edges_10


# --- dedup/quality Pareto frontier --------------------------------------------


def test_dedup_pareto_monotone_and_reconciles_purge_savings(spark):
    """Raising the quality floor can only shrink what survives: every
    kept-column is non-increasing in threshold. The t=0.0 endpoint is
    the pure keep-best policy, so it must reconcile exactly with the
    dedup_purge_savings audit summed over its (lang, source) blocks."""
    rows = sorted(
        CATALOG["dedup_quality_pareto"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.0, 0.25, 0.5, 0.75]
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs_total == b.n_docs_total
        assert a.chars_total == b.chars_total
        assert a.tokens_total == b.tokens_total
        for c in ("n_docs_kept", "chars_kept", "tokens_kept",
                  "kept_quality_micro_sum"):
            assert getattr(a, c) >= getattr(b, c), c
        assert a.chars_saved_ppm <= b.chars_saved_ppm
    ps = CATALOG["dedup_purge_savings"].fn(spark, SF_SMOKE).collect()
    t0 = rows[0]
    assert t0.n_docs_total == sum(r.n_docs for r in ps)
    assert t0.chars_total == sum(r.chars_total for r in ps)
    # keep-best keeps exactly one doc per cluster
    assert t0.n_docs_kept == sum(r.n_clusters for r in ps)
    assert t0.chars_total - t0.chars_kept == sum(r.chars_dropped for r in ps)


# --- backfill idempotency proof -----------------------------------------------


def test_backfill_idempotency_holds(spark):
    """The proof must PASS on the fixture: zero divergence between the
    spliced backfill and the full rebuild, a non-empty rebuilt window,
    and internally consistent counters."""
    r = CATALOG["mart_backfill_idempotency"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    r = r[0]
    assert r.idempotent == 1
    assert r.n_value_mismatch == 0
    assert r.n_only_full == 0 and r.n_only_merged == 0
    assert r.n_rows_merged == r.n_rows_full
    assert 0 < r.n_window_rows <= r.n_rows_full
