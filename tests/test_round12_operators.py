"""Round-12 operator tests: perceptual-hash media dedup (hash bits
re-derived from the pixel formula, pigeonhole blocking equals brute
force, class census conservation), semantic decontamination (candidate
bound laws, threshold monotonicity, brute-force upper bound), and the
ANN shard merge plan (vector conservation against the index, share/
moved identities) — each against a conservation law or an independent
re-derivation, the repo's standing test model (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_reporting_etl_spark.queries import CATALOG
from finance_reporting_etl_spark.tables import _read_parquet
from tests.conftest import SF_SMOKE


# --- perceptual-hash media near-dup ------------------------------------------


def _ref_hash(doc_id: int) -> tuple[int, int, int, int]:
    """Independent pure-python re-derivation of the aHash from the
    synthetic pixel formula (no PNG bytes involved). Patch values are
    integer luminance: the exact r+g+b channel sum, channel c adding
    c*101 inside the mod-256 formula (ADVICE r12: the hash must react
    to every channel, not just R)."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    patch = [
        sum(
            (doc_id * 31 + ((x * w) // 8) * 7 + ((y * h) // 8) * 13 + c * 101)
            % 256
            for c in range(3)
        )
        for y in range(8)
        for x in range(8)
    ]
    tot = sum(patch)
    lo = hi = 0
    for idx, p in enumerate(patch):
        if p * 64 > tot:
            if idx < 32:
                lo |= 1 << idx
            else:
                hi |= 1 << (idx - 32)
    return w, h, lo, hi


def test_phash_signatures_match_formula(spark):
    """The REAL decode path (PNG bytes -> inflate -> unfilter ->
    resample -> threshold) must reproduce the formula-only hash for
    every doc — the round-trip proof the oracle then leans on."""
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_synthetic_png,
        perceptual_hash_media,
    )

    docs = _read_parquet(spark, f"{SF_SMOKE}/documents.parquet").limit(64)
    got = {
        r.doc_id: (r.width, r.height, r.hash_lo, r.hash_hi)
        for r in perceptual_hash_media(attach_synthetic_png(docs)).collect()
    }
    assert len(got) == 64
    for doc_id, sig in got.items():
        assert sig == _ref_hash(doc_id), doc_id


def test_phash_blocked_pairs_equal_brute_force(spark):
    """Pigeonhole exactness: the chunk-blocked join must find EXACTLY
    the within-class pairs a brute-force hamming scan finds at the
    hamming <= 7 cut."""
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_synthetic_png,
        perceptual_hash_media,
        phash_class_pairs,
    )

    docs = _read_parquet(spark, f"{SF_SMOKE}/documents.parquet")
    sigs = perceptual_hash_media(attach_synthetic_png(docs)).collect()
    byclass: dict[tuple[int, int], list] = {}
    for r in sigs:
        byclass.setdefault((r.width, r.height), []).append(r)
    brute = set()
    for lst in byclass.values():
        lst.sort(key=lambda r: r.doc_id)
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                a, b = lst[i], lst[j]
                hm = bin((a.hash_lo ^ b.hash_lo)).count("1") + bin(
                    (a.hash_hi ^ b.hash_hi)
                ).count("1")
                if hm <= 7:
                    brute.add((a.doc_id, b.doc_id, hm))
    blocked = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_class_pairs(
            perceptual_hash_media(attach_synthetic_png(docs)), max_hamming=7
        ).collect()
    }
    assert blocked == brute
    assert brute  # non-vacuous at the smoke fixture


def test_phash_census_conservation(spark):
    """The class census must cover every document exactly once
    (sum n_docs == corpus size, 63 shape classes at any fixture with
    doc_ids spanning 0..62), with per-row sanity: exact pairs <= pairs,
    hamming_sum bounded by 7 * n_pairs."""
    rows = CATALOG["phash_media_near_dup"].fn(spark, SF_SMOKE).collect()
    docs = _read_parquet(spark, f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len(rows) == 63
    for r in rows:
        assert 0 <= r.n_exact_pairs <= r.n_pairs
        assert r.hamming_sum <= 7 * r.n_pairs
        assert r.n_pairs <= r.n_docs * (r.n_docs - 1) // 2


def test_phash_rejects_inexact_blocking():
    """max_hamming >= 8 would silently under-report with 8 chunks —
    the operator must refuse rather than return a non-exact census."""
    import pytest

    from finance_reporting_etl_spark.operators.multimodal import (
        phash_class_pairs,
    )

    with pytest.raises(ValueError, match="pigeonhole"):
        phash_class_pairs(None, max_hamming=8)


# --- semantic decontamination -------------------------------------------------


def test_semantic_decontamination_laws(spark):
    """Sweep laws: 3 threshold rows; n_eval + n_train == corpus;
    contamination is antitone in the threshold; every contaminated
    count is bounded by the train size AND by the brute-force count at
    the same threshold (IVF candidates are a subset of all pairs)."""
    rows = {
        r.thresh_micro: r
        for r in CATALOG["semantic_decontamination"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {300000, 350000, 400000}
    emb = _read_parquet(spark, f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    r0 = rows[300000]
    assert r0.n_eval + r0.n_train == n
    assert r0.n_eval > 0 and r0.n_train > 0
    assert (
        rows[300000].n_contaminated
        >= rows[350000].n_contaminated
        >= rows[400000].n_contaminated
    )
    for r in rows.values():
        assert 0 <= r.n_contaminated <= r.n_train
        assert r.contam_ppm == r.n_contaminated * 1_000_000 // r.n_train
        assert r.n_candidate_pairs <= r.n_eval * r.n_train


def test_semantic_decontamination_upper_bounded_by_brute_force(spark):
    """IVF-candidate contamination can never EXCEED the brute-force
    (all eval x train pairs) contamination at the same threshold — and
    at the smoke fixture the nprobe=4 screen must still find a
    non-trivial fraction of it."""
    from finance_reporting_etl_spark.functions.vectors import cosine
    from finance_reporting_etl_spark.operators.corpus import md5_bucket

    emb = _read_parquet(spark, f"{SF_SMOKE}/embeddings.parquet")
    b = md5_bucket("vec_id", salt="semdecon")
    ev = emb.filter(b < 13).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    tr = emb.filter(b >= 13).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("t_vec")
    )
    brute = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "train_id",
            F.floor(cosine("q_vec", "t_vec") * 1000000.0 + 0.5).alias("m"),
        )
        .groupBy("train_id")
        .agg(F.max("m").alias("mx"))
    )
    brute_counts = {
        t: brute.filter(F.col("mx") >= t).count()
        for t in (300000, 350000, 400000)
    }
    rows = {
        r.thresh_micro: r
        for r in CATALOG["semantic_decontamination"].fn(spark, SF_SMOKE).collect()
    }
    for t, r in rows.items():
        assert r.n_contaminated <= brute_counts[t], t
    assert rows[300000].n_contaminated > 0


# --- ANN shard merge plan -------------------------------------------------------


def test_ann_shard_merge_plan_conservation(spark):
    """The merge plan must conserve vectors (sum n_vecs == corpus),
    keep fan-in within [1, 8], and satisfy the row identities
    (rows_moved = n_vecs - max_shard_vecs, bytes = n_vecs * 256,
    max share in (0, 1e6])."""
    rows = CATALOG["ann_shard_merge_plan"].fn(spark, SF_SMOKE).collect()
    emb = _read_parquet(spark, f"{SF_SMOKE}/embeddings.parquet")
    assert sum(r.n_vecs for r in rows) == emb.count()
    for r in rows:
        assert 1 <= r.n_shards <= 8
        assert 0 < r.max_shard_vecs <= r.n_vecs
        assert r.rows_moved == r.n_vecs - r.max_shard_vecs
        assert r.merged_bytes == r.n_vecs * 64 * 4
        assert r.max_share_ppm == r.max_shard_vecs * 1_000_000 // r.n_vecs
        assert r.max_share_ppm <= 1_000_000


def test_ann_shard_merge_matches_index_regrouping(spark):
    """Independent re-derivation: regroup the persisted assignment by
    (cell, shard) in the test and rebuild every plan row."""
    from finance_reporting_etl_spark.oracles import _AUX_DIR

    rows = {r.cell: r for r in
            CATALOG["ann_shard_merge_plan"].fn(spark, SF_SMOKE).collect()}
    from finance_reporting_etl_spark.operators.corpus import md5_bucket

    idx = spark.read.parquet(f"{_AUX_DIR}/shard_merge_index").withColumn(
        "shard", md5_bucket("id", salt="shard") % 8
    )
    per: dict[int, dict[int, int]] = {}
    for r in idx.collect():
        per.setdefault(r.cell, {}).setdefault(r.shard, 0)
        per[r.cell][r.shard] += 1
    assert set(per) == set(rows)
    for cell, shards in per.items():
        r = rows[cell]
        assert r.n_shards == len(shards)
        assert r.n_vecs == sum(shards.values())
        assert r.max_shard_vecs == max(shards.values())


# --- exact-dup image purge savings ---------------------------------------------


def test_phash_dedup_savings_reconciles_with_near_dup_census(spark):
    """Sibling reconciliation: per shape class, n_images must equal the
    census's n_docs, and the number of exact-dup PAIRS implied by the
    cluster sizes must equal the census's n_exact_pairs (sum over
    clusters of C(n,2) == hamming-0 pairs)."""
    census = {(r.width, r.height): r for r in
              CATALOG["phash_media_near_dup"].fn(spark, SF_SMOKE).collect()}
    savings = {(r.width, r.height): r for r in
               CATALOG["phash_dedup_savings"].fn(spark, SF_SMOKE).collect()}
    assert set(census) == set(savings)
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_synthetic_png,
        perceptual_hash_media,
    )

    docs = _read_parquet(spark, f"{SF_SMOKE}/documents.parquet")
    sigs = perceptual_hash_media(attach_synthetic_png(docs)).collect()
    clusters: dict[tuple, dict[tuple, int]] = {}
    for r in sigs:
        k = (r.width, r.height)
        clusters.setdefault(k, {}).setdefault((r.hash_hi, r.hash_lo), 0)
        clusters[k][(r.hash_hi, r.hash_lo)] += 1
    for k, r in savings.items():
        cl = clusters[k]
        assert r.n_images == census[k].n_docs == sum(cl.values())
        assert r.n_clusters == len(cl)
        assert r.n_purged == r.n_images - r.n_clusters
        assert r.max_cluster_size == max(cl.values())
        assert r.purged_pixel_bytes == r.n_purged * k[0] * k[1] * 3
        exact_pairs = sum(n * (n - 1) // 2 for n in cl.values())
        assert census[k].n_exact_pairs == exact_pairs
    assert any(r.n_purged > 0 for r in savings.values())  # non-vacuous


# --- decontamination method agreement --------------------------------------------


def test_decontamination_agreement_cells(spark):
    """Matrix laws: one row; the four cells partition the universe
    (= the train-side vector count on the shared 'decon' split); the
    semantic marginal equals an independent re-derivation via the
    semantic leg's own flags; agreement ppm matches the cells."""
    from finance_reporting_etl_spark.operators.corpus import md5_bucket

    r = CATALOG["decontamination_method_agreement"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    r = r[0]
    emb = _read_parquet(spark, f"{SF_SMOKE}/embeddings.parquet")
    n_train = emb.filter(md5_bucket("vec_id", salt="decon") >= 13).count()
    assert r.n_universe == n_train
    assert (
        r.n_both + r.n_ngram_only + r.n_sem_only + r.n_neither == r.n_universe
    )
    assert r.agree_ppm == (r.n_both + r.n_neither) * 1_000_000 // r.n_universe
    po_num = (r.n_both + r.n_neither) * r.n_universe
    assert r.pe_num == (r.n_both + r.n_ngram_only) * (r.n_both + r.n_sem_only) + (
        r.n_sem_only + r.n_neither
    ) * (r.n_ngram_only + r.n_neither)
    assert abs(r.kappa - (po_num - r.pe_num) / (r.n_universe**2 - r.pe_num)) < 1e-12
    # both screens must actually fire at the smoke fixture
    assert r.n_both + r.n_ngram_only > 0
    assert r.n_both + r.n_sem_only > 0


# --- streaming phash signature maintenance ---------------------------------------


def test_streaming_phash_equals_batch_census(spark):
    """The micro-batched signature store must answer the purge census
    with EXACTLY the batch query's rows — mergeability is the whole
    claim (the streaming_value_drift_psi convention)."""
    batch = {(r.width, r.height): r for r in
             CATALOG["phash_dedup_savings"].fn(spark, SF_SMOKE).collect()}
    stream = {(r.width, r.height): r for r in
              CATALOG["streaming_phash_signature_maintain"]
              .fn(spark, SF_SMOKE).collect()}
    assert set(batch) == set(stream)
    for k, b in batch.items():
        s = stream[k]
        assert (
            s.n_images, s.n_clusters, s.n_purged, s.max_cluster_size,
            s.purged_pixel_bytes, s.purged_ppm,
        ) == (
            b.n_images, b.n_clusters, b.n_purged, b.max_cluster_size,
            b.purged_pixel_bytes, b.purged_ppm,
        )


# --- semantic decontamination recall sweep ------------------------------------------


def test_semdecon_recall_sweep_laws(spark):
    """Sweep laws: 4 rows; candidates and flagged are monotone
    non-decreasing in nprobe; flagged <= truth (same threshold over a
    candidate subset); recall_ppm matches the integer identity and is
    non-decreasing; the sweep's nprobe=4 flagged count equals
    semantic_decontamination's contaminated count at 0.30 (same split,
    same index geometry, same threshold)."""
    rows = {r.nprobe: r for r in
            CATALOG["semantic_decontamination_recall"].fn(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [1, 2, 4, 8]
    prev = None
    for p in (1, 2, 4, 8):
        r = rows[p]
        assert 0 <= r.n_flagged <= r.n_truth
        assert r.recall_ppm == r.n_flagged * 1_000_000 // r.n_truth
        if prev is not None:
            assert r.n_candidates >= prev.n_candidates
            assert r.n_flagged >= prev.n_flagged
        prev = r
    assert rows[8].n_flagged > 0  # non-vacuous
    sem = {r.thresh_micro: r for r in
           CATALOG["semantic_decontamination"].fn(spark, SF_SMOKE).collect()}
    assert rows[4].n_flagged == sem[300000].n_contaminated
