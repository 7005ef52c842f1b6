"""Round-15 optimization-round tests: the fused batch-incident pair
join must equal the two legs it replaced, pair for pair."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jaccard_incident_pairs_equals_cross_union_self(spark):
    """jaccard_incident_pairs_prepped == jaccard_cross_pairs_prepped
    (batch x existing) ∪ jaccard_pairs_prepped (batch self), on ids,
    pairs and det-rounded values, for a corpus with real blocks,
    size-filter edge cases (empty docs) and near-threshold pairs."""
    from finance_reporting_etl_spark.operators.dedup import (
        jaccard_cross_pairs_prepped,
        jaccard_incident_pairs_prepped,
        jaccard_pairs_prepped,
        jaccard_prep,
    )

    rows = [
        # (id, lang, source, text) — ids 0..5 existing, 10..15 batch
        (0, "en", "a", "alpha beta gamma delta"),
        (1, "en", "a", "alpha beta gamma epsilon"),
        (2, "en", "b", "alpha beta gamma delta"),
        (3, "fr", "a", "un deux trois quatre"),
        (4, "en", "a", ""),
        (5, "en", "a", "zeta eta theta iota kappa lambda"),
        (10, "en", "a", "alpha beta gamma delta"),
        (11, "en", "a", "alpha beta epsilon zeta"),
        (12, "en", "b", "alpha beta gamma"),
        (13, "fr", "a", "un deux trois cinq"),
        (14, "en", "a", ""),
        (15, "en", "a", "alpha beta gamma delta epsilon zeta eta"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    kwb = dict(block_cols=("lang", "source"))
    kw = dict(threshold=0.5, **kwb)
    prepped = jaccard_prep(docs, **kwb).localCheckpoint()
    batch_p = prepped.filter(F.col("id") >= 10)
    base_p = prepped.filter(F.col("id") < 10)

    old = (
        jaccard_cross_pairs_prepped(batch_p, base_p, **kw)
        .unionByName(jaccard_pairs_prepped(batch_p, **kw))
        .collect()
    )
    seen_p = prepped.withColumn(
        "__isb", (F.col("id") >= 10).cast("int")
    )
    fused = jaccard_incident_pairs_prepped(batch_p, seen_p, "__isb", **kw).collect()

    assert sorted(map(tuple, old)) == sorted(map(tuple, fused))
    # sanity: the fixture exercises both legs
    assert any(r.id_a >= 10 and r.id_b < 10 for r in fused)  # cross
    assert any(r.id_a >= 10 and r.id_b >= 10 for r in fused)  # self
