"""Entity resolution over structured records: blocking losslessness,
cross-source linkage, and cluster-stat consistency."""

from pyspark.sql import functions as F

from heatmap_spark.operators.entity import (
    _VARIANT_OFFSET,
    dirty_customer_records,
    entity_resolution,
    er_candidate_pairs,
)


def test_banded_blocking_is_lossless(spark, sf_smoke):
    """The banded candidate join must produce exactly the pairs a
    brute-force comparison within (nation, segment) produces — the
    band replication covers every pair the similarity rule can
    accept."""
    records = dirty_customer_records(spark, sf_smoke)
    banded = er_candidate_pairs(records)

    r = records.select(
        "rec_id", F.lower("name").alias("lname"), "nation", "segment", "bal"
    )
    a, b = r.alias("a"), r.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.nation") == F.col("b.nation"))
            & (F.col("a.segment") == F.col("b.segment"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .where(
            (F.abs(F.col("a.bal") - F.col("b.bal")) <= 1.0)
            & (F.levenshtein(F.col("a.lname"), F.col("b.lname")) <= 1)
        )
        .select(F.col("a.rec_id").alias("u"), F.col("b.rec_id").alias("v"))
    )
    assert banded.exceptAll(brute).isEmpty() and brute.exceptAll(banded).isEmpty()
    assert banded.count() > 0, "fixture should produce matches"


def test_variants_link_to_their_source_record(spark, sf_smoke):
    """Every synthesized CRM record must land in the same entity as its
    original (their edge always passes the rule), so its entity id —
    the component min — is at most the original's id, and the entity
    spans both sources."""
    res = entity_resolution(spark, sf_smoke)
    crm = res.where(F.col("source") == "crm")
    assert crm.count() > 0
    assert (
        crm.where(
            F.col("entity_id") > F.col("rec_id") - F.lit(_VARIANT_OFFSET)
        ).count()
        == 0
    )
    assert crm.where(F.col("n_sources") != 2).count() == 0
    assert crm.where(F.col("n_members") < 2).count() == 0


def test_entity_stats_consistent(spark, sf_smoke):
    """n_members sums back to the record count; every entity_id is a
    member record's id (the component min); singletons are src-only."""
    res = entity_resolution(spark, sf_smoke)
    n_records = dirty_customer_records(spark, sf_smoke).count()
    assert res.count() == n_records
    per_entity = res.groupBy("entity_id").agg(
        F.count("*").alias("n"), F.first("n_members").alias("claimed")
    )
    assert per_entity.where(F.col("n") != F.col("claimed")).count() == 0
    # entity_id is always one of the entity's own rec_ids
    ids = res.select("entity_id").distinct()
    assert (
        ids.join(res.select("rec_id"), ids.entity_id == F.col("rec_id"), "left_anti")
        .count()
        == 0
    )
    singles = res.where(F.col("n_members") == 1)
    assert singles.where(F.col("source") != "src").count() == 0
