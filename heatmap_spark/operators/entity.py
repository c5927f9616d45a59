"""Entity resolution over structured records.

The structured-record counterpart of the text-side multi-signal
``dedup_fusion`` (operators/dedup.py): link records that refer to the
same real-world entity across sources using the classic three-stage
architecture —

1. **Blocking**: records are hashed into candidate blocks by cheap
   exact keys plus a *banded* numeric key, so candidate generation is
   an equi-join (shuffle on the block key), never an all-pairs
   comparison.  The band replication (each record probes its own band
   and the next) makes the banding LOSSLESS for the similarity rule:
   a matching pair's numeric gap is ≤ the rule threshold, which is ≤
   the band width, so the pair can straddle at most adjacent bands.
2. **Pairwise similarity**: multi-attribute evidence inside a block —
   edit distance on the normalized name plus a bounded numeric gap.
   All predicates are built-in JVM expressions (``levenshtein``,
   ``abs``), bit-identical in DuckDB, so the whole rule is oracle-
   checkable.
3. **Clustering**: connected components over the match edges
   (pointer-jumping, O(log diameter) rounds — shared with the dedup
   path), entity id = min record id of the component.

At 100 TB: blocking bounds the join fan-out (block sizes track the
key distribution, with AQE absorbing hot blocks), the edge relation is
much smaller than the record set, and CC is the only iterative piece.

The reference (timfpark/heatmap) has no entity resolution; this is a
north-star LLM-data-pipeline addition (BASELINE.json), with the dirty
multi-source fixture synthesized deterministically from the customer
table so both engines see the identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import connected_components
from heatmap_spark.sources.tables import load_table

_VARIANT_OFFSET = 2_000_000


def dirty_customer_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers ∪ deterministic 'CRM' variants: every third customer
    gets a second record with a perturbed name (lowercased + one char
    appended — edit distance 1 after normalization), the same
    nation/segment, and a small exact balance offset (+0.25 is a power
    of two, so the double arithmetic is bit-identical cross-engine)."""
    c = load_table(spark, sf_dir, "customer")
    orig = c.select(
        F.col("c_custkey").cast("bigint").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.lit("src").alias("source"),
    )
    variants = c.where(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + _VARIANT_OFFSET).cast("bigint").alias("rec_id"),
        F.concat(F.lower("c_name"), F.lit("x")).alias("name"),
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal").cast("double") + F.lit(0.25)).alias("bal"),
        F.lit("crm").alias("source"),
    )
    return orig.unionByName(variants)


def er_candidate_pairs(
    records: DataFrame,
    band_width: float = 50.0,
    max_name_dist: int = 1,
    max_bal_diff: float = 1.0,
) -> DataFrame:
    """Match edges (u < v) via lossless banded blocking.

    Block key = (nation, segment, balance band); each record probes its
    own band and the next, so any pair within ``max_bal_diff`` (≤
    ``band_width``) meets in exactly one probe.  The pair predicate —
    same block, |bal gap| ≤ ``max_bal_diff``, normalized-name edit
    distance ≤ ``max_name_dist`` — runs inside the equi-join, so no
    all-pairs comparison ever materializes."""
    assert max_bal_diff <= band_width, "banding would be lossy"
    r = records.select(
        "rec_id",
        F.lower("name").alias("lname"),
        "nation",
        "segment",
        "bal",
        F.floor(F.col("bal") / F.lit(band_width)).cast("bigint").alias("band"),
    )
    probe = r.select(
        "rec_id",
        "lname",
        "nation",
        "segment",
        "bal",
        F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("probe_band"),
    )
    right = r.select(*[F.col(c).alias(f"r_{c}") for c in r.columns])
    j = probe.join(
        right,
        (probe.nation == F.col("r_nation"))
        & (probe.segment == F.col("r_segment"))
        & (probe.probe_band == F.col("r_band"))
        & (probe.rec_id != F.col("r_rec_id")),
    )
    sim = j.where(
        (F.abs(F.col("bal") - F.col("r_bal")) <= F.lit(max_bal_diff))
        & (F.levenshtein("lname", "r_lname") <= F.lit(max_name_dist))
    )
    # same-band pairs meet twice (both probe directions) — normalize to
    # (min, max) and dedupe
    return sim.select(
        F.least("rec_id", "r_rec_id").alias("u"),
        F.greatest("rec_id", "r_rec_id").alias("v"),
    ).distinct()


def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record entity assignment over the dirty multi-source fixture:
    (rec_id, source, entity_id, n_members, n_sources) where entity_id
    is the min rec_id of the record's match component (itself for
    singletons) and n_sources counts the distinct sources the entity
    spans — the cross-source linkage that IS the point of ER."""
    records = dirty_customer_records(spark, sf_dir)
    pairs = er_candidate_pairs(records)
    cc = connected_components(pairs, "u", "v")
    assigned = (
        records.join(
            cc.select(
                F.col("doc_id").alias("rec_id"), F.col("cluster_id").alias("eid")
            ),
            "rec_id",
            "left",
        )
        .select(
            "rec_id",
            "source",
            F.coalesce("eid", "rec_id").alias("entity_id"),
        )
    )
    stats = assigned.groupBy("entity_id").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return assigned.join(stats, "entity_id").select(
        "rec_id", "source", "entity_id", "n_members", "n_sources"
    )
