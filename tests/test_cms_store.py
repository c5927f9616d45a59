"""Streaming CMS store: mergeability, replay guard, compaction."""

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import cms_cells
from heatmap_spark.operators.textops import _all_tokens
from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.cms import (
    accumulated_sketch,
    compact_cms_store,
    merge_batch_into_cms_store,
)


def _grid(df):
    return {(r["j"], r["col"]): r["cnt"] for r in df.collect()}


def test_cms_store_merge_replay_compact(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "cms")
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    for b in range(3):
        batch = docs.where(F.expr(f"CAST(doc_id * 3 DIV {mx} AS INT)") == b)
        assert merge_batch_into_cms_store(spark, batch, store, b)

    # mergeability: accumulated grid == one-shot grid of the full corpus
    tok = docs.select(F.explode(_all_tokens()).alias("token"))
    oneshot = _grid(cms_cells(tok))
    assert _grid(accumulated_sketch(spark, store)) == oneshot

    # replay of a committed batch is a no-op
    assert not merge_batch_into_cms_store(
        spark, docs.limit(5), store, 2
    )
    assert _grid(accumulated_sketch(spark, store)) == oneshot

    # compaction folds partials, removes them, and preserves the grid
    removed = compact_cms_store(spark, store)
    assert removed == 3
    assert _grid(accumulated_sketch(spark, store)) == oneshot
    # second compaction with nothing new to fold is a no-op
    assert compact_cms_store(spark, store) == 0
    assert _grid(accumulated_sketch(spark, store)) == oneshot


def test_estimate_unseen_candidate_is_zero_not_dropped(spark, sf_smoke, tmp_path):
    """A candidate token the corpus never saw hits unmaterialized cells:
    its estimate must be 0 (min over depth with missing cells = 0), not
    a dropped row or an inflated min over the surviving subset."""
    from heatmap_spark.streaming.cms import estimate_heavy_hitters

    store = str(tmp_path / "cms")
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 5)  # tiny corpus → sparse cell grid
    )
    assert merge_batch_into_cms_store(spark, docs, store, 0)
    cand = spark.createDataFrame(
        [("qqqzzzxyzzyunseen", 0)], "token string, true_cnt long"
    )
    rows = estimate_heavy_hitters(spark, store, cand).collect()
    assert len(rows) == 1  # the row SURVIVES the lookup
    assert rows[0]["cms_est"] >= 0
    assert rows[0]["overestimate"] == rows[0]["cms_est"]


def test_empty_store_serve_raises_value_error(spark):
    """estimate_heavy_hitters on an uncommitted store raises the
    explicit empty-store error (the ann/kll pattern), not an
    AttributeError."""
    import tempfile

    import pytest

    from heatmap_spark.streaming.cms import estimate_heavy_hitters

    store = tempfile.mkdtemp(prefix="cms_empty_") + "/s"
    cand = spark.createDataFrame(
        [("tok", 1)], "token string, true_cnt bigint"
    )
    with pytest.raises(ValueError, match="no committed batches"):
        estimate_heavy_hitters(spark, store, cand)
