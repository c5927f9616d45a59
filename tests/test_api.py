"""Fluent API + connector-gating tests."""

import json

import pytest
from pyspark.sql import functions as F

from heatmap_spark.api import Heatmap
from heatmap_spark.operators import pyramid as P
from heatmap_spark.sources.connectors import ConnectorUnavailable, read_cassandra, write_cassandra
from heatmap_spark.sources.locations import load_locations


def test_fluent_chain_matches_operators(spark, sf_smoke, tmp_path):
    built = (
        Heatmap(spark)
        .from_events_dir(sf_smoke)
        .pyramid(mode="explode")
        .resultsets()
        .table()
        .df()
    )
    direct = P.heatmap_table(
        P.resultsets(P.build_pyramid(load_locations(spark, sf_smoke), mode="explode"))
    )
    got = {r.id: json.loads(r.heatmap) for r in built.collect()}
    exp = {r.id: json.loads(r.heatmap) for r in direct.collect()}
    assert got == exp and len(got) > 0


def test_fluent_save_roundtrip(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "heatmaps")
    Heatmap(spark).from_events_dir(sf_smoke).pyramid().resultsets().table().save(
        out, mode="overwrite"
    )
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {"id", "heatmap"}


def test_from_locations_defaults_weight(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0, None, "u1", "gps")],
        "latitude double, longitude double, ts timestamp, user_id string, source string",
    )
    b = Heatmap(spark).from_locations(df)
    assert "weight" in b.df().columns
    assert b.df().first().weight == 1.0


def test_stage_order_enforced(spark, sf_smoke):
    h = Heatmap(spark).from_events_dir(sf_smoke)
    with pytest.raises(ValueError):
        h.resultsets()
    with pytest.raises(ValueError):
        h.pyramid().table()


def test_connectors_gate_cleanly(spark):
    with pytest.raises(ConnectorUnavailable):
        read_cassandra(spark, host="127.0.0.1")
    df = spark.createDataFrame([("a", "{}")], "id string, heatmap string")
    with pytest.raises(ConnectorUnavailable):
        write_cassandra(df)


def test_fluent_smooth_stage(spark, sf_smoke):
    from heatmap_spark.api import Heatmap

    sm = (
        Heatmap(spark)
        .from_events_dir(sf_smoke)
        .pyramid()
        .smooth(8)
        .df()
    )
    assert sm.columns == ["user_group", "timespan", "row", "col", "smoothed"]
    assert sm.count() > 0


def test_concurrent_queries_different_sf_dirs(spark, sf_smoke, sf_correct):
    """SQL-surface queries registered via sf_dir-encoded views must not
    cross-contaminate when run concurrently against different scale
    dirs (the fixed-name race: thread B's view replacement landing
    between thread A's registration and analysis)."""
    from concurrent.futures import ThreadPoolExecutor

    from heatmap_spark.queries import q_heatmap_pyramid_sql

    def run(sf):
        return q_heatmap_pyramid_sql(spark, sf).count()

    expected = {sf: run(sf) for sf in (sf_smoke, sf_correct)}
    assert expected[sf_smoke] != expected[sf_correct]
    with ThreadPoolExecutor(4) as ex:
        futures = [
            (sf, ex.submit(run, sf))
            for _ in range(3)
            for sf in (sf_smoke, sf_correct)
        ]
        for sf, fut in futures:
            assert fut.result(timeout=300) == expected[sf]


def test_corpus_builder_composes_stages(spark, sf_smoke):
    """The fluent curation lifecycle narrows monotonically, each stage
    matches its standalone operator, and the result carries a split."""
    from pyspark.sql import functions as F

    from heatmap_spark.api import Corpus
    from heatmap_spark.operators.dedup import decontaminate
    from heatmap_spark.operators.textops import gopher_quality

    base = Corpus(spark).from_sf_dir(sf_smoke)
    n0 = base.df().count()

    q = base.quality_filter()
    expected_q = {
        r.doc_id for r in gopher_quality(spark, sf_smoke).where("keep").collect()
    }
    assert {r.doc_id for r in q.df().select("doc_id").collect()} == expected_q

    d = q.decontaminate()
    clean = {
        r.doc_id for r in decontaminate(spark, sf_smoke).where("keep").collect()
    }
    assert {r.doc_id for r in d.df().select("doc_id").collect()} == expected_q & clean

    final = d.repetition_filter().dedup("minhash").split()
    out = final.df()
    n_final = out.count()
    assert 0 < n_final <= len(expected_q & clean) <= n0
    assert set(out.columns) >= {"doc_id", "text", "split"}
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_corpus_decontaminate_custom_benchmark(spark, sf_smoke):
    """A caller-supplied benchmark relation drives removal: docs whose
    text IS a benchmark text (or shares a 5-gram with one) disappear;
    the benchmark rows themselves never enter the corpus output."""
    from heatmap_spark.api import Corpus
    from heatmap_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    # benchmark = copies of two corpus docs under fresh ids
    bench = (
        docs.where("doc_id IN (3, 7)")
        .selectExpr("doc_id + 1000000 AS doc_id", "text")
    )
    out = Corpus(spark).from_documents(docs).decontaminate(benchmark=bench).df()
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert 3 not in kept and 7 not in kept
    assert all(k < 1000000 for k in kept)
    assert len(kept) > 0


def test_corpus_builder_empty_input(spark):
    """Every fluent stage must pass an empty corpus through cleanly."""
    from heatmap_spark.api import Corpus

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = (
        Corpus(spark)
        .from_documents(empty)
        .quality_filter()
        .repetition_filter()
        .decontaminate()
        .dedup("minhash")
        .split()
        .df()
    )
    assert out.count() == 0
    assert "split" in out.columns


def test_corpus_chunk_and_leakage_safe_split(spark, sf_smoke):
    """Fluent surface for the new curation ops: .chunk() yields the
    chunk schema; .split(leakage_safe=True) keeps near-dup candidate
    pairs in one split."""
    from heatmap_spark.api import Corpus
    from heatmap_spark.operators.dedup import minhash_lsh_candidates

    chunks = Corpus(spark).from_sf_dir(sf_smoke).chunk().df()
    assert set(chunks.columns) == {"doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens"}
    assert chunks.count() > 0

    split = Corpus(spark).from_sf_dir(sf_smoke).split(leakage_safe=True).df()
    assert "cluster_id" not in split.columns
    by_doc = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    pairs = minhash_lsh_candidates(spark, sf_smoke).collect()
    assert pairs
    for p in pairs:
        assert by_doc[p.doc_a] == by_doc[p.doc_b]


def test_corpus_remove_passages_stage_and_cli_dispatch(spark, sf_smoke):
    """The removal stage rewrites ``text`` to the cleaned token stream
    (matching the operator's clean_text), keeps other columns, and
    composes with downstream stages; the CLI dispatch table knows it."""
    from pyspark.sql import functions as F

    from heatmap_spark.api import Corpus
    from heatmap_spark.operators.dedup import remove_duplicated_passages

    out = Corpus(spark).from_sf_dir(sf_smoke).remove_duplicated_passages().df()
    assert {"doc_id", "text", "n_removed_tokens", "lang"} <= set(out.columns)
    op = remove_duplicated_passages(spark, sf_smoke)
    j = out.select("doc_id", "text").join(
        op.select("doc_id", "clean_text"), "doc_id"
    )
    assert j.where(F.col("text") != F.col("clean_text")).count() == 0
    # composes: chunking the cleaned corpus works and drops dup spans
    chunks = (
        Corpus(spark)
        .from_sf_dir(sf_smoke)
        .remove_duplicated_passages()
        .chunk()
        .df()
    )
    assert chunks.count() > 0


def test_cli_drift_and_resolve_subcommands(spark, sf_smoke, tmp_path, capsys):
    """The drift and resolve CLI subcommands run end-to-end: the drift
    store commits one drift row per batch, and resolve writes the ER
    assignment with cross-source entities present."""
    from heatmap_spark.__main__ import main
    from heatmap_spark.streaming.vocab import read_vocab_drift

    store = str(tmp_path / "vocab")
    assert (
        main(
            [
                "drift",
                "--sf-dir",
                sf_smoke,
                "--store",
                store,
                "--batches",
                "3",
                "--compact",
            ]
        )
        == 0
    )
    log = read_vocab_drift(spark, store)
    assert log.count() == 3
    assert "oov=" in capsys.readouterr().out

    out_dir = str(tmp_path / "er")
    assert main(["resolve", "--sf-dir", sf_smoke, "--output", out_dir]) == 0
    saved = spark.read.parquet(out_dir)
    assert {"rec_id", "source", "entity_id", "n_members", "n_sources"} == set(
        saved.columns
    )
    assert saved.where("n_sources > 1").count() > 0


def test_cli_mix_subcommand(spark, sf_smoke, tmp_path):
    from heatmap_spark.__main__ import main

    out_dir = str(tmp_path / "mix")
    assert (
        main(["mix", "--sf-dir", sf_smoke, "--output", out_dir, "--budget", "500"])
        == 0
    )
    saved = spark.read.parquet(out_dir)
    assert {"doc_id", "lang", "n_tokens", "cum_tokens"} == set(saved.columns)
    from pyspark.sql import functions as F

    assert (
        saved.groupBy("lang").agg(F.max("cum_tokens").alias("t"))
        .where(F.col("t") > 500)
        .count()
        == 0
    )


def test_cli_round5_subcommands(spark, sf_smoke, tmp_path, capsys):
    """tokdrift / backtest / cluster / rowstore CLI paths run
    end-to-end against the smoke fixture."""
    from heatmap_spark.__main__ import main
    from heatmap_spark.streaming.bpe_drift import read_bpe_drift

    store = str(tmp_path / "bpe")
    assert main(["tokdrift", "--sf-dir", sf_smoke, "--store", store]) == 0
    assert read_bpe_drift(spark, store).count() == 3
    assert "fertility=" in capsys.readouterr().out

    assert main(["backtest", "--sf-dir", sf_smoke]) == 0
    assert "mase=" in capsys.readouterr().out

    out_dir = str(tmp_path / "clusters")
    assert main(["cluster", "--sf-dir", sf_smoke, "--output", out_dir]) == 0
    saved = spark.read.parquet(out_dir)
    assert {"vec_id", "cluster", "cluster_size"} == set(saved.columns)

    rstore = str(tmp_path / "rowstore")
    assert (
        main(
            ["rowstore", "--sf-dir", sf_smoke, "--store", rstore, "--get", "42"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "pruned to 1 bucket" in out


def test_cli_index_merge_datacard_subcommands(spark, sf_smoke, tmp_path, capsys):
    """The index, merge, and datacard CLI subcommands run end-to-end:
    routed serving buckets print, the merge history shows the bucket
    rewrite with the pre-merge snapshot intact, and the datacard
    emits every summary field."""
    from heatmap_spark.__main__ import main

    store = str(tmp_path / "ix")
    assert main(["index", "--sf-dir", sf_smoke, "--store", store]) == 0
    out = capsys.readouterr().out
    assert "routed buckets:" in out and "tfidf=" in out

    mstore = str(tmp_path / "mg")
    assert main(["merge", "--sf-dir", sf_smoke, "--store", mstore]) == 0
    out = capsys.readouterr().out
    assert "v1:" in out and "v2:" in out and "as-of v1:" in out

    assert main(["datacard", "--sf-dir", sf_smoke]) == 0
    out = capsys.readouterr().out
    for field in ("n_docs", "lang_entropy_bits", "dup_rate"):
        assert field in out


def test_fluent_classifier_and_span_stages(spark, sf_smoke):
    """Corpus.classifier_filter keeps exactly the positive-label docs;
    .span_corruption transforms the corpus into training pairs."""
    from pyspark.sql import functions as F

    from heatmap_spark.api import Corpus
    from heatmap_spark.operators.textops import quality_classifier

    kept = Corpus(spark).from_sf_dir(sf_smoke).classifier_filter().df()
    want = {
        r["doc_id"]
        for r in quality_classifier(spark, sf_smoke).where(F.col("label")).collect()
    }
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == want

    pairs = (
        Corpus(spark)
        .from_sf_dir(sf_smoke)
        .classifier_filter()
        .span_corruption()
        .df()
    )
    assert set(pairs.columns) == {
        "doc_id", "n_tokens", "n_masked_spans", "inputs", "targets"
    }
    assert pairs.count() == len(want)


def test_fluent_dsir_stage(spark, sf_smoke):
    """Corpus.dsir_select keeps exactly the positively-weighted docs
    and composes with downstream stages on one plan."""
    from pyspark.sql import functions as F

    from heatmap_spark.api import Corpus
    from heatmap_spark.operators.textops import dsir_weights

    kept = Corpus(spark).from_sf_dir(sf_smoke).dsir_select().df()
    want = {
        r["doc_id"]
        for r in dsir_weights(spark, sf_smoke).where(F.col("selected")).collect()
    }
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == want
    # the selected slice should skew toward the target language
    langs = kept.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in langs}
    assert by_lang.get("en", 0) == max(by_lang.values())

    chunks = Corpus(spark).from_sf_dir(sf_smoke).dsir_select().chunk().df()
    assert {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()} <= want
