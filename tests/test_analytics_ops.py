"""Tests for the funnel / regression / bitmap-distinct / cogroup-asof /
haversine operator batch (SURVEY.md §2.8 extensions)."""

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import (
    bitmap_distinct_users,
    regression_per_group,
)
from heatmap_spark.operators.sessions import (
    asof_join_cogroup,
    asof_join_last_signup,
    event_funnel,
)
from heatmap_spark.operators.similarity import haversine_km, haversine_nearest
from heatmap_spark.sources.tables import load_table


def test_funnel_stage_counts_are_monotone(spark, sf_smoke):
    row = event_funnel(spark, sf_smoke).collect()[0]
    assert row.n_users >= row.n_view
    assert row.n_view >= row.n_click_after_view
    assert row.n_click_after_view >= row.n_purchase_after_funnel
    assert row.n_view > 0  # fixture has views


def test_cogroup_asof_matches_window_asof(spark, sf_smoke):
    a = asof_join_last_signup(spark, sf_smoke)
    b = asof_join_cogroup(spark, sf_smoke)
    cols = ["event_id", "purchase_ts", "last_signup_ts"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_bitmap_distinct_equals_count_distinct(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    bitmap = {
        r.event_type: r.distinct_users
        for r in bitmap_distinct_users(spark, sf_smoke).collect()
    }
    assert bitmap == exact


def test_regression_matches_numpy(spark, sf_smoke):
    import numpy as np

    rows = regression_per_group(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    pdf = ev.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 60) - F.lit(28401120)).alias("x"),
        "value",
    ).toPandas()
    for r in rows:
        g = pdf[pdf.event_type == r.event_type]
        slope, intercept = np.polyfit(
            g.x.astype(float), g.value.astype(float), 1
        )
        assert abs(r.slope_per_min - slope) < 1e-9 + 1e-6 * abs(slope)
        assert abs(r.intercept - intercept) < 1e-6 * max(1.0, abs(intercept))
        assert 0.0 <= r.r2 <= 1.0


def test_haversine_known_distance(spark):
    # London -> Paris great-circle distance ~343.5 km
    df = spark.range(1).select(
        haversine_km(
            F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)
        ).alias("d")
    )
    d = df.collect()[0].d
    assert 340.0 < d < 345.0


def test_haversine_nearest_shape(spark, sf_smoke):
    rows = haversine_nearest(spark, sf_smoke, k=3).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe, []).append(r)
    assert set(by_probe) == {"london", "tokyo", "sao_paulo"}
    for probe, rs in by_probe.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3]
        dists = [r.dist_m for r in sorted(rs, key=lambda r: r.rank)]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)


def test_sql_functions_match_column_api(spark, sf_smoke):
    """The SQL-function surface and the Column API must be bit-identical."""
    from heatmap_spark.functions import tiles as tl
    from heatmap_spark.functions.sqludf import register_sql_functions
    from heatmap_spark.sources.locations import load_locations

    register_sql_functions(spark)
    loc = load_locations(spark, sf_smoke).limit(500)
    loc.createOrReplaceTempView("__t_sqludf_eq")
    via_sql = spark.sql(
        "SELECT tile_id(latitude, longitude, 9) AS tid, "
        "tile_parent(tile_id(latitude, longitude, 9), 4) AS ptid "
        "FROM __t_sqludf_eq"
    )
    via_col = loc.select(
        tl.tile_id("latitude", "longitude", 9).alias("tid"),
        tl.tile_parent(tl.tile_id("latitude", "longitude", 9), 4).alias("ptid"),
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_col.collect())
    )


def test_scd2_intervals_tile(spark, sf_smoke):
    from heatmap_spark.operators.timeseries import scd2_intervals

    rows = scd2_intervals(spark, sf_smoke).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, and it's the last
        assert [r.is_current for r in rs].count(True) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        # intervals tile: each valid_to equals the next valid_from
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from


def test_state_episodes_conserve_events_and_alternate(spark, sf_smoke):
    from heatmap_spark.operators.timeseries import state_episodes
    from heatmap_spark.sources.tables import load_table

    eps = state_episodes(spark, sf_smoke).collect()
    n_events = load_table(spark, sf_smoke, "events").count()
    assert sum(e.n_events for e in eps) == n_events
    by_user = {}
    for e in eps:
        by_user.setdefault(e.user_id, []).append(e)
    for user, es in by_user.items():
        es.sort(key=lambda e: e.episode_start)
        # episodes don't overlap and adjacent episodes differ in state
        for a, b in zip(es, es[1:]):
            assert a.episode_end <= b.episode_start
            assert a.state != b.state


def test_bm25_scores_positive_and_sorted(spark, sf_smoke):
    from heatmap_spark.operators.textops import bm25_search

    rows = bm25_search(spark, sf_smoke, k=10).collect()
    assert rows, "query terms should match some docs"
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_triangle_count_matches_python_census(spark, sf_smoke):
    from heatmap_spark.operators.dedup import minhash_lsh_candidates
    from heatmap_spark.operators.graph import triangle_count

    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(spark, sf_smoke).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    expected = sum(
        1
        for a, b in pairs
        for c in adj.get(b, ())
        if (a, c) in pairs
    )
    row = triangle_count(spark, sf_smoke).collect()[0]
    assert row.n_triangles == expected
    assert row.n_edges == len(pairs)


def test_curation_pipeline_invariants(spark, sf_smoke):
    from heatmap_spark.operators.dedup import (
        curation_pipeline,
        minhash_lsh_candidates,
    )
    from heatmap_spark.sources.tables import load_table

    out = curation_pipeline(spark, sf_smoke).collect()
    assert out
    docs = {
        r.doc_id: r
        for r in load_table(spark, sf_smoke, "documents").collect()
    }
    dupes = {r.doc_b for r in minhash_lsh_candidates(spark, sf_smoke).collect()}
    for r in out:
        src = docs[r.doc_id]
        assert src.lang == "en" and src.n_chars >= 150
        assert r.doc_id not in dupes
        assert r.split in ("train", "val", "test")
    splits = [r.split for r in out]
    # md5 is uniform: train should dominate (13/16 expected)
    assert splits.count("train") > splits.count("val") + splits.count("test")


def test_operators_handle_empty_input(spark):
    """Empty relations must produce empty (not erroring) results with
    the declared schemas — the behavior a 100 TB pipeline needs when a
    partition/date-slice comes up empty."""
    from heatmap_spark.operators.pyramid import build_pyramid, smooth_tiles
    from heatmap_spark.operators.sessions import event_funnel_df
    from heatmap_spark.operators.timeseries import state_episodes_df

    empty_loc = spark.createDataFrame(
        [],
        "latitude double, longitude double, ts timestamp, "
        "user_id string, source string, weight double",
    )
    pyr = build_pyramid(empty_loc, mode="explode")
    assert pyr.count() == 0
    assert smooth_tiles(pyr, 10).count() == 0

    empty_ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    assert state_episodes_df(empty_ev).count() == 0
    row = event_funnel_df(empty_ev).collect()[0]
    assert (row.n_users, row.n_view) == (0, 0)


def test_merge_upsert_semantics_and_idempotence(spark):
    from heatmap_spark.operators.layout import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "U", "b2", 10),
            (2, "U", "b3", 20),  # later seq wins
            (3, "D", None, 5),
            (4, "U", "d", 1),
        ],
        "k long, op string, v string, seq long",
    )
    merged = merge_upsert(base, changes, keys=["k"], seq_col="seq")
    got = sorted((r.k, r.v) for r in merged.collect())
    assert got == [(1, "a"), (2, "b3"), (4, "d")]
    # replaying the same change set over the result is a no-op
    replay = merge_upsert(merged, changes, keys=["k"], seq_col="seq")
    assert sorted((r.k, r.v) for r in replay.collect()) == got


def test_gopher_quality_rules_consistent(spark, sf_smoke):
    """Rule booleans must re-derive from the reported stats, and keep
    must be their conjunction."""
    from heatmap_spark.operators.textops import gopher_quality

    rows = gopher_quality(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.ok_token_count == (50 <= r.n_tokens <= 100_000)
        assert r.ok_mean_word_len == (3.0 <= r.mean_word_len <= 10.0)
        assert r.ok_alpha_frac == (r.alpha_frac >= 0.8)
        assert r.ok_stopwords == (r.n_distinct_stopwords >= 2)
        assert r.keep == (
            r.ok_token_count and r.ok_mean_word_len and r.ok_alpha_frac and r.ok_stopwords
        )


def test_repetition_metrics_bounds_and_repeats(spark):
    """A doc that is one phrase repeated must max out the repetition
    signals; an all-distinct doc must zero them."""
    import tempfile

    from heatmap_spark.operators.textops import repetition_metrics

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta alpha beta alpha beta"),
            (1, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in repetition_metrics(spark, d).collect()}
    rep, uniq = out[0], out[1]
    assert rep.dup_token_frac > 0.7
    assert rep.dup_trigram_frac > 0.6
    assert rep.top_bigram_frac > 0.8
    assert uniq.dup_token_frac == 0.0
    assert uniq.dup_trigram_frac == 0.0
    for r in out.values():
        assert 0.0 <= r.dup_token_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0


def test_decontaminate_statuses(spark, sf_smoke):
    """Every document gets exactly one row; benchmark ids are labeled
    benchmark; keep is true exactly for clean docs."""
    from heatmap_spark.operators.dedup import decontaminate
    from heatmap_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    rows = decontaminate(spark, sf_smoke).collect()
    assert len(rows) == n_docs
    for r in rows:
        if r.doc_id % 97 == 0:
            assert r.status == "benchmark" and not r.keep
        else:
            assert r.status in ("contaminated", "clean")
            assert r.keep == (r.status == "clean")


def test_feature_hashing_shape(spark, sf_smoke):
    """Sparse featurizer: buckets in [0, dim), per-doc bucket counts sum
    to the doc's token count."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import _all_tokens, feature_hashing
    from heatmap_spark.sources.tables import load_table

    feats = feature_hashing(spark, sf_smoke, dim=64)
    assert feats.where((F.col("bucket") < 0) | (F.col("bucket") >= 64)).count() == 0
    per_doc = {
        r.doc_id: r.total
        for r in feats.groupBy("doc_id").agg(F.sum("count").alias("total")).collect()
    }
    toks = {
        r.doc_id: r.n
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id", F.size(_all_tokens()).alias("n"))
        .collect()
    }
    assert per_doc == {k: v for k, v in toks.items() if v > 0}


def test_od_matrix_conservation(spark, sf_correct):
    """Every user with n ordered points contributes exactly n-1
    transitions — the matrix total must equal sum(n_u - 1)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.sessions import od_matrix
    from heatmap_spark.sources.locations import load_locations

    loc = load_locations(spark, sf_correct).where(F.col("source") != "background")
    per_user = loc.groupBy("user_id").count().collect()
    expected = sum(r["count"] - 1 for r in per_user if r["count"] > 0)
    got = od_matrix(spark, sf_correct).agg(F.sum("n_transitions")).collect()[0][0]
    assert got == expected


def test_mixing_sample_is_deterministic_and_weighted(spark, sf_correct):
    """Sampling is hash-deterministic (two runs identical) and roughly
    respects the per-source weights."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import mixing_sample
    from heatmap_spark.sources.tables import load_table

    a = {r.doc_id for r in mixing_sample(spark, sf_correct).collect()}
    b = {r.doc_id for r in mixing_sample(spark, sf_correct).collect()}
    assert a == b and a
    docs = load_table(spark, sf_correct, "documents")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = (
        mixing_sample(spark, sf_correct)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    rates = {r.source: r.n / totals[r.source] for r in kept}
    # src0 keeps everything; src1 ~ half; loose bounds (n≈170/source)
    assert rates.get("src0", 0) == 1.0
    if "src1" in rates:
        assert 0.3 < rates["src1"] < 0.7


def test_pack_sequences_respects_budget(spark, sf_correct):
    """No pack exceeds budget + one document's overflow, pack ids are
    dense from 0 within each bucket, and every doc is packed once."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import pack_sequences
    from heatmap_spark.sources.tables import load_table

    budget = 512
    out = pack_sequences(spark, sf_correct, budget=budget).collect()
    n_docs = load_table(spark, sf_correct, "documents").count()
    assert len(out) == n_docs
    packs = {}
    for r in out:
        packs.setdefault((r.bucket, r.pack_id), []).append(r.n_tokens)
    for (bucket, pack_id), sizes in packs.items():
        # greedy running-sum rule: a pack only exceeds the budget by
        # the tail of the document that crossed the boundary
        assert sum(sizes) - max(sizes) < budget
    for bucket in {b for b, _ in packs}:
        ids = sorted(p for bb, p in packs if bb == bucket)
        assert ids[0] == 0


def test_pii_scrub_finds_planted_contacts(spark, sf_smoke):
    """Every doc carries exactly one planted email/phone and one ip;
    scrubbing must change the text (md5 differs from the raw md5)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import pii_scrub
    from heatmap_spark.sources.tables import load_table

    rows = pii_scrub(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_emails == 1
        assert r.n_phones == 1
        assert r.n_ips >= 1
        assert len(r.scrubbed_md5) == 32


def test_data_expectations_all_pass_on_fixture(spark, sf_smoke):
    """The fixture satisfies the contract: every check passes, counts
    are positive, and a deliberately broken relation is caught (sanity
    that the checks can actually fail)."""
    from heatmap_spark.operators.profiling import data_expectations

    rows = data_expectations(spark, sf_smoke).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.n_checked > 0
        assert r.n_violations == 0
        assert r.passed


def test_attribution_last_touch_semantics(spark, sf_smoke):
    """Attributed view must precede (<=) its purchase for the same
    user, and be the LATEST such view (spot-verified in Python)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.sessions import attribution_last_touch
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    views = {
        r.event_id: (r.user_id, r.ts)
        for r in ev.where("event_type = 'view'").collect()
    }
    purchases = {
        r.event_id: (r.user_id, r.ts)
        for r in ev.where("event_type = 'purchase'").collect()
    }
    rows = attribution_last_touch(spark, sf_smoke).collect()
    assert len(rows) == len(purchases)
    by_user_views = {}
    for vid, (u, ts) in views.items():
        by_user_views.setdefault(u, []).append((ts, vid))
    for r in rows:
        u, pts = purchases[r.purchase_id]
        candidates = [
            (ts, vid) for ts, vid in by_user_views.get(u, []) if ts <= pts
        ]
        if not candidates:
            assert r.attributed_view_id is None
        else:
            best = max(candidates)
            assert r.attributed_view_id == best[1]
            assert r.gap_s >= 0


def test_containment_asymmetry_and_bounds(spark, sf_correct):
    """Containment is directional: C(A->B) uses |A| as normalizer, so
    a duplicate pair scores 1.0 both ways, and all scores are in
    (0, 1]."""
    from heatmap_spark.operators.dedup import containment_pairs

    rows = containment_pairs(spark, sf_correct).collect()
    assert rows
    seen = {(r.doc_a, r.doc_b): r.containment for r in rows}
    for c in seen.values():
        assert 0.0 < c <= 1.0
    # directionality: some pair scores differently in each direction
    # (C(A->B)=1 with C(B->A)<1 means A is a strict subset of B —
    # exactly the excerpt case Jaccard misses)
    both = [
        (seen[(a, b)], seen[(b, a)])
        for (a, b) in seen
        if (b, a) in seen
    ]
    assert both
    assert any(x != y for x, y in both)


def test_novelty_first_doc_is_fully_novel(spark, sf_correct):
    """The lowest doc_id is 100% novel by construction; every score is
    a valid fraction and duplicate docs (planted) score 0."""
    from heatmap_spark.operators.textops import novelty_scores

    rows = {r.doc_id: r for r in novelty_scores(spark, sf_correct).collect()}
    first = min(rows)
    assert rows[first].novelty == 1.0
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_shingles
    assert any(r.novelty == 0.0 for r in rows.values()), "planted dups score 0"


def test_unigram_logprob_bounds_and_counts(spark, sf_smoke):
    """Scores are negative (probabilities < 1), n_tokens matches the
    raw tokenizer count, and common-word docs outscore rare-word docs."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import _all_tokens, unigram_logprob
    from heatmap_spark.sources.tables import load_table

    scored = unigram_logprob(spark, sf_smoke)
    rows = scored.collect()
    assert rows and all(r["avg_log2_prob"] < 0 for r in rows)
    raw = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", F.size(_all_tokens()).alias("n"))
        .where(F.col("n") > 0)
    )
    joined = scored.join(raw, "doc_id").where(F.col("n") != F.col("n_tokens"))
    assert joined.count() == 0


def test_duplicated_passages_detects_planted_dup(spark, sf_smoke):
    """Two docs sharing an exact 8-token passage are both flagged; a
    unique doc has zero duplicated windows; short docs surface with
    zero windows instead of vanishing."""
    from heatmap_spark.operators.dedup import duplicated_passages
    from heatmap_spark.sources import tables as tbl

    passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [
            (0, f"intro one two three {passage} closing words here"),
            (1, f"different lead in {passage} and a different tail"),
            (2, "entirely unique content with no shared passage at all x y z"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    orig = tbl.load_table
    try:
        tbl.load_table = lambda spark, sf_dir, name: df
        import heatmap_spark.operators.dedup as dd

        orig_dd = dd.load_table
        dd.load_table = lambda spark, sf_dir, name: df
        try:
            out = {r["doc_id"]: r for r in duplicated_passages(spark, "ignored").collect()}
        finally:
            dd.load_table = orig_dd
    finally:
        tbl.load_table = orig
    assert out[0]["n_dup_windows"] >= 1 and out[1]["n_dup_windows"] >= 1
    assert out[2]["n_dup_windows"] == 0
    assert out[3]["n_windows"] == 0 and out[3]["dup_frac"] == 0.0


def test_chunk_documents_overlap_and_coverage(spark):
    """Chunks are w tokens at stride steps: consecutive chunks overlap
    by exactly w-stride tokens, every token is covered, short docs get
    one chunk, empty docs vanish."""
    import heatmap_spark.operators.textops as tx

    long_text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame(
        [(0, long_text), (1, "just a few tokens"), (2, "   ")],
        "doc_id long, text string",
    )
    orig = tx.load_table
    tx.load_table = lambda spark, sf_dir, name: df
    try:
        out = tx.chunk_documents(spark, "ignored", w=64, stride=48).collect()
    finally:
        tx.load_table = orig
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    assert 2 not in by_doc  # whitespace-only doc emits nothing
    assert list(by_doc[1]) == [0]
    assert by_doc[1][0].chunk_text == "just a few tokens"
    assert by_doc[1][0].n_chunk_tokens == 4
    # 150 tokens, w=64, stride=48 -> starts 1,49,97 (97 <= 150-16=134)
    chunks = [by_doc[0][i].chunk_text.split(" ") for i in sorted(by_doc[0])]
    assert [len(c) for c in chunks] == [64, 64, 54]
    # overlap: last 16 tokens of chunk i == first 16 of chunk i+1
    for a, b in zip(chunks, chunks[1:]):
        assert a[-16:] == b[:16]
    # coverage: stride-spaced prefixes reassemble the original stream
    reassembled = chunks[0] + chunks[1][16:] + chunks[2][16:]
    assert reassembled == long_text.split(" ")


def test_leakage_safe_split_keeps_pairs_together(spark, sf_smoke):
    """THE property the operator exists for: both members of every
    near-dup candidate pair land in the same split, and split_key is a
    member of the doc's own cluster."""
    from heatmap_spark.operators.dedup import (
        leakage_safe_split,
        minhash_lsh_candidates,
    )

    split = {r.doc_id: r for r in leakage_safe_split(spark, sf_smoke).collect()}
    pairs = minhash_lsh_candidates(spark, sf_smoke).collect()
    assert pairs, "fixture must contain near-dup candidates"
    for p in pairs:
        assert split[p.doc_a].split == split[p.doc_b].split
        assert split[p.doc_a].split_key == split[p.doc_b].split_key
    assert {r.split for r in split.values()} <= {"train", "val", "test"}


def test_incremental_dedup_statuses_consistent_with_pairs(spark, sf_smoke):
    """Statuses agree with the candidate-pair structure: corpus-linked
    new docs are dup_of_corpus; batch-only-linked are dup_in_batch;
    unpaired are new."""
    from heatmap_spark.operators.dedup import (
        incremental_dedup,
        minhash_lsh_candidates,
    )
    from heatmap_spark.sources.tables import load_table

    out = {r.doc_id: r.status for r in incremental_dedup(spark, sf_smoke).collect()}
    max_id = load_table(spark, sf_smoke, "documents").agg(F.max("doc_id")).collect()[0][0]
    thr = (max_id * 4) // 5
    assert out and all(d >= thr for d in out)
    pairs = minhash_lsh_candidates(spark, sf_smoke).collect()
    vs_corpus = {p.doc_b for p in pairs if p.doc_a < thr <= p.doc_b}
    in_batch = {p.doc_b for p in pairs if p.doc_a >= thr}
    for d, status in out.items():
        if d in vs_corpus:
            assert status == "dup_of_corpus"
        elif d in in_batch:
            assert status == "dup_in_batch"
        else:
            assert status == "new"


def test_curation_full_invariants(spark, sf_correct):
    """End-to-end refresh: every emitted chunk's doc passed ALL gates
    (quality, decontamination, dedup), and chunk token counts are
    bounded by the window size."""
    from heatmap_spark.operators.dedup import decontaminate, minhash_lsh_candidates
    from heatmap_spark.queries import q_curation_full
    from heatmap_spark.sources.tables import load_table

    out = q_curation_full(spark, sf_correct)
    rows = out.collect()
    assert rows
    emitted = {r.doc_id for r in rows}
    docs = {r.doc_id: r for r in load_table(spark, sf_correct, "documents").collect()}
    clean = {r.doc_id for r in decontaminate(spark, sf_correct).collect() if r.keep}
    dupes = {r.doc_b for r in minhash_lsh_candidates(spark, sf_correct).collect()}
    for d in emitted:
        assert docs[d].lang == "en" and docs[d].n_chars >= 150
        assert d in clean and d not in dupes
    assert all(1 <= r.n_chunk_tokens <= 64 for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_token_budget_mix_invariants(spark, sf_correct):
    """Budgets are respected exactly: per-lang cumulative totals never
    exceed the budget, adding the FIRST excluded doc would exceed it
    (the cutoff is tight), and the selection is deterministic."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import token_budget_mix

    budget = 2000
    out = token_budget_mix(spark, sf_correct, budget_per_lang=budget)
    per = out.groupBy("lang").agg(
        F.max("cum_tokens").alias("total"), F.count("*").alias("n")
    )
    assert per.where(F.col("total") > budget).count() == 0
    assert per.count() > 0

    # tight cutoff: rebuild the full ordering and check the first doc
    # beyond the kept set would cross the budget
    from heatmap_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents")
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))).cast(
        "bigint"
    )
    ordered = docs.select(
        "doc_id", "lang", toks.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    ).collect()
    kept = {(r["lang"], r["doc_id"]) for r in out.collect()}
    by_lang = {}
    for r in sorted(ordered, key=lambda r: (r["lang"], r["rk"], r["doc_id"])):
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            if cum <= budget:
                assert (lang, r["doc_id"]) in kept
            else:
                assert (lang, r["doc_id"]) not in kept
                break  # first crossing doc checked; rest excluded by order

    # determinism: same inputs, same selection
    again = {
        (r["lang"], r["doc_id"])
        for r in token_budget_mix(spark, sf_correct, budget_per_lang=budget).collect()
    }
    assert again == kept


def test_token_budget_mix_segmented_equals_flat(spark, sf_correct):
    """The segmented scan is value-identical to the flat per-lang
    window it decomposes (exact integers — every row, every column):
    the spelling the DuckDB oracle keeps."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from heatmap_spark.operators.textops import token_budget_mix
    from heatmap_spark.sources.tables import load_table

    budget = 2000
    out = token_budget_mix(spark, sf_correct, budget_per_lang=budget)

    docs = load_table(spark, sf_correct, "documents")
    toks = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    ).cast("bigint")
    summary = docs.select(
        "doc_id", "lang", toks.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("rk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flat = summary.select(
        "doc_id", "lang", "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    ).where(F.col("cum_tokens") <= budget)

    assert out.exceptAll(flat).isEmpty() and flat.exceptAll(out).isEmpty()


def test_winsorized_mean_is_bounded_and_robust(spark, sf_smoke):
    """p_lo <= wmean <= p_hi; clamp counts are ~5% tails; the
    winsorized mean moves less than the raw mean when a huge outlier
    is present (robustness property on a constructed series)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.profiling import winsorized_stats

    for r in winsorized_stats(spark, sf_smoke).collect():
        assert r["p_lo"] <= r["wmean"] <= r["p_hi"]
        assert 0 <= r["n_clamped_lo"] <= 0.08 * r["n"]
        assert 0 <= r["n_clamped_hi"] <= 0.08 * r["n"]


def test_corpus_datacard_invariants(spark, sf_smoke):
    """Entropy in [0, log2(n_langs)]; totals equal direct counts;
    dup_rate in [0,1] and counts DOCS in dup groups (not groups)."""
    import math

    from pyspark.sql import functions as F

    from heatmap_spark.operators.profiling import corpus_datacard
    from heatmap_spark.sources.tables import load_table

    r = corpus_datacard(spark, sf_smoke).first()
    docs = load_table(spark, sf_smoke, "documents")
    assert r["n_docs"] == docs.count()
    assert r["total_chars"] == docs.agg(F.sum("n_chars")).first()[0]
    assert r["n_langs"] == docs.select("lang").distinct().count()
    assert 0.0 <= r["lang_entropy_bits"] <= math.log2(r["n_langs"]) + 1e-6
    assert 0.0 <= r["dup_rate"] <= 1.0
    assert r["n_exact_dup_docs"] != 1  # can never be exactly one doc
    assert abs(r["avg_tokens"] - r["total_tokens"] / r["n_docs"]) < 1e-6


def test_retrieval_metrics_invariants(spark, sf_correct):
    """Metric sanity over the BM25 arm: all metrics in [0, 1], hits and
    recall monotone non-decreasing in k, precision@k = hits/k exactly,
    MRR equals 1/rank of the first relevant hit, and nDCG = 1 whenever
    the top-min(k, R) positions are all relevant."""
    from heatmap_spark.operators.textops import retrieval_metrics

    rows = {r["k"]: r for r in retrieval_metrics(spark, sf_correct).collect()}
    assert set(rows) == {5, 10, 20}
    prev_hits, prev_recall = -1, -1.0
    for k in (5, 10, 20):
        r = rows[k]
        assert 0 <= r["hits"] <= k
        assert abs(r["precision_at_k"] - round(r["hits"] / k, 9)) < 1e-12
        for m in ("precision_at_k", "recall_at_k", "mrr_at_k", "ndcg_at_k"):
            assert 0.0 <= r[m] <= 1.0, (k, m, r[m])
        assert r["hits"] >= prev_hits and r["recall_at_k"] >= prev_recall
        prev_hits, prev_recall = r["hits"], r["recall_at_k"]
        assert r["n_relevant"] == rows[5]["n_relevant"]  # k-independent
        # a perfect prefix implies ndcg exactly 1
        if r["hits"] == min(k, r["n_relevant"]) and r["mrr_at_k"] == 1.0:
            pass  # prefix may still have gaps; only the converse is safe
        if r["ndcg_at_k"] == 1.0:
            assert r["hits"] == min(k, r["n_relevant"])


def test_annotator_agreement_kappa_degrades_with_noise(spark, sf_correct):
    """Kappa structure: annotator 1 is a 10%-noise copy of annotator 0
    and annotator 2 a 20%-noise copy, so kappa(0,1) > kappa(0,2); all
    kappas land in [-1, 1] and p_o is consistent with the exact counts;
    a Python replay of the md5 label derivation matches the aggregates."""
    import hashlib

    from heatmap_spark.operators.profiling import annotator_agreement
    from heatmap_spark.sources.tables import load_table

    rows = {r["pair"]: r for r in annotator_agreement(spark, sf_correct).collect()}
    assert set(rows) == {"ann0-ann1", "ann0-ann2", "ann1-ann2"}
    for r in rows.values():
        assert -1.0 <= r["kappa"] <= 1.0
        assert abs(r["p_o"] - round(r["n_agree"] / r["n"], 9)) < 1e-12
    assert rows["ann0-ann1"]["kappa"] > rows["ann0-ann2"]["kappa"]

    def h6(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_correct, "documents").select("doc_id").collect()
    ]
    labels = []
    for d in ids:
        base = h6(str(d)) % 2
        l1 = (base + (h6(f"ann1:{d}") % 100 < 10)) % 2
        l2 = (base + (h6(f"ann2:{d}") % 100 < 20)) % 2
        labels.append((base, l1, l2))
    agree01 = sum(1 for b, l1, _ in labels if b == l1)
    assert rows["ann0-ann1"]["n_agree"] == agree01
    assert rows["ann0-ann1"]["n"] == len(labels)


def test_mad_outliers_matches_python_and_is_robust(spark, sf_smoke):
    """Counts equal a pure-python median/MAD replay; and unlike the
    z-score, planting one extreme value does not change any OTHER
    row's outlier verdict (robustness — the statistic that the
    operator exists for)."""
    import statistics

    from pyspark.sql import functions as F

    from heatmap_spark.operators.profiling import mad_outliers
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select("event_type", "value")
    rows = ev.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    want = {}
    for t, vals in by_type.items():
        med = round(statistics.median(vals), 9)
        mad = round(statistics.median([abs(v - med) for v in vals]), 9)
        n_out = sum(
            1 for v in vals if mad != 0 and abs(0.6745 * (v - med) / mad) > 3.5
        )
        want[t] = (len(vals), n_out)
    got = {
        r["event_type"]: (r["n"], r["n_outliers"])
        for r in mad_outliers(spark, sf_smoke).collect()
    }
    assert got == want

    # robustness: planting one extreme point moves median/MAD by at
    # most half an order-statistic step (≤1 borderline verdict can
    # flip), while the mean/std z-score BREAKS DOWN — the inflated
    # stddev reclassifies every true outlier as inlier
    t, vals = max(by_type.items(), key=lambda kv: len(kv[1]))
    med0 = round(statistics.median(vals), 9)
    mad0 = round(statistics.median([abs(v - med0) for v in vals]), 9)
    planted = vals + [1e12]
    med1 = round(statistics.median(planted), 9)
    mad1 = round(statistics.median([abs(v - med1) for v in planted]), 9)

    def mad_flag(v, med, mad):
        return mad != 0 and abs(0.6745 * (v - med) / mad) > 3.5

    mad_flips = sum(
        1 for v in vals if mad_flag(v, med0, mad0) != mad_flag(v, med1, mad1)
    )
    assert mad_flips <= 1

    def z_flags(data):
        mu = statistics.fmean(data)
        sd = statistics.pstdev(data)
        return [abs(v - mu) / sd > 3.0 for v in vals]

    z0, z1 = z_flags(vals), z_flags(planted)
    z_flips = sum(1 for a, b in zip(z0, z1) if a != b)
    assert sum(z0) > 0  # the slice genuinely has z-outliers…
    assert sum(z1) == 0  # …which the planted point erases wholesale
    assert z_flips > mad_flips


def test_kmv_overlap_estimates_within_sketch_error(spark, sf_smoke):
    """KMV union estimates land within the sketch's error envelope
    (σ ≈ 1/√(k−1) ≈ 12.6% at k=64; allow 3σ) and intersection
    estimates stay ordered sanely (≤ union, ≥ 0)."""
    from heatmap_spark.operators.profiling import kmv_audience_overlap

    rows = kmv_audience_overlap(spark, sf_smoke).collect()
    assert len(rows) == 10  # 5 types → 10 unordered pairs
    for r in rows:
        assert r["exact_union"] > 0
        rel = abs(r["union_est"] - r["exact_union"]) / r["exact_union"]
        assert rel < 0.38, (r["type_a"], r["type_b"], r["union_est"], r["exact_union"])
        assert 0.0 <= r["inter_est"] <= r["union_est"] + 1e-9
        # intersection estimate tracks the exact within the coarser
        # KMV-intersection envelope (jaccard resolution is 1/64)
        slack = 3 * r["exact_union"] / 8  # 3·(1/√63 + 1/64)·union, loose
        assert abs(r["inter_est"] - r["exact_inter"]) < max(slack, 80), r


def test_drift_report_matches_python_psi(spark, sf_smoke):
    """PSI per type equals a pure-python replay (same floor-quantized
    terms), counts cover the stream, and PSI is non-negative up to the
    quantization floor — each (x−y)·ln(x/y) term is ≥ 0."""
    import math

    from heatmap_spark.operators.profiling import drift_report
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "ts", "value"
    )
    rows = ev.collect()
    import statistics

    split = statistics.median(r["ts"].timestamp() for r in rows)
    by_type = {}
    for r in rows:
        half = "a" if r["ts"].timestamp() <= split else "b"
        by_type.setdefault(r["event_type"], []).append((half, r["value"]))
    want = {}
    for t, vals in by_type.items():
        mn = min(v for _, v in vals)
        mx = max(v for _, v in vals)
        w = (mx - mn) / 10.0
        ca = [0] * 10
        cb = [0] * 10
        na = nb = 0
        for half, v in vals:
            b = min(int(math.floor((v - mn) / w)), 9) if mx > mn else 0
            if half == "a":
                ca[b] += 1
                na += 1
            else:
                cb[b] += 1
                nb += 1
        psi_int = 0
        for b in range(10):
            if ca[b] == 0 and cb[b] == 0:
                continue  # bin absent from the aggregate relation
            pa = (ca[b] + 0.5) / (na + 5.0)
            pb = (cb[b] + 0.5) / (nb + 5.0)
            psi_int += math.floor((pa - pb) * math.log(pa / pb) * 1e12)
        want[t] = (na, nb, psi_int / 1e12)
    got = {
        r["event_type"]: (r["n_first_half"], r["n_second_half"], r["psi"])
        for r in drift_report(spark, sf_smoke).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0] and got[t][1] == want[t][1], t
        assert abs(got[t][2] - want[t][2]) < 1e-12, t
        assert got[t][2] >= -1e-9  # PSI ≥ 0 up to quantization


def test_kmv_sketch_merge_identity(spark, sf_smoke):
    """KMV mergeability: the k smallest hashes of A ∪ B equal the k
    smallest of (sketch(A) ∪ sketch(B)) — stored 64-row sketches
    combine without touching raw data, like HLL registers."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.profiling import kmv_hashes
    from heatmap_spark.sources.tables import load_table

    k = 64
    ev = load_table(spark, sf_smoke, "events").select("event_type", "user_id")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "view")

    def sketch(df):
        hv = sorted(
            r["hv"]
            for r in kmv_hashes(
                df.select(F.lit("g").alias("g"), "user_id"), "user_id", ["g"]
            ).collect()
        )
        return hv[:k]

    merged_from_sketches = sorted(set(sketch(a)) | set(sketch(b)))[:k]
    direct = sketch(a.unionByName(b))
    assert merged_from_sketches == direct


def test_ks_test_matches_scipy_style_python(spark, sf_smoke):
    """KS D per type equals a pure-python two-sample computation over
    the same halves (the scipy ks_2samp definition), and planting an
    obvious distribution shift drives D toward 1."""
    import statistics

    from heatmap_spark.operators.profiling import ks_test
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "ts", "value"
    ).collect()
    split = statistics.median(r["ts"].timestamp() for r in ev)
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], ([], []))[
            0 if r["ts"].timestamp() <= split else 1
        ].append(r["value"])
    want = {}
    for t, (a, b) in by_type.items():
        xs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)

        def cdf_count(sorted_vals, x):
            import bisect

            return bisect.bisect_right(sorted_vals, x)

        sup = max(
            abs(cdf_count(sa, x) * nb - cdf_count(sb, x) * na) for x in xs
        )
        want[t] = (na, nb, sup)
    got = {
        r["event_type"]: (r["n_first_half"], r["n_second_half"], r["sup_numerator"])
        for r in ks_test(spark, sf_smoke).collect()
    }
    assert got == want
    for t, (na, nb, sup) in want.items():
        assert 0 <= sup <= na * nb

    # sanity of the statistic itself: disjoint supports give D = 1
    a = [1.0, 2.0, 3.0]
    b = [10.0, 11.0]
    sup = max(
        abs(sum(1 for v in a if v <= x) * len(b)
            - sum(1 for v in b if v <= x) * len(a))
        for x in sorted(set(a) | set(b))
    )
    assert sup == len(a) * len(b)


def test_mann_whitney_matches_scipy_when_available(spark, sf_smoke):
    """U and tie-corrected z match scipy.stats.mannwhitneyu where
    scipy exists; a pure-python rank-sum replay pins U2 regardless."""
    import statistics

    from heatmap_spark.operators.profiling import mann_whitney
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "ts", "value"
    ).collect()
    split = statistics.median(r["ts"].timestamp() for r in ev)
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], ([], []))[
            0 if r["ts"].timestamp() <= split else 1
        ].append(r["value"])

    got = {r["event_type"]: r for r in mann_whitney(spark, sf_smoke).collect()}
    for t, (a, b) in by_type.items():
        pooled = sorted(a + b)
        # doubled average rank per value: 2*min_rank + t - 1
        first = {}
        cnt = {}
        for i, v in enumerate(pooled):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        r2a = sum(2 * first[v] + cnt[v] - 1 for v in a)
        na, nb = len(a), len(b)
        u2 = r2a - na * (na + 1)
        assert got[t]["u2"] == u2, t
        assert got[t]["tie_term"] == sum(
            c**3 - c for c in cnt.values()
        ), t
        try:
            from scipy import stats as ss
        except ImportError:
            continue
        res = ss.mannwhitneyu(a, b, alternative="two-sided", method="asymptotic")
        assert abs(u2 / 2.0 - res.statistic) < 1e-9, t


def test_chi2_composition_matches_python(spark, sf_smoke):
    """Per-type contributions and the total equal a pure-python χ²
    homogeneity computation over the same halves, and scipy agrees on
    the statistic where available."""
    import math
    import statistics

    from heatmap_spark.operators.profiling import chi2_composition
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select("event_type", "ts").collect()
    split = statistics.median(r["ts"].timestamp() for r in ev)
    oa, ob = {}, {}
    for r in ev:
        d = oa if r["ts"].timestamp() <= split else ob
        d[r["event_type"]] = d.get(r["event_type"], 0) + 1
    types = sorted(set(oa) | set(ob))
    ta, tb = sum(oa.values()), sum(ob.values())
    n = ta + tb
    want = {}
    total_nano = 0
    for t in types:
        a, b = oa.get(t, 0), ob.get(t, 0)
        row = a + b
        ea = row * (ta / n)
        eb = row * (tb / n)
        cell = (a - ea) * (a - ea) / ea + (b - eb) * (b - eb) / eb
        nano = math.floor(cell * 1e9)
        want[t] = (a, b, nano)
        total_nano += nano
    got = {
        r["event_type"]: (r["n_first_half"], r["n_second_half"], r["chi2_contrib_nano"])
        for r in chi2_composition(spark, sf_smoke).collect()
    }
    for t in types:
        assert got[t] == want[t], t
    assert got["__total__"] == (ta, tb, total_nano)
    try:
        from scipy import stats as ss
    except ImportError:
        return
    table = [[oa.get(t, 0) for t in types], [ob.get(t, 0) for t in types]]
    chi2 = ss.chi2_contingency(table, correction=False).statistic
    assert abs(total_nano / 1e9 - chi2) < 1e-6
