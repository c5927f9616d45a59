"""CLI entrypoint — the job-launch surface (reference E1 parity:
submit-heatmap:3-17 / heatmap.py:160-163, minus the k8s specifics).

    python -m heatmap_spark pyramid --events-dir /root/testdata/sf0.001 \
        --output /tmp/heatmaps [--mode explode|cascade] [--stage table]
    python -m heatmap_spark bench

The pyramid command runs locations→pyramid(→resultsets→table) and
writes parquet; `--stage pyramid` stops at the typed pyramid table.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="heatmap_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pyr = sub.add_parser("pyramid", help="build the heatmap pyramid end-to-end")
    pyr.add_argument("--events-dir", required=True, help="testdata sf dir with events.parquet")
    pyr.add_argument("--output", required=True, help="output parquet path")
    pyr.add_argument("--mode", default="explode", choices=["explode", "cascade"])
    pyr.add_argument(
        "--stage", default="table", choices=["pyramid", "resultsets", "table"],
        help="how far to take the dataflow before writing",
    )
    pyr.add_argument("--timespans", default="alltime", help="comma list: alltime,year,month,day")
    pyr.add_argument("--min-zoom", type=int, default=6)
    pyr.add_argument("--max-zoom", type=int, default=21)

    sub.add_parser("bench", help="run the headline bench (one JSON line)")

    cur = sub.add_parser(
        "curate", help="run the training-data curation pipeline on documents"
    )
    cur.add_argument("--sf-dir", required=True, help="testdata sf dir")
    cur.add_argument("--output", required=True, help="output parquet path")
    cur.add_argument(
        "--stages",
        default="classic",
        help=(
            "'classic' = the fixed curation_pipeline compose, or a comma "
            "list of fluent Corpus stages in order from: quality, "
            "repetition, decontaminate, dedup, dedup-exact, "
            "remove-passages, split"
        ),
    )

    crawl = sub.add_parser(
        "crawl",
        help="incremental-crawl dedup: flag document batches against a "
        "persistent LSH store at ingest time",
    )
    crawl.add_argument("--sf-dir", required=True, help="testdata sf dir")
    crawl.add_argument("--store", required=True, help="crawl store path")
    crawl.add_argument(
        "--batches", type=int, default=3, help="split documents into N ingest batches"
    )
    crawl.add_argument(
        "--compact", action="store_true", help="fold postings partials after the run"
    )

    drift = sub.add_parser(
        "drift",
        help="vocabulary-drift monitoring: ingest document batches into "
        "a persistent vocab store, printing per-batch drift metrics",
    )
    drift.add_argument("--sf-dir", required=True, help="testdata sf dir")
    drift.add_argument("--store", required=True, help="vocab store path")
    drift.add_argument(
        "--batches", type=int, default=3, help="split documents into N ingest batches"
    )
    drift.add_argument(
        "--compact", action="store_true", help="fold vocab partials after the run"
    )

    res = sub.add_parser(
        "resolve",
        help="entity resolution over the dirty multi-source customer "
        "fixture: blocking + similarity + connected components",
    )
    res.add_argument("--sf-dir", required=True, help="testdata sf dir")
    res.add_argument("--output", required=True, help="output parquet path")

    mix = sub.add_parser(
        "mix",
        help="epoch construction: exact per-language token budgets over "
        "the documents table",
    )
    mix.add_argument("--sf-dir", required=True, help="testdata sf dir")
    mix.add_argument("--output", required=True, help="output parquet path")
    mix.add_argument(
        "--budget", type=int, default=2000, help="token budget per language"
    )

    tok = sub.add_parser(
        "tokdrift",
        help="BPE-fertility drift: ingest document batches through the "
        "frozen merge list, printing per-batch fertility/drift",
    )
    tok.add_argument("--sf-dir", required=True, help="testdata sf dir")
    tok.add_argument("--store", required=True, help="bpe-drift store path")
    tok.add_argument(
        "--batches", type=int, default=3, help="split documents into N ingest batches"
    )

    bt = sub.add_parser(
        "backtest",
        help="forecast backtest: Holt vs seasonal-naive on the last 5 "
        "observations per event_type (MAE/MASE, winner verdict)",
    )
    bt.add_argument("--sf-dir", required=True, help="testdata sf dir")

    cl = sub.add_parser(
        "cluster",
        help="integer fixed-point k-means over the embeddings table "
        "(diversity clustering for corpus stratification)",
    )
    cl.add_argument("--sf-dir", required=True, help="testdata sf dir")
    cl.add_argument("--output", required=True, help="output parquet path")
    cl.add_argument("--k", type=int, default=8)
    cl.add_argument("--iters", type=int, default=2)

    rs = sub.add_parser(
        "rowstore",
        help="keyed row store (Python DataSource): load a table into a "
        "bucketed store, then run a keyed point read against it",
    )
    rs.add_argument("--sf-dir", required=True, help="testdata sf dir")
    rs.add_argument("--store", required=True, help="row store path")
    rs.add_argument("--table", default="documents", help="fixture table to load")
    rs.add_argument("--bucket-key", default="doc_id")
    rs.add_argument("--n-buckets", type=int, default=16)
    rs.add_argument("--get", help="optional: point-read this key after the write")

    ix = sub.add_parser(
        "index",
        help="build the term-bucketed inverted index, then serve a "
        "routed point query against it",
    )
    ix.add_argument("--sf-dir", required=True, help="testdata sf dir")
    ix.add_argument("--store", required=True, help="index store path")
    ix.add_argument("--query", default="spark,join,table", help="comma list of terms")
    ix.add_argument("--k", type=int, default=10)

    mg = sub.add_parser(
        "merge",
        help="MERGE INTO a row store (bucket rewrite + soft-delete log), "
        "then print the commit history",
    )
    mg.add_argument("--sf-dir", required=True, help="testdata sf dir")
    mg.add_argument("--store", required=True, help="row store path")

    dc = sub.add_parser(
        "datacard", help="print the one-row corpus datacard for a fixture dir"
    )
    dc.add_argument("--sf-dir", required=True, help="testdata sf dir")

    args = p.parse_args(argv)

    if args.cmd == "index":
        from heatmap_spark import get_spark
        from heatmap_spark.sources.tables import load_table
        from heatmap_spark.streaming.text_index import (
            build_inverted_index,
            search_index,
            term_bucket,
        )

        spark = get_spark("heatmap-spark-cli")
        docs = load_table(spark, args.sf_dir, "documents")
        build_inverted_index(docs, args.store)
        terms = [t for t in args.query.split(",") if t]
        print(f"routed buckets: {sorted({term_bucket(t) for t in terms})} of 64")
        for r in search_index(spark, args.store, terms, k=args.k).collect():
            print(f"doc {r['doc_id']}: tfidf={r['tfidf']} ({r['n_terms']} terms)")
        return 0

    if args.cmd == "merge":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.sources.locations import load_locations
        from heatmap_spark.sources.rowstore import (
            merge_upsert_rowstore,
            read_rowstore,
            rowstore_history,
            write_rowstore,
        )

        spark = get_spark("heatmap-spark-cli")
        loc = load_locations(spark, args.sf_dir)
        write_rowstore(loc, args.store, bucket_key="user_id", mode="overwrite")
        updates = loc.where(F.substring(F.md5("user_id"), 1, 1) <= "3").withColumn(
            "weight", F.col("weight") * 2
        )
        merge_upsert_rowstore(spark, updates, args.store)
        for h in rowstore_history(args.store):
            print(
                f"v{h['version']}: +{h['n_files_added']} files, "
                f"+{h['n_rows_added']} rows (cum {h['cum_rows']})"
            )
        print(f"current rows: {read_rowstore(spark, args.store).count()}; "
              f"as-of v1: {read_rowstore(spark, args.store, as_of_version=1).count()}")
        return 0

    if args.cmd == "datacard":
        from heatmap_spark import get_spark
        from heatmap_spark.operators.profiling import corpus_datacard

        spark = get_spark("heatmap-spark-cli")
        r = corpus_datacard(spark, args.sf_dir).first()
        for k in r.asDict():
            print(f"{k}: {r[k]}")
        return 0

    if args.cmd == "tokdrift":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.sources.tables import load_table
        from heatmap_spark.streaming.bpe_drift import (
            merge_batch_into_bpe_store,
            read_bpe_drift,
        )

        spark = get_spark("heatmap-spark-cli")
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        mx = docs.agg(F.max("doc_id")).first()[0] + 1
        n = args.batches
        for b in range(n):
            batch = docs.where(F.expr(f"CAST(doc_id * {n} DIV {mx} AS INT)") == b)
            merge_batch_into_bpe_store(spark, batch, args.store, b)
        for r in sorted(
            read_bpe_drift(spark, args.store).collect(),
            key=lambda r: r["batch_id"],
        ):
            print(
                f"batch {r['batch_id']}: {r['n_words']} words -> "
                f"{r['n_bpe_tokens']} bpe tokens, fertility={r['fertility']}, "
                f"drift={r['fertility_drift']:+}, frag={r['n_frag_words']}"
            )
        return 0

    if args.cmd == "backtest":
        from heatmap_spark import get_spark
        from heatmap_spark.operators.timeseries import forecast_backtest

        spark = get_spark("heatmap-spark-cli")
        for r in sorted(
            forecast_backtest(spark, args.sf_dir).collect(),
            key=lambda r: r["event_type"],
        ):
            print(
                f"{r['event_type']}: holt mae={r['mae_holt']} "
                f"(mase={r['mase_holt']}) vs snaive mae={r['mae_snaive']} "
                f"-> {r['winner']}"
            )
        return 0

    if args.cmd == "cluster":
        from heatmap_spark import get_spark
        from heatmap_spark.operators.similarity import kmeans_embeddings

        spark = get_spark("heatmap-spark-cli")
        out = kmeans_embeddings(spark, args.sf_dir, k=args.k, iters=args.iters)
        out.write.mode("overwrite").parquet(args.output)
        sizes = {
            r["cluster"]: r["cluster_size"]
            for r in spark.read.parquet(args.output)
            .select("cluster", "cluster_size")
            .distinct()
            .collect()
        }
        for c, n in sorted(sizes.items()):
            print(f"cluster {c}: {n} vectors")
        return 0

    if args.cmd == "rowstore":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.sources.rowstore import read_rowstore, write_rowstore
        from heatmap_spark.sources.tables import load_table

        spark = get_spark("heatmap-spark-cli")
        df = load_table(spark, args.sf_dir, args.table)
        write_rowstore(
            df, args.store, bucket_key=args.bucket_key,
            n_buckets=args.n_buckets, mode="overwrite",
        )
        back = read_rowstore(spark, args.store)
        print(f"wrote {back.count()} rows / {args.n_buckets} buckets to {args.store}")
        if args.get is not None:
            key = F.col(args.bucket_key).cast("string")
            hits = back.where(key == args.get).count()
            print(f"key {args.get!r}: {hits} rows (scan pruned to 1 bucket)")
        return 0

    if args.cmd == "mix":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.operators.textops import token_budget_mix

        spark = get_spark("heatmap-spark-cli")
        out = token_budget_mix(spark, args.sf_dir, budget_per_lang=args.budget)
        out.write.mode("overwrite").parquet(args.output)
        saved = spark.read.parquet(args.output)
        per = {
            r["lang"]: (r["n"], r["total"])
            for r in saved.groupBy("lang")
            .agg(F.count("*").alias("n"), F.max("cum_tokens").alias("total"))
            .collect()
        }
        for lang, (n, total) in sorted(per.items()):
            print(f"{lang}: {n} docs, {total}/{args.budget} tokens")
        return 0

    if args.cmd == "drift":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.sources.tables import load_table
        from heatmap_spark.streaming.vocab import (
            compact_vocab_store,
            merge_batch_into_vocab_store,
            read_vocab_drift,
        )

        spark = get_spark("heatmap-spark-cli")
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        mx = docs.agg(F.max("doc_id")).first()[0] + 1
        n = args.batches
        for b in range(n):
            batch = docs.where(F.expr(f"CAST(doc_id * {n} DIV {mx} AS INT)") == b)
            merge_batch_into_vocab_store(spark, batch, args.store, b)
        if args.compact:
            compact_vocab_store(spark, args.store)
        for r in sorted(
            read_vocab_drift(spark, args.store).collect(),
            key=lambda r: r["batch_id"],
        ):
            print(
                f"batch {r['batch_id']}: {r['n_tokens']} tokens, "
                f"{r['n_new_types']}/{r['n_types']} new types, "
                f"oov={r['oov_rate']}, l1={r['l1_drift']}"
            )
        return 0

    if args.cmd == "resolve":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.operators.entity import entity_resolution

        spark = get_spark("heatmap-spark-cli")
        out = entity_resolution(spark, args.sf_dir)
        out.write.mode("overwrite").parquet(args.output)
        saved = spark.read.parquet(args.output)
        n_rec = saved.count()
        n_ent = saved.select("entity_id").distinct().count()
        n_linked = saved.where(F.col("n_sources") > 1).count()
        print(
            f"wrote {n_rec} records -> {n_ent} entities to {args.output} "
            f"({n_linked} records in cross-source entities)"
        )
        return 0

    if args.cmd == "crawl":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.sources.tables import load_table
        from heatmap_spark.streaming.crawl import (
            compact_crawl_store,
            merge_batch_into_lsh_store,
            read_crawl_flags,
        )

        spark = get_spark("heatmap-spark-cli")
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        mx = docs.agg(F.max("doc_id")).first()[0] + 1
        n = args.batches
        for b in range(n):
            batch = docs.where(F.expr(f"CAST(doc_id * {n} DIV {mx} AS INT)") == b)
            merge_batch_into_lsh_store(spark, batch, args.store, b)
        if args.compact:
            compact_crawl_store(spark, args.store)
        counts = {
            (r.batch, r.status): r.n
            for r in read_crawl_flags(spark, args.store)
            .groupBy("batch", "status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for (b, s), c in sorted(counts.items()):
            print(f"batch {b}: {s} = {c}")
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark

        spark = get_spark("heatmap-spark-cli")
        if args.stages == "classic":
            from heatmap_spark.operators.dedup import curation_pipeline

            result = curation_pipeline(spark, args.sf_dir)
        else:
            from heatmap_spark.api import Corpus

            b = Corpus(spark).from_sf_dir(args.sf_dir)
            dispatch = {
                "quality": lambda b: b.quality_filter(),
                "repetition": lambda b: b.repetition_filter(),
                "decontaminate": lambda b: b.decontaminate(),
                "dedup": lambda b: b.dedup("minhash"),
                "dedup-exact": lambda b: b.dedup("exact"),
                "remove-passages": lambda b: b.remove_duplicated_passages(),
                "split": lambda b: b.split(),
            }
            for stage in args.stages.split(","):
                stage = stage.strip()
                if stage not in dispatch:
                    p.error(f"unknown curate stage {stage!r}")
                b = dispatch[stage](b)
            result = b.df()
        result.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        if "split" in out.columns:
            counts = {
                r.split: r.n
                for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
            }
            print(
                f"wrote {out.count()} curated docs to {args.output} (splits: {counts})"
            )
        else:
            print(f"wrote {out.count()} curated docs to {args.output}")
        return 0

    from heatmap_spark import get_spark
    from heatmap_spark.api import Heatmap

    spark = get_spark("heatmap-spark-cli")
    b = Heatmap(spark).from_events_dir(args.events_dir).pyramid(
        mode=args.mode,
        timespans=tuple(args.timespans.split(",")),
        min_zoom=args.min_zoom,
        max_zoom=args.max_zoom,
    )
    if args.stage in ("resultsets", "table"):
        b = b.resultsets()
    if args.stage == "table":
        b = b.table()
    b.save(args.output, mode="overwrite")
    n = spark.read.parquet(args.output).count()
    print(f"wrote {n} rows to {args.output} (stage={args.stage}, mode={args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
