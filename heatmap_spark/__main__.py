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

    args = p.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from heatmap_spark import get_spark
        from heatmap_spark.operators.dedup import curation_pipeline

        spark = get_spark("heatmap-spark-cli")
        curation_pipeline(spark, args.sf_dir).write.mode("overwrite").parquet(
            args.output
        )
        out = spark.read.parquet(args.output)
        counts = {
            r.split: r.n
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        print(f"wrote {out.count()} curated docs to {args.output} (splits: {counts})")
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
