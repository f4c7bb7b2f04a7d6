"""spark-submit entry point.

    spark-submit --py-files engine.zip osm_processing_pipeline_spark/job.py \
        --query q01_road_grid_classification --sf-dir /root/testdata/sf0.01 \
        [--out /path/parquet] [--checkpointed --out-dir /ckpt --ranges 32]

Runs a registered query (or the full pipeline stage-by-stage with
per-partition checkpointing) on the cluster the session provides.  The
package is pure-Python + Arrow, so --py-files of the zipped package is the
complete deployment unit (the reference's single-machine runner scripts,
scripts/dev-runs/*, become this one parameterized job).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="q01_road_grid_classification")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="write result parquet here")
    ap.add_argument("--checkpointed", action="store_true",
                    help="run the flagship pieces stage with per-range checkpoints")
    ap.add_argument("--out-dir", default="/tmp/osm_engine_ckpt")
    ap.add_argument("--ranges", type=int, default=32)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from osm_processing_pipeline_spark import registry
    from osm_processing_pipeline_spark.session import apply_runtime_confs

    spark = SparkSession.builder.appName(f"osm-engine:{args.query}").getOrCreate()
    apply_runtime_confs(spark)

    if args.checkpointed:
        from osm_processing_pipeline_spark.datagen import world
        from osm_processing_pipeline_spark.operators import spatial_join
        from osm_processing_pipeline_spark.plans import checkpoint as CP
        from osm_processing_pipeline_spark.worldspec import NX, NY

        def df_fn():
            r = world.roads_materialized(spark, args.sf_dir)
            s = world.segments(spark, args.sf_dir, r)
            g = world.grids(spark)
            return spatial_join.segment_cell_pieces(s, g) \
                .select("osm_id", "grid_id", "piece_um")

        lin = CP.lineage_hash("pieces", [args.sf_dir])
        res = CP.run_stage(spark, "pieces", df_fn, "grid_id",
                           CP.make_ranges(0, NX * NY, args.ranges),
                           args.out_dir, lin)
        print(f"checkpointed stage: computed={len(res['computed'])} "
              f"skipped={len(res['skipped'])} rows={res['rows']}", file=sys.stderr)
        return 0

    if args.query not in registry.QUERIES:
        print(f"unknown query {args.query!r}; available: "
              f"{', '.join(sorted(registry.QUERIES))}", file=sys.stderr)
        return 2
    t0 = time.time()
    df = registry.QUERIES[args.query](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = df.count()
    print(f"{args.query}: rows={n} wall={time.time() - t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
