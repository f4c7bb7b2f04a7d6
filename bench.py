#!/usr/bin/env python
"""Engine benchmark.

Default mode: run the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "...", "value": <docs/sec>, "unit": "docs/sec",
   "queries": {"q01...": sec, ...}, "sf": 0.1}

``value`` is the flagship spatial-join + tiling throughput: world documents
(roads) processed per second by q01 (cover join -> exact refine -> per-road
classification rollup), the reference pipeline's Part 1.

Scaling mode (--scaling): re-exec this script at two parallelism levels
(default N=8, 4N=32 — the sandbox stand-in for N vs 4N executors), compute
throughput at both and the scaling efficiency eff = (thr_4N / thr_N) / 4,
and rewrite the scaling section of BENCH.md.  The world-materialization cache
is warmed outside the timed region (it is input data, not query work).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_road_grid_classification",
    "q02_tile_assignment",
    "q03_point_in_polygon_scenery",
    "q04_distance_join_scenery",
    "q05_knn",
    "q06_kring_smoothing",
    "q07_intersection_detection",
    "q08_curvature",
    "q10_zonal_stats",
    "q12_urban_pressure",
    "q13_interleaved_roundtrip",
    "q15_ngram_jaccard_dedup",
    "q17_simhash_dedup",
    "q21_embedding_topk",
    "q22_lsh_ann",
    "q25_events_tumbling",
    "q27_urban_clusters",
]


def _sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(emit=print) -> dict:
    from osm_processing_pipeline_spark import registry
    from osm_processing_pipeline_spark.datagen import world
    from osm_processing_pipeline_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    # warm the input materialization (input data, not query work)
    n_docs = world.roads_materialized(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.time()
        rows[name] = fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        emit(f"  {name}: {timings[name]:.2f}s rows={rows[name]}", file=sys.stderr)

    flagship_s = timings["q01_road_grid_classification"]
    out = {
        "metric": "spatial-join+tiling throughput (flagship q01 road-docs/sec)",
        "value": round(n_docs / flagship_s, 1),
        "unit": "docs/sec",
        "queries": timings,
        "sf": _sf(SF_DIR),
        "docs": n_docs,
        "cpus": CPUS,
        "suite_wall_s": round(sum(timings.values()), 2),
    }
    spark.stop()
    return out


def run_scaling(levels=(8, 32)) -> dict:
    results = {}
    for n in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=SF_DIR)
        p = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    lo, hi = levels
    thr = {n: results[n]["docs"] / results[n]["suite_wall_s"] for n in levels}
    flag = {n: results[n]["value"] for n in levels}
    factor = hi / lo
    eff_suite = (thr[hi] / thr[lo]) / factor
    eff_flag = (flag[hi] / flag[lo]) / factor
    summary = {
        "levels": list(levels),
        "suite_docs_per_sec": {str(n): round(thr[n], 1) for n in levels},
        "flagship_docs_per_sec": {str(n): round(flag[n], 1) for n in levels},
        "scaling_efficiency_suite": round(eff_suite, 3),
        "scaling_efficiency_flagship": round(eff_flag, 3),
        "results": results,
    }
    return summary


def write_bench_md(summary: dict) -> None:
    lo, hi = summary["levels"]
    r = summary["results"]
    lines = [
        "# BENCH — engine throughput + two-level scaling evidence",
        "",
        f"Input: `{SF_DIR}` ({r[lo]['docs']} road documents, sf={r[lo]['sf']}).",
        "Protocol: identical suite at two parallelism levels on the same input —",
        f"`local[{lo}]` (N) vs `local[{hi}]` (4N) — standing in for N vs 4N executors",
        "(single machine; see BASELINE.md 'Engine benchmark protocol').",
        "",
        "| level | flagship q01 docs/sec | suite wall (s) | suite docs/sec |",
        "|---|---|---|---|",
    ]
    for n in summary["levels"]:
        lines.append(
            f"| local[{n}] | {summary['flagship_docs_per_sec'][str(n)]} "
            f"| {r[n]['suite_wall_s']} | {summary['suite_docs_per_sec'][str(n)]} |")
    lines += [
        "",
        f"**Scaling efficiency (flagship): {summary['scaling_efficiency_flagship']}**",
        f"(suite-level: {summary['scaling_efficiency_suite']}); target >= 0.8.",
        "",
        "Per-query seconds at each level:",
        "",
        "| query | " + " | ".join(f"local[{n}]" for n in summary["levels"]) + " |",
        "|---|" + "---|" * len(summary["levels"]),
    ]
    for q in HEADLINE:
        lines.append("| " + q + " | " + " | ".join(
            str(r[n]["queries"][q]) for n in summary["levels"]) + " |")
    lines.append("")
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        s = run_scaling()
        write_bench_md(s)
        print(json.dumps({k: v for k, v in s.items() if k != "results"}))
    else:
        res = run_suite()
        print(json.dumps(res))
