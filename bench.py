#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus an extraction-throughput segment over a
synthetic page corpus, and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Scaling mode (north rule evidence: N vs 4N cores on the same input):
  python bench.py --scaling [--docs 60000] [--runs 3]
runs the SAME extraction job at local[8] and local[32] in fresh JVMs,
reports docs/s at both and efficiency = (T32/T8)/4, and rewrites
BENCH/BASELINE.md.

Worker mode (internal): --extract-worker --cpus K --corpus DIR prints one
JSON line with the measured extraction wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, "BENCH")

# Headline queries: the UDF-heavy extraction roundtrip + one representative
# per operator family (join, agg, window, topk, dedup sketch, ANN).
HEADLINE = [
    "extract_html_roundtrip",
    "j6_large_sortmerge_join",
    "j3_interval_range_join",
    "a1_projection_profile_sum",
    "a4_ordered_text_assembly",
    "w1_sessionize_gaps_islands",
    "w4_rank_per_group",
    "t3_global_topk",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "text_quality_score",
    "f10_array_explode_topwords",
    "multimodal_frame_sample",
]


def _force(df) -> int:
    """Execute the full plan without driver-side materialization cost."""
    return df.write.format("noop").mode("overwrite").save() or 0


def _bench_corpus(n_docs: int, seed: int = 42) -> str:
    """Synthesize (once) and cache the bench page corpus."""
    out = os.path.join(BENCH_DIR, f"corpus_{n_docs}_{seed}")
    marker = os.path.join(out, "_READY")
    if not os.path.exists(marker):
        from ocr_spark.synth import write_corpus
        write_corpus(out, n_docs, seed=seed)
        open(marker, "w").close()
    return out


def run_default() -> None:
    from ocr_spark.queries import all_queries
    from ocr_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ocr_spark_bench")
    specs = {s.name: s for s in all_queries()}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        # min of 2 runs: the sandbox host shows large external CPU-noise
        # spikes (identical warmed plans vary 5-10x); min is the robust
        # statistic for "what the plan actually costs".
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(spec.spark(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # Extraction throughput segment over the synthetic page corpus.
    from ocr_spark.plans.extract_job import extract_pages
    corpus = _bench_corpus(int(os.environ.get("OCR_BENCH_DOCS", "5000")))
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    n = pages.count()
    t0 = time.perf_counter()
    _force(extract_pages(pages, n_buckets=64, salt_n=8))
    dt = time.perf_counter() - t0
    timings["extract_pipeline"] = round(dt, 3)
    timings["extract_docs_per_sec"] = round(n / dt, 1)

    total = round(sum(v for k, v in timings.items()
                      if k != "extract_docs_per_sec"), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_queries_total_plus_extract",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


def run_extract_worker(cpus: int, corpus: str) -> None:
    from ocr_spark.plans.extract_job import extract_pages
    from ocr_spark.session import get_spark

    spark = get_spark(app_name=f"scal_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    n = pages.count()
    _force(extract_pages(pages.limit(512), n_buckets=8, salt_n=4))  # warm up
    t0 = time.perf_counter()
    _force(extract_pages(pages, n_buckets=max(64, cpus * 2), salt_n=8))
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "docs": n, "sec": round(dt, 3),
                      "docs_per_sec": round(n / dt, 1)}))
    spark.stop()


def run_scaling(docs: int, runs: int) -> None:
    corpus = _bench_corpus(docs)
    results: dict[int, list[dict]] = {8: [], 32: []}
    for r in range(runs):
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--extract-worker", "--cpus", str(cpus),
                 "--corpus", corpus],
                capture_output=True, text=True, check=True, cwd=REPO)
            line = out.stdout.strip().splitlines()[-1]
            results[cpus].append(json.loads(line))
            print(f"run {r} local[{cpus}]: {line}", file=sys.stderr)

    med = {c: statistics.median(x["sec"] for x in results[c])
           for c in results}
    tput = {c: statistics.median(x["docs_per_sec"] for x in results[c])
            for c in results}
    eff = (med[8] / med[32]) / 4.0
    report = {
        "docs": docs, "runs": runs,
        "local8_sec": med[8], "local32_sec": med[32],
        "local8_docs_per_sec": tput[8], "local32_docs_per_sec": tput[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report))
    _write_baseline_md(report, results)


def _write_baseline_md(report: dict, results: dict) -> None:
    os.makedirs(BENCH_DIR, exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured scaling evidence",
        "",
        "North-rule criterion: throughput-scaling efficiency >= 0.8 between",
        "N and 4N executors. Sandbox protocol (no real cluster): the SAME",
        "extraction job at local[8] vs local[32], same input, fresh JVM per",
        "run, median of repeated runs.",
        "",
        f"- corpus: {report['docs']} synthetic pages (seed 42, "
        f"FIXTURES.md mix incl. 5 MB doc, PDFs, degenerates)",
        f"- runs per config: {report['runs']} (medians reported)",
        "",
        "| config | wall sec | docs/s |",
        "|---|---|---|",
        f"| local[8]  | {report['local8_sec']} | "
        f"{report['local8_docs_per_sec']} |",
        f"| local[32] | {report['local32_sec']} | "
        f"{report['local32_docs_per_sec']} |",
        "",
        f"**Scaling efficiency (T8/T32)/4 = "
        f"{report['scaling_efficiency_8_to_32']}**",
        "",
        "Raw runs:",
        "```json",
        json.dumps(results, indent=1),
        "```",
        "",
        "Reproduce: `python bench.py --scaling --docs "
        f"{report['docs']} --runs {report['runs']}`",
    ]
    with open(os.path.join(BENCH_DIR, "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--corpus", type=str, default="")
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("OCR_SCALING_DOCS", "60000")))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.extract_worker:
        run_extract_worker(args.cpus, args.corpus)
    elif args.scaling:
        run_scaling(args.docs, args.runs)
    else:
        run_default()


if __name__ == "__main__":
    main()
