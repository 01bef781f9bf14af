"""Fresh-session per-query bench (r9 VERDICT #2/#5).

The in-suite bench numbers for a handful of queries (the ANN family in
particular) drift 1.2-1.3x round-over-round from SUITE-POSITION state —
~170 queries of accumulated JVM/storage history — while isolated re-runs
land in their historical band. This tool makes the isolated number a
reproducible gate artifact instead of ad-hoc NOTES forensics: each query
runs in its OWN subprocess (clean JVM, clean runtime_cache, clean
storage pool) with the same warm-ups bench.py applies PLUS one
discarded warm run of the query itself (r10 VERDICT #2: without it the
first timed iteration carries 7-12 s of fresh-JVM cold cost on a loaded
host and the median is noise), and reports per-iteration wall-clock +
min + median.

Usage:
    python tools/bench_isolated.py [--sf-dir D] [--iters N] query...
        -> one JSON line: {query: {"iters": [...], "min": s, "median": s}}

    python tools/bench_isolated.py --single QUERY [--sf-dir D] [--iters N]
        -> child mode (one session, one query); the parent calls this.

bench.py shells out to the parent mode after its in-suite passes and
records the result under "queries_isolated" in BENCH_FULL.json, so every
BENCH_r{N} carries in-suite AND isolated numbers side by side.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_single(name: str, sf_dir: str, iters: int) -> dict:
    sys.path.insert(0, REPO_ROOT)
    import __spark_entry__ as entrymod
    from clickhouse_forecasting_spark.session import build_session

    spark = build_session(
        "bench_isolated", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()
    # the same two warm-ups bench.py applies, so isolated numbers are
    # comparable to in-suite ones: parquet footers + JVM, then the
    # Python/pandas-UDF worker pool
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from clickhouse_forecasting_spark.forecast import SeriesForecaster as _SF
    from clickhouse_forecasting_spark.sources import seriesgen as _sg

    _sg.register(spark)
    _warm = (
        spark.read.format("seriesgen")
        .option("series", "32").option("days", "15").load()
        .selectExpr("date AS ds", "CAST(series_id AS STRING) AS metric", "y")
    )
    _SF(interval=2, only_future=True).transform_long(_warm).collect()

    fn = qs[name]
    # one discarded warm run of the QUERY ITSELF before the timed loop
    # (r10 VERDICT #2): the generic warm-ups above don't fully warm a
    # fresh JVM on a loaded host — the driver's r10 isolated iterations
    # showed 7-12 s cold first iters (ann_scale_audit [9.84, 8.30, 2.88]),
    # making the reported median noise. With the query's own code paths
    # (codegen, shuffle machinery, any family stage build) warmed once,
    # every timed iteration measures steady state and median ~= min.
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    warm_sec = round(time.perf_counter() - t0, 3)
    times: list[float] = []
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(round(time.perf_counter() - t0, 3))
    return {
        "iters": times,
        "warm_discarded": warm_sec,
        "min": round(min(times), 3),
        "median": round(statistics.median(times), 3),
    }


def run_isolated(
    names: list[str], sf_dir: str, iters: int
) -> dict[str, dict]:
    """Parent mode: one clean subprocess per query; a failing query gets
    an "error" record instead of killing the rest."""
    out: dict[str, dict] = {}
    for name in names:
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--single", name, "--sf-dir", sf_dir, "--iters", str(iters),
            ],
            capture_output=True, text=True, timeout=1800,
        )
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
        if proc.returncode != 0 or rec is None:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            rec = {"error": " | ".join(tail)[:300] or "no output"}
        out[name] = rec
        print(f"# isolated {name}: {rec}", file=sys.stderr)
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("queries", nargs="*")
    p.add_argument("--single", default=None)
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    p.add_argument(
        "--iters",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_ISOLATE_ITERS", "3")),
    )
    args = p.parse_args()
    if args.single:
        print(json.dumps(run_single(args.single, args.sf_dir, args.iters)))
        return
    if not args.queries:
        p.error("pass query names (or --single QUERY)")
    print(json.dumps(run_isolated(args.queries, args.sf_dir, args.iters)))


if __name__ == "__main__":
    main()
