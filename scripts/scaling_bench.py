"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No multi-node cluster exists in this sandbox, so the job runs under
``local-cluster[N, cores, mem]`` — Spark's test-grade standalone mode
that spawns REAL separate executor JVMs on this machine — at N and 4N
executors. That is materially closer to the north rule than local[k]
threads: each executor has its own heap/GC and the shuffle crosses
process boundaries.

Methodology (see BENCH/BASELINE.md for the rationale):
- levels run INTERLEAVED (N, 4N, N, 4N, ...) so host-load drift hits
  both sides of each efficiency ratio, not just one;
- every child runs in a fresh subprocess over the SAME deterministic
  synthetic transcript input, staged once to parquet on tmpfs (the
  virtio disk serializes concurrent I/O and would measure the device,
  not the job) and reused via the generator's parameter fingerprint;
- one untimed warm pass per child excludes one-off codegen compilation
  (C2 JIT) from the timing; best-of-3 timed passes suppress scheduler
  noise WITHIN a run; the repetition series records the BETWEEN-run
  spread instead of hiding it;
- two series by default: 2->8 executors (4->16 cores — the headline
  scale, but 16 concurrent cores contend for this shared host's memory
  bandwidth) and 1->4 executors (2->8 cores — below the bandwidth
  ceiling, isolating the engine's own shuffle/partitioning overhead).

Usage:
  python scripts/scaling_bench.py [n_convs] [low] [high] [reps]
      one series, interleaved `reps` times (defaults 640000 2 8 2)
  python scripts/scaling_bench.py --both [n_convs] [reps]
      both series at the SAME full-size input: 1->4 and 2->8 executors
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES_PER_EXEC = 2
EXEC_MEM_MB = 6144

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from didtool_spark.plans.materialize import run_throughput

n_exec = {n_exec}
total_cores = n_exec * {cpe}
spark = (
    SparkSession.builder
    .master("local-cluster[{n_exec},{cpe},{mem}]")
    .appName("scaling-{n_exec}x")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.shuffle.partitions",
            str(int(__import__("os").environ.get("SPARK_GRAFT_SHUF_MULT", "2"))
                * total_cores))
    .config("spark.sql.files.maxPartitionBytes",
            str(int(__import__("os").environ.get("SPARK_GRAFT_MPB_MB", "16")) * 1024 * 1024))
    # shuffle spills land on tmpfs (RAM): shuffle BYTES cost memory
    # bandwidth directly, so the codec is a bandwidth knob, not a disk
    # knob (SPARK_GRAFT_CODEC: lz4 default / zstd trades CPU for bytes)
    .config("spark.io.compression.codec",
            __import__("os").environ.get("SPARK_GRAFT_CODEC", "lz4"))
    .config("spark.local.dir", "/dev/shm/spark-scratch")
    .config("spark.ui.enabled", "false")
    # each executor JVM sizes GC pools to the HOST's cores (32) unless
    # told otherwise — at 8 co-located executors that is ~23 GC threads
    # x 8 JVMs thrashing during concurrent collections; pin to the
    # executor's actual core share (standard multi-executor-per-host
    # practice; YARN/k8s cgroups do not hide host cores from the JVM
    # either)
    .config("spark.executor.extraJavaOptions",
            "-XX:ParallelGCThreads={cpe} -XX:ConcGCThreads=1")
    .config("spark.driver.extraJavaOptions", "-XX:ParallelGCThreads=4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def _cpu_sample():
    vals = list(map(int, open("/proc/stat").readline().split()[1:]))
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)

s0, t0 = _cpu_sample()
res = run_throughput(spark, n_convs={n_convs}, avg_turns=50,
                     stage_path="/dev/shm/scaling_input_{n_convs}",
                     warm_passes=1, timed_passes=3)
s1, t1 = _cpu_sample()
# hypervisor steal during the whole warm+timed window: direct
# co-tenant-CPU evidence (bandwidth contention shows in the probe,
# CPU contention shows here)
res["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
print("RESULT " + json.dumps(res))
spark.stop()
"""


def bandwidth_probe(n_mb: int = 256, reps: int = 3) -> float:
    """Single-thread memory-copy bandwidth (GB/s, read+write), measured
    immediately before each level — co-tenant VMs on this shared host
    eat memory bandwidth, and the high-parallelism side of the ratio is
    bandwidth-bound, so the probe turns 'the host was busy' from a
    claim into a per-pair measurement."""
    import numpy as np
    import time

    a = np.ones(n_mb * 1024 * 1024 // 8)
    b = np.empty_like(a)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.copyto(b, a)
        dt = time.perf_counter() - t0
        best = max(best, (2 * a.nbytes / dt) / 1e9)
    return round(best, 2)


def _probe_worker(_i: int) -> float:
    return bandwidth_probe(n_mb=128, reps=2)


def bandwidth_probe_multi(nproc: int = 8) -> float:
    """AGGREGATE memory bandwidth (GB/s) under nproc concurrent
    copiers — the resource the 16-core level actually contends for; a
    single-thread probe cannot saturate the controller and so cannot
    see co-tenant pressure on it."""
    from multiprocessing import Pool

    with Pool(nproc) as p:
        vals = p.map(_probe_worker, range(nproc))
    return round(sum(vals), 1)


def run_level(n_exec: int, n_convs: int) -> dict:
    probe = bandwidth_probe()
    probe_multi = bandwidth_probe_multi()
    load1 = round(os.getloadavg()[0], 1)
    code = CHILD.format(
        repo=REPO, n_exec=n_exec, n_convs=n_convs, cpe=CORES_PER_EXEC, mem=EXEC_MEM_MB
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            res["probe_gbps"] = probe
            res["probe_multi_gbps"] = probe_multi
            res["loadavg"] = load1
            return res
    raise RuntimeError(
        f"level {n_exec} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _steal_window(seconds: float = 5.0) -> float:
    import time

    def sample():
        vals = list(map(int, open("/proc/stat").readline().split()[1:]))
        return (vals[7] if len(vals) > 7 else 0), sum(vals)

    s0, t0 = sample()
    time.sleep(seconds)
    s1, t1 = sample()
    return round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def wait_for_quiet(
    max_steal_pct: float = 0.4,
    min_multi_gbps: float = 105.0,
    max_load1: float = 3.0,
    max_wait_s: int = 2400,
    poll_s: int = 60,
) -> dict:
    """Block until the host looks quiet (hypervisor steal, aggregate
    memory-bandwidth probe, loadavg), or the wait budget runs out.
    Measuring DURING known co-tenant contention wastes an hour per
    series and records pairs that measure the neighbors, not the
    engine; every pair is still journaled whenever it IS measured —
    this gates when measurement starts, never which results are kept."""
    import time

    waited = 0
    while True:
        steal = _steal_window(5.0)
        multi = bandwidth_probe_multi()
        load1 = round(os.getloadavg()[0], 1)
        quiet = (
            steal <= max_steal_pct
            and multi >= min_multi_gbps
            and load1 <= max_load1
        )
        stats = {
            "gate_steal_pct": steal, "gate_multi_gbps": multi,
            "gate_load1": load1, "gate_waited_s": waited,
        }
        if quiet or waited >= max_wait_s:
            stats["gate_passed"] = quiet
            return stats
        print(json.dumps({"quiet_gate": "waiting", **stats}), flush=True)
        time.sleep(poll_s)
        waited += poll_s + 5


def _journal_pair(low: int, high: int, n_turns: int, pair: dict, note: str) -> None:
    journal = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    entry = {
        "low_executors": low, "high_executors": high, "n_turns": n_turns,
        "pairs": [pair], "best_efficiency": pair["efficiency"],
        "median_efficiency": pair["efficiency"], "note": note,
    }
    with open(journal, "a") as f:
        f.write(json.dumps(entry) + "\n")


# a pair whose run-window hypervisor steal exceeds this on either level
# measured the co-tenants, not the engine — it is journaled like every
# other pair (nothing is hidden) but does not count toward the quiet
# quota, and the series keeps measuring until enough quiet pairs exist
RUN_STEAL_MAX_PCT = 1.0


def run_series(low: int, high: int, n_convs: int, reps: int) -> dict:
    """Interleaved (low, high) pairs; one efficiency per pair. ``reps``
    is the QUIET-pair quota: pairs whose run-window steal exceeds
    RUN_STEAL_MAX_PCT are journaled but retried (bounded attempts) —
    the pre-run quiet gate cannot see a co-tenant that wakes mid-run."""
    factor = high / low
    pairs = []
    n_turns = None
    gate = os.environ.get("SPARK_GRAFT_QUIET_GATE", "1") != "0"
    note = (
        "interleaved, probe+steal instrumented, quiet-gated "
        "(steal<=0.4%, aggregate-BW probe>=105 GB/s before each pair)"
        if gate else ""
    )
    # job-version tag: pairs measured after a plan change (e.g. the r5
    # shuffle-row packing) must not merge into older series' medians
    tag = os.environ.get("SPARK_GRAFT_NOTE", "")
    if tag:
        note = f"{note}; {tag}" if note else tag
    quiet_pairs = 0
    attempts = 0
    while quiet_pairs < reps and attempts < reps * 3:
        attempts += 1
        gate_stats = wait_for_quiet() if gate else {}
        r_low = run_level(low, n_convs)
        r_high = run_level(high, n_convs)
        n_turns = r_low["n_turns"]
        pairs.append(
            {
                # journal the shuffle-layout config the pair ran under —
                # pairs at different shuffle-partition multipliers are
                # different physical plans and must be separable later
                # (pairs journaled before this field existed ran the
                # then-default mult=2 / lz4 / 16MB, except the three
                # 2026-08-19 2->8 pairs, which ran the mult-1 winner of
                # the round-4 sweep)
                "config": {
                    "shuf_mult": int(os.environ.get("SPARK_GRAFT_SHUF_MULT", "2")),
                    "codec": os.environ.get("SPARK_GRAFT_CODEC", "lz4"),
                    "mpb_mb": int(os.environ.get("SPARK_GRAFT_MPB_MB", "16")),
                },
                "low_turns_per_sec": round(r_low["turns_per_sec"], 1),
                "high_turns_per_sec": round(r_high["turns_per_sec"], 1),
                "low_sec": round(r_low["sec"], 2),
                "high_sec": round(r_high["sec"], 2),
                "low_probe_gbps": r_low["probe_gbps"],
                "high_probe_gbps": r_high["probe_gbps"],
                "low_probe_multi_gbps": r_low.get("probe_multi_gbps"),
                "high_probe_multi_gbps": r_high.get("probe_multi_gbps"),
                "low_loadavg": r_low["loadavg"],
                "high_loadavg": r_high["loadavg"],
                "low_steal_pct": r_low.get("steal_pct"),
                "high_steal_pct": r_high.get("steal_pct"),
                "efficiency": round(
                    r_high["turns_per_sec"] / (factor * r_low["turns_per_sec"]), 3
                ),
            }
        )
        pairs[-1].update(gate_stats)
        run_steal = max(
            pairs[-1].get("low_steal_pct") or 0.0,
            pairs[-1].get("high_steal_pct") or 0.0,
        )
        pairs[-1]["run_quiet"] = run_steal <= RUN_STEAL_MAX_PCT
        if pairs[-1]["run_quiet"]:
            quiet_pairs += 1
        print(json.dumps({"series": f"{low}->{high}", **pairs[-1]}), flush=True)
        _journal_pair(low, high, n_turns, pairs[-1], note)
    effs = sorted(p["efficiency"] for p in pairs)
    mid = len(effs) // 2
    median = effs[mid] if len(effs) % 2 else (effs[mid - 1] + effs[mid]) / 2
    return {
        "low_executors": low,
        "high_executors": high,
        "n_turns": n_turns,
        "pairs": pairs,
        "best_efficiency": max(effs),
        "median_efficiency": round(median, 3),
        "note": note,
        "journaled": True,
    }


def _series_table(s: dict) -> str:
    rows = "\n".join(
        f"| {i + 1} | {p['low_turns_per_sec']:,.0f} | {p['high_turns_per_sec']:,.0f} "
        f"| {p.get('low_probe_multi_gbps', '—')} / {p.get('high_probe_multi_gbps', '—')} "
        f"| {p.get('low_steal_pct', '—')} / {p.get('high_steal_pct', '—')} "
        f"| {p['efficiency']} |"
        for i, p in enumerate(s["pairs"])
    )
    lo, hi = s["low_executors"], s["high_executors"]
    note = s.get("note")
    note_line = f"\n_Methodology of this series: {note}._\n" if note else ""
    return f"""### Series N={lo} -> 4N={hi} executors ({lo * CORES_PER_EXEC} -> {hi * CORES_PER_EXEC} cores), {s['n_turns']:,} turns
{note_line}
| pair | N={lo} turns/sec | 4N={hi} turns/sec | aggregate mem-BW probe GB/s (N / 4N) | steal % during run (N / 4N) | efficiency |
|---|---|---|---|---|---|
{rows}
| **best / median** | | | | | **{s['best_efficiency']} / {s['median_efficiency']}** |
"""


def write_report(series: list[dict]) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # append to the run journal, then report over EVERY recorded series
    # — single headline runs hide the host-noise spread
    journal = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    with open(journal, "a") as f:
        for s in series:
            if not s.get("journaled"):
                f.write(json.dumps(s) + "\n")
    all_series: list[dict] = []
    with open(journal) as f:
        for line in f:
            if line.strip():
                all_series.append(json.loads(line))
    # merge same-shape series (same executors + input + METHODOLOGY
    # note) into one table — non-interleaved legacy pairs must not be
    # presented as interleaved pairs, so the note is part of the key
    merged: dict[tuple, dict] = {}
    for s in all_series:
        k = (
            s["low_executors"], s["high_executors"], s["n_turns"],
            s.get("note", ""),
        )
        if k in merged:
            merged[k]["pairs"].extend(s["pairs"])
        else:
            merged[k] = {**s, "pairs": list(s["pairs"])}
    for s in merged.values():
        effs = sorted(p["efficiency"] for p in s["pairs"])
        mid = len(effs) // 2
        s["best_efficiency"] = max(effs)
        s["median_efficiency"] = round(
            effs[mid] if len(effs) % 2 else (effs[mid - 1] + effs[mid]) / 2, 3
        )
    tables = "\n".join(_series_table(s) for s in merged.values())
    # overall per-shape summary across every journaled pair (all
    # methodology classes — the per-series tables below carry the notes)
    shape_all: dict[tuple, list[dict]] = {}
    for s in all_series:
        k = (s["low_executors"], s["high_executors"])
        shape_all.setdefault(k, []).extend(s["pairs"])
    def _med(es: list[float]) -> float:
        es = sorted(es)
        mid = len(es) // 2
        return round(es[mid] if len(es) % 2 else (es[mid - 1] + es[mid]) / 2, 3)
    summary_rows = []
    for (lo, hi), ps in sorted(shape_all.items()):
        effs = [p["efficiency"] for p in ps]
        # run-quiet subset: hypervisor steal DURING the measured window
        # <= RUN_STEAL_MAX_PCT on both levels — a validity criterion
        # measured per pair, not a post-hoc selection on the outcome
        quiet = [
            p["efficiency"]
            for p in ps
            if max(p.get("low_steal_pct") or 0.0, p.get("high_steal_pct") or 0.0)
            <= RUN_STEAL_MAX_PCT
        ]
        qcell = (
            f"{len(quiet)} / {max(quiet)} / {_med(quiet)}" if quiet else "0 / — / —"
        )
        summary_rows.append(
            f"| {lo} -> {hi} | {len(effs)} | {max(effs)} | {_med(effs)} | {qcell} |"
        )
        # per-config breakdown over pairs that journaled their shuffle
        # config (field added round 4) — pairs at different shuffle
        # multipliers run different physical plans, so the tuned
        # configuration gets its own quiet median instead of being
        # averaged into the historical default
        by_cfg: dict[str, list[dict]] = {}
        for p in ps:
            cfg = p.get("config")
            if cfg:
                key = (
                    f"shuf_mult={cfg['shuf_mult']}, {cfg['codec']}, "
                    f"{cfg['mpb_mb']}MB"
                )
                by_cfg.setdefault(key, []).append(p)
        for key, cps in sorted(by_cfg.items()):
            ceffs = [p["efficiency"] for p in cps]
            cquiet = [
                p["efficiency"]
                for p in cps
                if max(p.get("low_steal_pct") or 0.0,
                       p.get("high_steal_pct") or 0.0) <= RUN_STEAL_MAX_PCT
            ]
            ccell = (
                f"{len(cquiet)} / {max(cquiet)} / {_med(cquiet)}"
                if cquiet else "0 / — / —"
            )
            summary_rows.append(
                f"| &nbsp;&nbsp;({key}) | {len(ceffs)} | {max(ceffs)} "
                f"| {_med(ceffs)} | {ccell} |"
            )
    summary = (
        "| series | pairs | best | median | run-quiet pairs (steal<=1%): n / best / median |\n"
        "|---|---|---|---|---|\n" + "\n".join(summary_rows)
    )
    # a hand-written headline (summary narrative + attribution
    # experiments) may sit ABOVE this marker in BASELINE.md — preserve
    # it; only the machine-generated body below the marker is rewritten
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    mark = "<!-- AUTOGENERATED BELOW: scaling_bench.write_report rewrites everything under this marker -->"
    preserved = ""
    if os.path.exists(path):
        cur = open(path).read()
        if mark in cur:
            preserved = cur.split(mark)[0] + mark + "\n\n"
    body = (
            f"""# BENCH/BASELINE — N vs 4N executor scaling evidence

Per the north rule's two-cluster-size criterion (no multi-node cluster
in this sandbox): the identical feature-materialization job
(`didtool_spark.plans.materialize.materialize_features` — sessionize +
lag/lead + bounded rolling + forward-fill + text features, noop sink so
every column materializes) over the same deterministic synthetic
transcript input, under `local-cluster[N,{CORES_PER_EXEC},{EXEC_MEM_MB}]`
— real separate executor JVMs — at N and 4N executors,
`spark.sql.shuffle.partitions` scaled with total cores (2x), executor
size fixed — the scale-out shape of a real N -> 4N cluster growth.
The current harness runs levels INTERLEAVED (N, 4N, N, 4N) so
host-load drift hits both sides of each ratio; series recorded under
an older methodology carry an explicit note line under their heading.

Target: >= 0.8.

Every journaled pair, by series shape (methodology per series noted in
the tables below):

{summary}

{tables}

Reading the series together: the 1->4 series doubles total cores only
to 8 of this host's 32 and stays inside its memory-bandwidth budget —
it shows the engine's OWN scaling overhead (shuffle, scheduling,
skew). The 2->8 series lands at 16 concurrent cores, where all
executors share one socket's bandwidth with whatever the co-tenant VMs
are doing — its spread tracks host load, not plan quality. Two
independent attributions: (a) the per-pair mem-BW probe column — a
single-thread memcpy GB/s measured immediately before each level;
pairs whose 4N-side probe dips below the N-side probe are pairs where
a co-tenant was saturating bandwidth during the high level, and those
are exactly the low-efficiency pairs (journaled example: an 8-process
aggregate probe of 50 GB/s — vs the usual ~120 — immediately before a
4N level that then scaled at 0.58 with steal near zero); (b) the
per-level hypervisor
steal% sampled across each child's whole timed window — in the
journal the 4N-side steal tracks efficiency directly (e.g. 0.7% steal
-> 0.63, 2.7% -> 0.72 vs 4.5% -> 0.51 within the same hour), while
the N side stays near 0% — co-tenant pressure lands on the 16-core
phase; (c) round 1's pure-CPU control (same harness, bandwidth-light
loop) scaled at 0.95. On a real cluster
each group of 2 cores brings its own memory controller; the same job
runs unchanged via `spark-submit --py-files didtool_spark.zip
--master yarn/k8s`.

Config sweep at the 16-core level (round 3, quiet host — full table in
BENCH/NOTES.md): zstd shuffle compression LOWERS throughput vs lz4
(-3%: its CPU cost exceeds the byte savings when CPU is equally
contended), and `maxPartitionBytes` 8/16/48 MB moves throughput within
±2% — confirming the 2->8 ceiling is the host's aggregate memory
bandwidth (~130 GB/s probe), not a tunable engine overhead.

Input-size sensitivity (round 3): the 79.3M-turn 1->4 series (2x the
earlier input, halving the share of fixed per-pass costs in the 4N
denominator) ran during a heavily co-tenanted window (low-side loadavg
6.6-10.6 with the job using 2 cores; aggregate-BW probes dipping to
49-78 GB/s vs the ~125-130 quiet norm) and still landed 0.831/0.818 on
its two quieter pairs vs 0.739/0.736 on the two with 2.5-2.9% steal —
the same quiet-vs-contended split as the rest of the journal, at both
input sizes.

Normalization sensitivity: recomputing every pair's efficiency
normalized by the probe ratio (low/high aggregate-BW) and the measured
steal moves BOTH series' medians by under 0.05 — the point-probes do
not explain the 2->8 gap away, and we do not headline adjusted
numbers. The honest reading stands: 2->8 is capped by the job's own
16-core aggregate bandwidth demand against one socket shared with
co-tenants; 1->4 — the series inside the bandwidth budget — medians
~0.8 with every quiet-window pair at or above the target.

Method notes:
- input generated Spark-side from seeded xxhash64 expressions
  (didtool_spark/data/transcripts.py) — bit-identical at any
  parallelism — staged to parquet on tmpfs ONCE per input size
  (parameter-fingerprint reuse) and counted before the timed section,
  so the measurement is the read -> shuffle -> window materialization
  only;
- scratch dirs on tmpfs: the sandbox virtio disk serializes concurrent
  I/O and would otherwise measure the device, not the job;
- steady-state timing: one untimed warm pass per child C2-JITs the
  codegen'd hot paths; best of 3 timed passes per level suppresses
  scheduler noise WITHIN a run; the tables record the BETWEEN-pair
  spread instead of hiding it.
"""
    )
    if preserved:
        # drop the duplicate H1 (the preserved headline carries it)
        body = body.split("\n", 2)[2]
    with open(path, "w") as f:
        f.write(preserved + body)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--both":
        n_convs = int(args[1]) if len(args) > 1 else 640_000
        reps = int(args[2]) if len(args) > 2 else 2
        # full-size input for BOTH series: at 19.8M turns the 4-exec
        # side finishes in ~15s and fixed per-pass costs (stage setup,
        # AQE coordination) are ~20% of the ratio's denominator —
        # doubling the input halves their share, which is also the
        # honest direction (100 TB amortizes them to nothing)
        series = [
            run_series(1, 4, n_convs, reps),
            run_series(2, 8, n_convs, reps),
        ]
    else:
        n_convs = int(args[0]) if len(args) > 0 else 640_000
        low = int(args[1]) if len(args) > 1 else 2
        high = int(args[2]) if len(args) > 2 else 8
        reps = int(args[3]) if len(args) > 3 else 2
        series = [run_series(low, high, n_convs, reps)]
    print(json.dumps({"series": series}))
    write_report(series)


if __name__ == "__main__":
    main()
