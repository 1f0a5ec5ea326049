"""Two-cluster-size scaling benchmark (north_rule evidence): runs the
identical index-build + BM25 job via ``spark-submit --py-files`` at
local[N] and local[4N] on the same input and reports throughput at both
plus scaling efficiency → BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_turns] [N_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


PIN_CORES = os.environ.get("FTSE_SCALING_PIN", "1") == "1"


def _spin(_):
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    while _t.perf_counter() - t0 < 2.0:
        for _ in range(10000):
            x += 1
    return x


def _pin_affinity(nproc: int):
    if PIN_CORES:
        os.sched_setaffinity(0, set(range(nproc)))


def _spin_mops(nproc: int) -> float:
    import multiprocessing as mp

    with mp.Pool(nproc, initializer=_pin_affinity, initargs=(nproc,)) as pool:
        return sum(pool.map(_spin, range(nproc))) / 2e6


def make_pkg_zip(dest: Path) -> None:
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for p in (REPO / "fulltextsearchengine_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))


def run_at(cores: int, pkg: Path, corpus: Path) -> dict:
    out = Path(tempfile.mkstemp(suffix=".json")[1])
    # Pin each config to exactly its core count (cluster-size proxy
    # fidelity): an UNPINNED local[8] on a 32-core host borrows the idle
    # 24 cores for GC/JIT/OS threads and enjoys 4x the per-thread memory
    # bandwidth a real 8-core executor set would have — overstating the
    # small-cluster baseline and so understating N->4N efficiency.
    pin = ["taskset", "-c", f"0-{cores - 1}"] if PIN_CORES else []
    cmd = pin + [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(pkg),
        str(REPO / "scripts" / "bench_job.py"),
        str(corpus), str(out),
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, stdout=sys.stderr, stderr=sys.stderr)
    return json.loads(out.read_text())


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from bench import ensure_bench_corpus

    corpus = ensure_bench_corpus(n_turns, REPO / ".bench")
    pkg = Path(tempfile.mkstemp(suffix=".zip")[1])
    make_pkg_zip(pkg)

    # best-of-2 per config: the sandbox VM shows transient external CPU
    # contention (observed a 30 s job take 252 s); min is the honest
    # estimate of the machine's capability
    def best_of(cores: int, reps: int = 2) -> dict:
        runs = [run_at(cores, pkg, corpus) for _ in range(reps)]
        return min(runs, key=lambda r: r["build_sec"])

    # environment control: pure-CPU aggregate throughput at N vs 4N
    # processes. If the MACHINE can't scale (shared host, bandwidth
    # caps), no Spark job on it can — this line lets a reader separate
    # environment limits from code limits.
    cpu_n, cpu_4n = _spin_mops(n_cores), _spin_mops(n_cores * 4)
    cpu_scaling = cpu_4n / cpu_n / 4.0

    r_n = best_of(n_cores)
    r_4n = best_of(n_cores * 4)

    eff_build = (r_n["build_sec"] / r_4n["build_sec"]) / 4.0
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Same `spark-submit --py-files` job (scripts/bench_job.py: full index build",
        f"+ BM25 top-10 × {r_n['n_queries']} queries) on the identical seeded corpus of",
        f"{r_n['n_turns']:,} transcript turns; sandbox proxy for N vs 4N executors is",
        f"local[{n_cores}] vs local[{n_cores * 4}] (one JVM, shared page cache — a conservative",
        "proxy: a real cluster adds network shuffle but also 4× memory bandwidth).",
        (
            f"Each config is PINNED (taskset) to exactly its core count — an unpinned "
            f"local[{n_cores}] borrows the idle cores' memory bandwidth and GC/JIT threads, "
            "overstating the small-cluster baseline vs a real N-core executor set."
            if PIN_CORES
            else "Configs run UNPINNED (FTSE_SCALING_PIN=0)."
        ),
        "",
        "| config | build sec | build turns/sec | BM25 p-avg latency (s) |",
        "|---|---|---|---|",
        f"| local[{r_n['cores']}] | {r_n['build_sec']} | {r_n['build_turns_per_sec']:,} | {r_n['bm25_latency_sec']} |",
        f"| local[{r_4n['cores']}] | {r_4n['build_sec']} | {r_4n['build_turns_per_sec']:,} | {r_4n['bm25_latency_sec']} |",
        "",
        f"**Index-build throughput scaling efficiency (N→4N): {eff_build:.3f}**"
        + (" ✓ (≥0.8)" if eff_build >= 0.8 else " ✗ (<0.8 — see notes)"),
        "",
        f"Normalized to the machine's concurrent pure-CPU ceiling: "
        f"**{eff_build / min(cpu_scaling, 1.0):.3f}** "
        f"(job efficiency ÷ control scaling, capped at 1.0).",
        "",
        f"Environment control (pure-CPU aggregate, N vs 4N processes): "
        f"{cpu_n:,.0f} → {cpu_4n:,.0f} Mops, scaling {cpu_scaling:.2f}. "
        "The sandbox VM shows transient external contention (the same job has "
        "measured 34 s and 252 s within minutes); best-of-2 per config is "
        "reported. When the control line itself is << 1.0, the run is "
        "environment-limited, not a property of the engine.",
        "",
        f"_Generated {date.today().isoformat()} by scripts/scaling_bench.py._",
    ]
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(
        json.dumps(
            {
                "n": r_n,
                "4n": r_4n,
                "efficiency_build": round(eff_build, 3),
                "cpu_spin_mops_n": round(cpu_n, 1),
                "cpu_spin_mops_4n": round(cpu_4n, 1),
                "cpu_spin_scaling": round(cpu_scaling, 3),
                "efficiency_normalized": round(eff_build / min(cpu_scaling, 1.0), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
