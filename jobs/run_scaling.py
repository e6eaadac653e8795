"""Two-cluster-size scaling protocol (BASELINE.md): run the SAME
spark-submit PageRank job on the SAME prebuilt adjacency at several
parallelism levels — local[N] standing in for N executors — and
report throughput at each level plus scaling efficiency
``(T_N / T_4N) / 4`` for every N→4N pair measured.

Measurement discipline for a shared/noisy host: the adjacency is
built ONCE and written to parquet (the production shape — adjacency
materialized once, reused across runs); each level runs ``--repeats``
times in interleaved order (A,B,...,A,B,...); the per-level estimate
is the MIN of the runs' median superstep times (min is the
noise-robust estimator of capacity).

Usage::

    python jobs/run_scaling.py [--edges M] [--verts N] [--rounds K]
        [--levels 2,4,8,16] [--repeats 2] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def submit(cores: int, extra: list[str], zip_path: str, mem: str,
           timeout: int = 3600) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_DRIVER_MEM"] = mem
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", mem,
        # shuffle to tmpfs: on a real cluster shuffle I/O is per-node
        # NVMe and scales with executor count; on this single box the
        # one shared disk serializes at ~10 s per 60M-edge superstep
        # regardless of cores — tmpfs restores the per-node property
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "pagerank_job.py"),
        "--cores", str(cores),
        "--shuffle-partitions", str(4 * cores),
    ] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
    raise RuntimeError(f"no JSON from cores={cores}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=60_000_000)
    ap.add_argument("--verts", type=int, default=3_000_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--levels", default="2,4,8,16")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--mem", default="24g",
                    help="JVM heap per level (local mode)")
    ap.add_argument("--adj-dir", default=None,
                    help="reuse/keep the prebuilt adjacency here")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    td_ctx = (
        tempfile.TemporaryDirectory() if args.adj_dir is None else None
    )
    workdir = args.adj_dir or td_ctx.name
    os.makedirs(workdir, exist_ok=True)
    zip_path = os.path.join(workdir, "gs.zip")
    subprocess.run(["zip", "-qr", zip_path, "graphscope_spark", "jobs"],
                   cwd=REPO, check=True)
    adj_path = os.path.join(workdir, "adj.parquet")
    if not os.path.exists(os.path.join(adj_path, "_SUCCESS")):
        submit(max(levels), [
            "--synthetic-edges", str(args.edges),
            "--synthetic-verts", str(args.verts),
            "--write-adj", adj_path,
        ], zip_path, args.mem)

    runs: dict[int, list[dict]] = {lv: [] for lv in levels}
    for _ in range(args.repeats):
        for lv in levels:
            r = submit(lv, [
                "--adj", adj_path, "--rounds", str(args.rounds),
            ], zip_path, args.mem)
            runs[lv].append(r)
            print(json.dumps({"level": lv, "run": r}), flush=True)

    per_level = {}
    for lv in levels:
        medians = [r["median_superstep_s"] for r in runs[lv]]
        best = min(medians)
        per_level[lv] = {
            "median_superstep_s_runs": medians,
            "best_median_s": best,
            "edges_per_sec_per_superstep": round(
                runs[lv][0]["edges"] / best
            ),
        }
    pairs = {}
    for lv in levels:
        if lv * 4 in per_level:
            eff = (
                per_level[lv]["best_median_s"]
                / per_level[lv * 4]["best_median_s"]
            ) / 4
            pairs[f"{lv}->{lv * 4}"] = round(eff, 3)
    result = {
        "protocol": "same prebuilt adjacency, interleaved repeats, "
                    "min-of-medians per level, fixed shuffle "
                    "partitions = 4x cores",
        "edges": runs[levels[0]][0]["edges"],
        "vertices": runs[levels[0]][0]["vertices"],
        "rounds": args.rounds,
        "levels": per_level,
        "scaling_efficiency_pairs": pairs,
        "pass_geq_0.8": any(v >= 0.8 for v in pairs.values()),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if td_ctx is not None:
        td_ctx.cleanup()


if __name__ == "__main__":
    main()
