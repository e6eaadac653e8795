"""Two-parallelism scaling protocol (BASELINE.md): run the SAME
spark-submit PageRank job on the SAME input at N and 4N cores
(local[8] vs local[32] — the in-sandbox stand-in for N vs 4N
executors), fixed shuffle partitions per level, and report
throughput at both plus scaling efficiency = (T_4N / T_N) / 4.

Usage::

    python jobs/run_scaling.py [--edges M] [--verts N] [--rounds K]
        [--low 8] [--high 32] [--out BENCH_SCALING.json]

Writes one JSON line to stdout and (optionally) the evidence file.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, args, zip_path: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "pagerank_job.py"),
        "--synthetic-edges", str(args.edges),
        "--synthetic-verts", str(args.verts),
        "--rounds", str(args.rounds),
        "--cores", str(cores),
        "--shuffle-partitions", str(cores),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
    raise RuntimeError(f"no JSON from cores={cores}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=30_000_000)
    ap.add_argument("--verts", type=int, default=2_000_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        zip_path = os.path.join(td, "gs.zip")
        subprocess.run(
            ["zip", "-qr", zip_path, "graphscope_spark"],
            cwd=REPO, check=True,
        )
        low = run_level(args.low, args, zip_path)
        high = run_level(args.high, args, zip_path)

    ratio = args.high / args.low
    eff = (
        high["edges_per_sec_per_superstep"]
        / low["edges_per_sec_per_superstep"]
    ) / ratio
    result = {
        "protocol": f"local[{args.low}] vs local[{args.high}], "
                    "same synthetic power-law graph, "
                    "fixed shuffle partitions per level",
        "edges": low["edges"],
        "vertices": low["vertices"],
        "rounds": args.rounds,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "pass_geq_0.8": eff >= 0.8,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
