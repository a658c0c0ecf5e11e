"""Scaling-efficiency evidence: same extraction job at N vs 4N cores.

North rule: throughput scaling efficiency >= 0.8 between N and 4N
executors. In-sandbox proxy (per driver instruction): run the identical
job on the identical input at ``local[8]`` and ``local[32]`` in separate
processes and report ``eff = (T_N / T_4N) / 4``.

Writes BENCH/BASELINE.md. Usage: python BENCH/scaling.py [replicate]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, sf_dir: str, replicate: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        FUSUS_BENCH_REPLICATE=str(replicate),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--extract-only"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n, four_n = 8, 32

    print(f"running extraction at local[{n}] ...", file=sys.stderr)
    r_n = run_once(n, sf_dir, replicate)
    print(f"  {r_n}", file=sys.stderr)
    print(f"running extraction at local[{four_n}] ...", file=sys.stderr)
    r_4n = run_once(four_n, sf_dir, replicate)
    print(f"  {r_4n}", file=sys.stderr)

    eff = (r_n["wall_s"] / r_4n["wall_s"]) / (four_n // n)
    result = {
        "sf_dir": sf_dir,
        "replicate": replicate,
        "n_cores": n,
        "four_n_cores": four_n,
        "wall_s_n": r_n["wall_s"],
        "wall_s_4n": r_4n["wall_s"],
        "docs_per_sec_n": r_n["docs_per_sec"],
        "docs_per_sec_4n": r_4n["docs_per_sec"],
        "gb_per_sec_n": r_n["gb_per_sec"],
        "gb_per_sec_4n": r_4n["gb_per_sec"],
        "n_docs": r_n["n_docs"],
        "bytes_in": r_n["bytes_in"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Generated {dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")} by `python BENCH/scaling.py {replicate}`.

**Rule** (BASELINE.json north_rule): throughput scaling efficiency >= 0.8
between N and 4N executors. Sandbox proxy: the SAME extraction job
(decode -> DOM parse -> boilerplate strip -> segment -> words, fused
Arrow `mapInPandas`) on the SAME input, run at `local[{n}]` and
`local[{four_n}]` in separate processes.

## Input

| | |
|---|---|
| corpus | `{sf_dir}/documents.parquet`, each doc wrapped in deterministic HTML chrome, replicated x{replicate} with distinct urls |
| documents extracted | {r_n["n_docs"]:,} |
| html bytes parsed | {r_n["bytes_in"]:,} ({r_n["bytes_in"]/1e6:.1f} MB) |
| words emitted | {r_n["n_words"]:,} |

## Result

| cores | wall (s) | docs/sec | GB/sec |
|---|---|---|---|
| local[{n}]  (N)  | {r_n["wall_s"]} | {r_n["docs_per_sec"]:,} | {r_n["gb_per_sec"]} |
| local[{four_n}] (4N) | {r_4n["wall_s"]} | {r_4n["docs_per_sec"]:,} | {r_4n["gb_per_sec"]} |

**eff = (T_N / T_4N) / 4 = ({r_n["wall_s"]} / {r_4n["wall_s"]}) / 4 = {eff:.3f}**
{"(meets the >= 0.8 bound)" if eff >= 0.8 else "(BELOW the 0.8 bound — see notes)"}

## Why this scales

* the extraction stage is embarrassingly parallel per document; input is
  salted-repartitioned (`pmod(xxhash64(url, salt), parts)`) into
  2x-cores partitions, so no straggler partition dominates;
* no shuffle inside the stage — one narrow `mapInPandas` pass; the only
  exchange is the initial repartition;
* per-executor Python workers are reused across batches (Arrow batch
  size 2048), so worker startup amortizes;
* at the 10^12-row design point the same plan shards by Iceberg
  partition (`days(warc_ts) + bucket(url)`) instead of a runtime
  repartition, and the ledger (fusus_spark/sources/ledger.py) commits
  buckets independently — scaling remains per-partition.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
