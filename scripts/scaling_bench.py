"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
from N to 4N executors).

Sandbox substitution per the driver instruction: the identical
flagship job (fused tokenize+extract over the wrapped sf0.1 corpus,
replicated to ~200k turns) runs at two parallelism levels in separate
JVMs; efficiency = (throughput_4N / throughput_N) / 4.

N defaults to 4 (so 4N=16): this container advertises 32 CPUs but is
a shared host (~18 effective cores measured via a multiprocessing
saturation probe), so 8->32 would measure host contention, not the
engine. Override with SCALE_N / SCALE_4N.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"scaling-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from html_parser_spark.config import EXTRACT_CONFIG
from html_parser_spark.operators.extract import extract_text
from html_parser_spark.sources.transcripts import wrap_documents

tr = wrap_documents(spark, "/root/testdata/sf0.1")
tr = (tr.select("conv_id",
                F.explode(F.sequence(F.lit(0), F.lit(int(os.environ.get("SCALE_REPLICATE", "40")) - 1))).alias("turn_idx"),
                "text")
        .withColumn("text", F.concat("text", F.lit(" <i>t"),
                                     F.col("turn_idx"), F.lit("</i>")))
        .repartition(cpus).cache())
n = tr.count()
warm = tr.limit(2000)
for _ in range(2):
    (warm.mapInPandas(lambda it: (p for p in it), warm.schema)
     .agg(F.count("*")).collect())
extract_text(tr, EXTRACT_CONFIG).agg(F.count("*")).collect()  # warm run
best = float("inf")
for _ in range(3):
    t0 = time.monotonic()
    extract_text(tr, EXTRACT_CONFIG).agg(
        F.count("*"), F.sum(F.length("extracted_text"))).collect()
    best = min(best, time.monotonic() - t0)
print(json.dumps({{"cpus": cpus, "turns": n, "sec": round(best, 3),
                   "turns_per_sec": round(n / best, 1)}}))
spark.stop()
""".format(repo=REPO)


def run(cpus: int) -> dict:
    out = subprocess.run([sys.executable, "-c", RUN_ONE, str(cpus)],
                         capture_output=True, text=True, timeout=900)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        # surface the child JVM's real error instead of dying on a
        # bare IndexError with the traceback discarded
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(
            f"child bench (local[{cpus}]) failed "
            f"rc={out.returncode}; stderr above")
    line = lines[-1]
    return json.loads(line)


def main() -> None:
    n_small = int(os.environ.get("SCALE_N", "4"))
    n_big = int(os.environ.get("SCALE_4N", str(n_small * 4)))
    rounds = int(os.environ.get("SCALE_ROUNDS", "3"))
    # Alternate the two arms inside one time window: the host is
    # shared, so outside contention varies minute-to-minute and only
    # ever biases efficiency DOWN.  Best-of-R per arm estimates the
    # engine's capability on the least-contended trial of each.
    smalls, bigs = [], []
    for _ in range(rounds):
        smalls.append(run(n_small))
        bigs.append(run(n_big))
    small = min(smalls, key=lambda r: r["sec"])
    big = min(bigs, key=lambda r: r["sec"])
    eff = round((big["turns_per_sec"] / small["turns_per_sec"])
                / (n_big / n_small), 3)
    result = {"N": small, "fourN": big, "scaling_efficiency": eff,
              "trials": {"N": [r["sec"] for r in smalls],
                         "fourN": [r["sec"] for r in bigs]}}
    print(json.dumps(result))

    # APPEND the window to the curated history (every window is kept,
    # good or bad — the protocol in BENCH/BASELINE.md).  An earlier
    # version of this script rewrote the file wholesale, which once
    # destroyed the hand-curated run history; never do that again.
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    path = f"{REPO}/BENCH/BASELINE.md"
    header = (
        "# BENCH — scaling evidence (north rule)\n\n"
        "The north rule's two-cluster-size criterion (throughput scaling\n"
        "efficiency >= 0.8 from N to 4N executors) cannot use a real cluster\n"
        "in this sandbox; per the driver instruction it is evidenced by\n"
        "running the identical flagship job (fused tokenize+extract,\n"
        "`extract_text` over the wrapped sf0.1 corpus) at two parallelism\n"
        "levels in separate JVMs.  Every window is recorded below,\n"
        "including the contended ones.\n"
    )
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(header)
    with open(path, "a") as f:
        f.write(f"""
## Window: local[{n_small}] vs local[{n_big}] (scaling_bench.py, appended)

| cores | turns | best sec | turns/sec |
|---|---|---|---|
| local[{n_small}] | {small['turns']:,} | {small['sec']} | {small['turns_per_sec']:,} |
| local[{n_big}] | {big['turns']:,} | {big['sec']} | {big['turns_per_sec']:,} |

**Scaling efficiency = ({big['turns_per_sec']:,} / {small['turns_per_sec']:,}) / {n_big / n_small:g}
= {eff}** (target >= 0.8). {rounds} interleaved trials per arm
(all wall seconds — N: {result['trials']['N']},
4N: {result['trials']['fourN']}); each arm's best trial is reported
because outside tenants on the shared host only ever bias
throughput down, never up.
""")


if __name__ == "__main__":
    main()
