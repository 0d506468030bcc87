"""N-vs-4N scaling evidence (BASELINE.md protocol): same flagship
validation job on the SAME materialized corpus at local[8] and
local[32]; warm-up discarded, median of 3 timed runs per level.

Writes the numbers to stdout as JSON; BENCH.md records them.
The north_rule's two-cluster-size criterion is evidenced here by
parallelism levels, per driver instruction (no real cluster in sandbox).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("BENCH_DOCS", "200000"))
CORPUS = f"/tmp/jvs_scale_corpus_{N_DOCS}"


def run_level(cores: int) -> dict:
    from json_validator_spark.corpus import corpus_ruleset
    from json_validator_spark.plans.pipeline import validate_run
    from json_validator_spark.session import get_spark
    from json_validator_spark.sources.synth import synth_documents, synth_media_catalog

    spark = get_spark(
        app_name=f"scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth_documents(spark, N_DOCS, partitions=64).write.mode("overwrite").parquet(CORPUS)

    def once() -> tuple[float, int]:
        docs = spark.read.parquet(CORPUS)
        t0 = time.perf_counter()
        res = validate_run(
            spark, docs, corpus_ruleset(), media_catalog=synth_media_catalog(spark)
        )
        n = res.violations.count()
        res.partition_verdicts.count()
        return time.perf_counter() - t0, n

    once()  # warm-up, discarded
    times, n_viol = [], 0
    for _ in range(3):
        t, n_viol = once()
        times.append(t)
    spark.stop()
    med = statistics.median(times)
    return {
        "cores": cores,
        "median_sec": round(med, 3),
        "runs_sec": [round(t, 3) for t in times],
        "docs_per_sec": round(N_DOCS / med, 1),
        "n_violations": n_viol,
    }


def main() -> None:
    import subprocess

    results = []
    for cores in (8, 32):
        # fresh JVM per level so executor-thread pools don't carry over
        out = subprocess.run(
            [sys.executable, "-u", __file__, str(cores)],
            capture_output=True, text=True, check=True,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    r8, r32 = results
    eff = round(r32["docs_per_sec"] / r8["docs_per_sec"] / 4.0, 3)
    print(json.dumps({"n_docs": N_DOCS, "levels": results,
                      "scaling_efficiency_8_to_32": eff,
                      "identical_violations": r8["n_violations"] == r32["n_violations"]}))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(run_level(int(sys.argv[1]))))
    else:
        main()
