"""Task-retry determinism: at cluster scale task attempts fail and
re-run constantly, so every kernel must be a pure function of its
input split — a retry must reproduce byte-identical output.  The
suite's shared session runs local[*] (task maxFailures=1: any failure
kills the job), so this gate spawns a subprocess with local[4,2] —
retries ENABLED — fails a kernel's first attempt on one partition via
TaskContext.attemptNumber, and asserts the job still succeeds with
output equal to the undisturbed run."""

from __future__ import annotations

import json
import subprocess
import sys

_SCRIPT = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark import TaskContext

spark = (SparkSession.builder.master("local[4, 2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 1000, 1, 4)

def kernel(fail_first_attempt):
    def run(batches):
        import pandas as pd
        tc = TaskContext.get()
        for pdf in batches:
            if (
                fail_first_attempt
                and tc.partitionId() == 2
                and tc.attemptNumber() == 0
                and len(pdf)
            ):
                raise RuntimeError("injected first-attempt failure")
            yield pd.DataFrame({"id": pdf["id"], "v": pdf["id"] * 3 + 1})
    return run

clean = sorted(
    (r["id"], r["v"])
    for r in df.mapInPandas(kernel(False), "id long, v long").collect()
)
retried = sorted(
    (r["id"], r["v"])
    for r in df.mapInPandas(kernel(True), "id long, v long").collect()
)
print(json.dumps({"equal": clean == retried, "n": len(retried)}))
"""


def test_first_attempt_failure_is_invisible():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result == {"equal": True, "n": 1000}, result
