"""Zero-evidence slow-window hunter (round 13, VERDICT r12 #2 closure).

Every full bench session since r11 has had ONE window where a query
runs 3-10x its typical wall with ~0 host steal, ~0 iowait, modest GC,
no JIT burst and load1 ~1-2 — i.e. every instrumented cause says
"idle" while the wall burns, and load1 ~1.7 during a 26 s window says
the work is nearly SINGLE-THREADED.  The one probe that can name
single-threaded work is a thread dump taken INSIDE the window (guide
§7.3), which no per-query counter can substitute for.

This harness runs one query repeatedly in a bench-shaped session; a
watchdog thread arms after each run starts and, once the elapsed wall
exceeds max(MIN_TRIGGER_S, TRIGGER_X x running median), captures
`jcmd <jvm> Thread.print` twice a second apart plus /proc loadavg and
steal, then keeps letting the run finish so the wall is recorded.

    python scripts/r13_spiker_probe.py <query> [n_runs]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), FRIZZLE_PROBE_TRIGGER_X (4),
FRIZZLE_PROBE_MIN_S (6).  Dumps land in /tmp/spiker_<query>_<run>.txt.
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jvm_pid() -> int | None:
    try:
        out = subprocess.run(
            ["pgrep", "-P", str(os.getpid()), "java"],
            capture_output=True,
            text=True,
        ).stdout.split()
        return int(out[0]) if out else None
    except Exception:
        return None


def _steal_ticks() -> tuple[int, int]:
    p = open("/proc/stat").readline().split()[1:]
    return sum(map(int, p)), int(p[7])


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trigger_x = float(os.environ.get("FRIZZLE_PROBE_TRIGGER_X", "4"))
    min_trigger = float(os.environ.get("FRIZZLE_PROBE_MIN_S", "6"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("r13-spiker-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    jvm = _jvm_pid()
    print(f"# jvm pid {jvm}", file=sys.stderr)

    spec = REGISTRY[name]
    walls: list[float] = []
    for run in range(n_runs):
        fired = threading.Event()
        done = threading.Event()
        t_start = time.perf_counter()

        def watchdog() -> None:
            med = statistics.median(walls) if walls else None
            thresh = max(min_trigger, trigger_x * med) if med else min_trigger
            while not done.wait(0.25):
                if time.perf_counter() - t_start < thresh:
                    continue
                fired.set()
                for shot in range(2):
                    try:
                        dump = subprocess.run(
                            ["jcmd", str(jvm), "Thread.print"],
                            capture_output=True,
                            text=True,
                            timeout=30,
                        ).stdout
                    except Exception as ex:  # pragma: no cover
                        dump = f"dump failed: {ex}"
                    t, s = _steal_ticks()
                    path = f"/tmp/spiker_{name}_{run}_{shot}.txt"
                    with open(path, "w") as fh:
                        fh.write(
                            f"# run {run} shot {shot} at +"
                            f"{time.perf_counter() - t_start:.1f}s "
                            f"load={os.getloadavg()} ticks={t} steal={s}\n"
                        )
                        fh.write(dump)
                    print(f"# DUMPED {path}", file=sys.stderr)
                    time.sleep(1.0)
                return

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0, s0 = _steal_ticks()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        done.set()
        wall = time.perf_counter() - t_start
        t1, s1 = _steal_ticks()
        walls.append(wall)
        steal = 100.0 * (s1 - s0) / max(1, (t1 - t0))
        flag = " <-- SLOW (dumped)" if fired.is_set() else ""
        print(
            f"run {run}: {wall:.2f}s steal {steal:.2f}%{flag}",
            flush=True,
        )
    med = statistics.median(walls)
    print(f"median {med:.2f}s max {max(walls):.2f}s over {n_runs} runs")


if __name__ == "__main__":
    main()
