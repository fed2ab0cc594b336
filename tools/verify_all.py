"""One-shot verification entry point: driver simulation + the full
DuckDB oracle gate + the pytest suite, with a single summary line.

Usage: python tools/verify_all.py [--skip-pytest] [sf_dir]

The oracle gate reuses tools/oracle_cache (committed) — the
expensive all-pairs oracles at sf0.1 are served from cache, so a
full gate at either SF is minutes, not hours.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    ok = True

    print("== driver simulation (vanilla session) ==", flush=True)
    sim = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pyspark.sql import SparkSession;"
            "spark = (SparkSession.builder.master('local[8]')"
            ".config('spark.sql.shuffle.partitions','8')"
            ".config('spark.ui.enabled','false').appName('driver-sim').getOrCreate());"
            "import __spark_entry__ as m;"
            "rows = m.entry(spark).collect();"
            "qs = m.queries(); os_ = m.oracle_sql();"
            "assert rows, 'entry returned no rows';"
            "print(f'entry rows={len(rows)} queries={len(qs)} oracles={len(os_)}')",
        ],
        cwd=HERE,
    )
    ok &= sim.returncode == 0

    print(f"== oracle gate ({sf_dir}) ==", flush=True)
    gate_cmd = [sys.executable, os.path.join(HERE, "tools", "oracle_check.py"), sf_dir]
    if "--strict" in sys.argv:
        gate_cmd.append("--strict")
    gate = subprocess.run(gate_cmd, cwd=HERE)
    ok &= gate.returncode == 0

    if "--skip-pytest" not in sys.argv:
        print("== pytest ==", flush=True)
        py = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=HERE
        )
        ok &= py.returncode == 0

    print("VERIFY_ALL:", "GREEN" if ok else "RED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
