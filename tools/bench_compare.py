"""Compare two bench records and print per-query ratios.

Usage: python tools/bench_compare.py OLD NEW [--top N] [--min-sec S]

Each argument is either a BENCH_r*.json driver record (the `tail`
field is a possibly-front-truncated capture of bench.py stdout — the
per-query pairs are recovered by regex, the established workaround
for the pre-r8 truncation) or a raw bench.py stdout log.

Prints the shared-query median ratio (the environment factor: a
uniform shift on untouched code is machine variance, per the r7
verdict's reading) and the top movers, so a round's plan reads can
separate code-attributable regressions from noise.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    # driver record: {"n":…, "tail": "<truncated stdout>"}
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
        elif isinstance(doc, dict) and "queries" in doc:
            return {k: float(v) for k, v in doc["queries"].items()}
    except json.JSONDecodeError:
        pass
    # raw stdout (or a truncated tail): find the payload line if it
    # survives whole, else recover "name": seconds pairs by regex
    for line in text.splitlines():
        if line.startswith('{"metric"') and '"queries"' in line:
            try:
                return {
                    k: float(v)
                    for k, v in json.loads(line)["queries"].items()
                }
            except json.JSONDecodeError:
                break
    return {
        k: float(v)
        for k, v in re.findall(r'"((?:q_|[a-z]+_index_|rollup_|minhash_|pq_|ivfpq_)[a-z0-9_]+)": ([0-9.]+)', text)
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    top = 15
    min_sec = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--top="):
            top = int(a.split("=", 1)[1])
        if a.startswith("--min-sec="):
            min_sec = float(a.split("=", 1)[1])
    old, new = load_queries(args[0]), load_queries(args[1])
    shared = sorted(k for k in old.keys() & new.keys() if old[k] > 0)
    if not shared:
        print("no shared queries recovered")
        return 1
    ratios = sorted(
        ((new[k] / old[k], k) for k in shared if max(old[k], new[k]) >= min_sec),
        reverse=True,
    )
    med = statistics.median(r for r, _ in ratios)
    print(
        f"shared={len(shared)} compared={len(ratios)} "
        f"median_ratio={med:.2f} (environment factor if uniform)"
    )
    print(f"\ntop {min(top, len(ratios))} movers (new/old):")
    for r, k in ratios[:top]:
        print(f"  {k}: {old[k]:.3f} -> {new[k]:.3f}  ({r:.2f}x, {r / med:.2f}x adj)")
    print("\nbiggest improvements:")
    for r, k in ratios[-min(5, len(ratios)):][::-1]:
        print(f"  {k}: {old[k]:.3f} -> {new[k]:.3f}  ({r:.2f}x, {r / med:.2f}x adj)")
    return 0


if __name__ == "__main__":
    main()
