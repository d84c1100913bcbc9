"""Round-over-round bench discipline (VERDICT r1 item 9).

Compares two bench results per query and flags regressions >1.5x.
Accepts either the driver's BENCH_r{N}.json wrapper (with a "parsed"
field) or bench.py's raw one-line JSON output.

    python tools/bench_compare.py BENCH_r01.json current.json [--threshold 1.5]

Typical loop:
    python bench.py > /tmp/bench_now.json
    python tools/bench_compare.py BENCH_r01.json /tmp/bench_now.json

Exit code 1 when any query regressed past the threshold (so CI-ish
wrappers can fail loudly); new/removed queries are listed but don't
fail the comparison.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> tuple[dict[str, float], float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    return doc["queries"], float(doc["value"])


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    threshold = 1.5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            # both --threshold=1.5 and --threshold 1.5 forms
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                i += 1
                threshold = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    base_q, base_total = load_queries(args[0])
    cur_q, cur_total = load_queries(args[1])

    flagged = []
    rows = []
    for name in sorted(set(base_q) | set(cur_q)):
        b, c = base_q.get(name), cur_q.get(name)
        if b is None:
            rows.append((name, "-", f"{c:.2f}", "NEW"))
            continue
        if c is None:
            rows.append((name, f"{b:.2f}", "-", "REMOVED"))
            continue
        ratio = c / b if b > 0 else float("inf")
        status = ""
        if ratio > threshold:
            status = f"REGRESSED {ratio:.2f}x"
            flagged.append(name)
        elif ratio < 1 / threshold:
            status = f"improved {ratio:.2f}x"
        rows.append((name, f"{b:.2f}", f"{c:.2f}", status))

    w = max(len(r[0]) for r in rows) + 2
    print(f"{'query':<{w}}{'base_s':>8}{'cur_s':>8}  status")
    for name, b, c, status in rows:
        print(f"{name:<{w}}{b:>8}{c:>8}  {status}")
    print(
        f"\ntotal: {base_total:.2f}s -> {cur_total:.2f}s "
        f"({cur_total / base_total:.2f}x); "
        f"{len(flagged)} regression(s) past {threshold}x"
    )
    if flagged:
        print("flagged:", ", ".join(flagged))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
