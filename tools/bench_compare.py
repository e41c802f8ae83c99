"""Compare two bench.py JSON records per query (task-5 reconciliation
helper). Usage: python tools/bench_compare.py old.json new.json [pct]"""

import json
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qo, qn = old["queries"], new["queries"]
    both = sorted(set(qo) & set(qn))
    print(f"common queries: {len(both)}; old total "
          f"{sum(qo[q] for q in both):.1f}s new "
          f"{sum(qn[q] for q in both):.1f}s")
    for q in both:
        d = (qn[q] - qo[q]) / max(qo[q], 1e-9) * 100
        if abs(d) >= thresh:
            print(f"{'REG' if d > 0 else 'imp'} {q}: "
                  f"{qo[q]:.2f} -> {qn[q]:.2f} ({d:+.0f}%)")
    for q in sorted(set(qn) - set(qo)):
        print(f"new {q}: {qn[q]:.2f}")
    ko = {k: v for k, v in old.items() if k.endswith("ns_per_key")}
    for k, v in ko.items():
        if k in new:
            print(f"kernel {k}: {v} -> {new[k]}")


if __name__ == "__main__":
    main()
