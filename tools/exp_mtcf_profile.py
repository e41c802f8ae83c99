"""Task-6 profile: where does the MTCF bulk build spend its time?
(growth100m straggler: 1.13 Mk/s vs TCF 3.33 at equal shard counts).

Times the phases of add_hashes on a pre-sized filter at shard-like
sizes, min-of-N in one process:
  - find_hashes (the present-key probe each chunk pays)
  - _to_path_batch
  - full add_hashes (pre-sized, fresh filter)
  - add_hashes minus probe (occupied==0 fresh chunks)

Usage: python tools/exp_mtcf_profile.py [n_keys]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from libfilter_spark.filters.minimal_taffy import (
    MinimalTaffyCuckooFilter, _to_path_batch)
from libfilter_spark.kernels.keys import splitmix64


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 780_000
    keys = splitmix64(n, seed=5)

    def best(fn, trials=3):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    # full pre-sized build
    def build():
        f = MinimalTaffyCuckooFilter.create(n)
        f.add_hashes(keys)
        return f

    t_build = best(build)
    f = build()
    print(f"add_hashes total      : {t_build*1e9/n:7.0f} ns/key "
          f"({n/t_build/1e6:.2f} Mk/s)")

    t_probe = best(lambda: f.find_hashes(keys))
    print(f"find_hashes (full)    : {t_probe*1e9/n:7.0f} ns/key")

    g = MinimalTaffyCuckooFilter.create(n)
    t_path = best(lambda: _to_path_batch(
        keys, g.sides[0].hi, g.cursor, g.log_side_size, False))
    print(f"_to_path_batch        : {t_path*1e9/n:7.0f} ns/key")

    # probe against the EMPTY pre-sized filter (what chunk 1 pays)
    t_probe_empty = best(lambda: g.find_hashes(keys))
    print(f"find_hashes (empty)   : {t_probe_empty*1e9/n:7.0f} ns/key")

    # kick-walk-only estimate: total - probe(avg half-full) - path
    resid = t_build - t_probe - t_path
    print(f"residual (walk+misc)  : {resid*1e9/n:7.0f} ns/key")

    # comparison anchor: TCF at the same n
    from libfilter_spark.filters import TaffyCuckooFilter

    def build_tcf():
        f = TaffyCuckooFilter.create(n)
        f.add_hashes(keys)
        return f

    t_tcf = best(build_tcf)
    print(f"TCF add_hashes        : {t_tcf*1e9/n:7.0f} ns/key "
          f"({n/t_tcf/1e6:.2f} Mk/s)")


if __name__ == "__main__":
    main()
