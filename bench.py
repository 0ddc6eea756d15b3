#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline: overlap-DP GCUPS per chip on the PRODUCTION overlap engine — the
bit-parallel Myers gate (ops/myers_pallas.py), which every candidate pair
runs through in models/overlap.py.  Cell accounting is the full Lq x Lt
semi-global matrix per pair (the unbanded engine evaluates every cell; see
hga_tpu/utils/benchmarks.py:bench_myers).  vs_baseline divides by 140 GCUPS
= 70% of the documented 200 Gcells/s select/max-SW VPU roofline
(BASELINE.md target).
"""

import json
import sys


def main() -> int:
    from hga_tpu.utils.benchmarks import BASELINE_GCUPS, bench_myers

    res = bench_myers(n_pairs=8192)
    print(json.dumps({
        "metric": "overlap_dp_gcups_per_chip",
        "value": round(res["gcups"], 3),
        "unit": "GCUPS",
        "vs_baseline": round(res["gcups"] / BASELINE_GCUPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
