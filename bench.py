#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline: banded-SW overlap DP GCUPS per chip (the judged hot spot,
BASELINE.md).  vs_baseline is measured GCUPS / 140 (70% of the documented
200 Gcells/s VPU roofline model in hga_tpu/utils/benchmarks.py).
"""

import json
import sys


def main() -> int:
    from hga_tpu.utils.benchmarks import BASELINE_GCUPS, bench_sw

    res = bench_sw(n_pairs=4096)
    print(json.dumps({
        "metric": "banded_sw_gcups_per_chip",
        "value": round(res["gcups"], 3),
        "unit": "GCUPS",
        "vs_baseline": round(res["gcups"] / BASELINE_GCUPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
