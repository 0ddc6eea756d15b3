#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline: overlap-DP GCUPS per chip on the PRODUCTION overlap engine — the
bit-parallel Myers gate (ops/myers_pallas.py), which every candidate pair
runs through in models/overlap.py.  Cell accounting is the full Lq x Lt
semi-global matrix per pair (the unbanded engine evaluates every cell; see
hga_tpu/utils/benchmarks.py:bench_myers).  vs_baseline divides by 140 GCUPS
= 70% of the documented 200 Gcells/s select/max-SW VPU roofline
(BASELINE.md target).

Variance: the tunneled backend adds run-to-run dispatch jitter; the
headline has measured 675/659/626 GCUPS across rounds with identical
kernel code (ROADMAP.md "Variance note").  Deltas under ~10% are tunnel
noise, not regressions.
"""

import json
import sys


def main() -> int:
    from hga_tpu.utils.benchmarks import (BASELINE_GCUPS, bench_myers,
                                          bench_sw)

    res = bench_myers(n_pairs=8192)
    line = {
        "metric": "overlap_dp_gcups_per_chip",
        "value": round(res["gcups"], 3),
        "unit": "GCUPS",
        "vs_baseline": round(res["gcups"] / BASELINE_GCUPS, 4),
    }
    # secondary engine (the optional scored-SW refine, cfg.overlap_refine
    # = "sw"; the default "myers" refine rides the headline engine) —
    # reported alongside so both engines' GCUPS are on record
    try:
        sw = bench_sw(n_pairs=4096)
        line["scored_sw_gcups"] = round(sw["gcups"], 3)
        line["scored_sw_impl"] = sw["impl"]
    except Exception as e:  # secondary must never sink the headline
        line["scored_sw_error"] = repr(e)[:120]
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
