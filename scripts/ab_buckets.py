"""Controlled A/B of co-group bucket count (VERDICT r3 item 1).

Runs the four bucketed queries whose BENCH_r03 walls regressed vs r2
(asof, interval join, session windows, grouped quantile) at a pinned
bucket count, several reps, and prints per-query median wall.  Run in a
FRESH process per config:

    ULP_RAY_BUCKETS=64  python scripts/ab_buckets.py
    ULP_RAY_BUCKETS=128 python scripts/ab_buckets.py

Bucket count never changes results, only partitioning — so this is a
pure wall-clock comparison.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "asof_purchase_signup",
    "interval_join_events",
    "session_windows_events",
    "quantile_value_per_type",
]


def main() -> None:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("AB_REPS", "5"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    from ulp_ray.stages._bucket import default_buckets

    out = {"buckets": default_buckets(), "cpus": cpus, "sf_dir": sf_dir, "reps": reps}
    walls: dict[str, list[float]] = {}
    for rep in range(reps):
        for name in QUERIES:
            t0 = time.perf_counter()
            res = qs[name](sf_dir)
            # consume the Dataset fully (queries may return lazy Datasets)
            if hasattr(res, "materialize"):
                res = res.materialize()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
    out["median"] = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    out["all"] = {k: [round(x, 3) for x in v] for k, v in walls.items()}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
