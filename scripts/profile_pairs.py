"""Profile of the ngram_jaccard_pairs tail (VERDICT r4 item 8): repeats
the un-barriered end-to-end wall (the bench number), then one more run
whose ``ds.stats()`` gives the per-operator in-task attribution. The
r5 conclusion drawn from this output lives in BASELINE.md: the in-task
remote walls sum to ~5.4 task-seconds against a 7.6 s wall, i.e. ≥97 %
of the wall is fixed Ray execution cost (three sort barriers × many
small tasks) at this input size.

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

    # per-operator attribution: one more run, read its ds.stats()
    t0 = time.monotonic()
    pairs_ds = ngram_jaccard_pairs(read(), n=3, threshold=0.8).materialize()
    print(f"stats run: {time.monotonic() - t0:.2f} s")
    print(pairs_ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
