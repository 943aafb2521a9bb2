"""Benchmark-contamination screening: flag documents that contain any
probe string (verbatim benchmark questions/answers) as substrings.

The decontamination shape used by LLM training-data pipelines: the
probe set is SMALL relative to the corpus (a benchmark suite — 10³-10⁵
strings), so it broadcasts (``ray.put`` once, fetched once per worker
process) and the corpus STREAMS — one RE2 pass per batch, never a
shuffle. The alternation of all probes compiles to a single automaton
(RE2 is linear-time in text length regardless of probe count), cached
per worker keyed by the broadcast ref.

For probe sets too large to compile into one automaton (millions of
n-grams), the scale path is the n-gram join: shingle both sides and
``bucketed_semi_join`` doc n-grams against probe n-grams — same
fixed-width-exchange contract as the dedup family. This module covers
the broadcast regime, which is the common benchmark-suite case.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env

__all__ = ["flag_contaminated", "drop_contaminated"]

# per-worker compiled-pattern cache, keyed by broadcast ref (one compile
# per worker process, not per batch)
_PATTERN_CACHE: dict[str, str] = {}


def _probe_pattern(probes: list[str]) -> str:
    """One RE2 alternation matching any probe verbatim (longest first so
    a probe that prefixes another still matches the longer form)."""
    if not probes:
        raise ValueError("probes must be non-empty")
    return "|".join(re.escape(p) for p in sorted(probes, key=len, reverse=True))


def flag_contaminated(
    ds,
    probes: list[str],
    text_col: str = "text",
    out_col: str = "contaminated",
):
    """Append a boolean ``out_col``: does ``text_col`` contain any probe
    as a substring? Null text stays null (SQL ``LIKE`` semantics)."""
    import ray

    pattern_ref = ray.put(_probe_pattern(probes))

    def flag(batch: pa.Table) -> pa.Table:
        key = pattern_ref.hex()
        pattern = _PATTERN_CACHE.get(key)
        if pattern is None:
            pattern = ray.get(pattern_ref)
            _PATTERN_CACHE[key] = pattern
        hit = pc.match_substring_regex(batch[text_col], pattern)
        return batch.append_column(out_col, hit)

    return ds.map_batches(flag, batch_format="pyarrow", **remote_env())


def drop_contaminated(
    ds,
    probes: list[str],
    text_col: str = "text",
):
    """Filter out contaminated documents (null text is kept — unknown is
    not proven-contaminated; screen nulls separately if the corpus has
    them)."""
    flagged = flag_contaminated(ds, probes, text_col=text_col, out_col="__contam")

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(batch["__contam"], False)
        return batch.filter(pc.invert(mask)).drop_columns(["__contam"])

    return flagged.map_batches(keep, batch_format="pyarrow", **remote_env())
