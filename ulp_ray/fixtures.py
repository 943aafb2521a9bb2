"""Deterministic synthetic transcript tables (FIXTURES.md §1).

Generates the contract table ``(conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us])`` with:

- **hot-key skew**: the top 1% of conv_ids hold ``hot_frac`` of all turns
  (north-rule skew hazard);
- **rule-matchable text grammar** with one dominant rule (tool_call, 35%)
  so the route fan-out and the (rule, tool, role) aggregate see realistic
  dominant-rule skew;
- golden per-``(rule, tool, role)`` counts as a by-product of generation —
  an oracle independent of the pipeline (template-first generation).

All generation is numpy-vectorized and seeded; the same ``(n_turns, seed,
hot_frac)`` always produces byte-identical tables, which is what makes the
resume test's "byte-identical sinks" assertion meaningful.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["GoldenCounts", "generate_transcripts", "write_transcripts", "transcripts_path", "ensure_transcripts"]

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_P = np.array([0.40, 0.40, 0.05, 0.15])
_TOOLS = np.array(["", "bash", "read", "search", "edit", "browser"])
_TOOL_P = np.array([0.60, 0.12, 0.10, 0.08, 0.06, 0.04])
_RULES = np.array(["tool_call", "error_line", "net_event", "status", "_unmatched"])
_RULE_P = np.array([0.35, 0.15, 0.10, 0.10, 0.30])

_COMPONENTS = np.array(["auth", "scheduler", "parser", "netstack", "cache"])
_STATUSES = np.array(["null", "ok", "done", "0"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream batch merge window "
    "filter query table sort join scan hash vector column row data".split()
)


@dataclass(frozen=True)
class GoldenCounts:
    """Oracle rollup computed at generation time: (rule, tool, role) → n."""

    counts: dict[tuple[str, str, str], int]

    @property
    def by_rule(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for (rule, _, _), n in self.counts.items():
            out[rule] = out.get(rule, 0) + n
        return out


_SALAD_POOL = 4096


def _join_words(rng: np.random.Generator, n: int, lo: int, hi: int) -> np.ndarray:
    """Variable-length word salads at scale: build a pool of
    ``_SALAD_POOL`` distinct pre-joined sentences (cheap python loop),
    then sample rows by index (vectorized). Diversity is bounded by the
    pool size — fine for parse/route benchmarks where salads only need to
    NOT match any rule."""
    pool = np.array(
        [
            " ".join(rng.choice(_WORDS, rng.integers(lo, hi + 1)))
            for _ in range(min(_SALAD_POOL, max(n, 1)))
        ],
        dtype=object,
    )
    return pool[rng.integers(0, len(pool), n)]


def _make_texts(rule_idx: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Vectorized text synthesis (np.char kernels): one pass per template.

    NB: the RNG draw ORDER per template is part of the deterministic
    contract for a given fixtures version; goldens come from the same
    generator, so internal changes stay self-consistent."""
    n = len(rule_idx)
    texts = np.empty(n, dtype=object)
    A = np.char.add

    idx = np.flatnonzero(rule_idx == 0)  # tool_call
    if idx.size:
        tools = rng.choice(_TOOLS[1:], idx.size)
        depth = rng.integers(1, 4, idx.size)
        fname = rng.integers(0, 10_000, idx.size)
        timeout = rng.integers(1, 600, idx.size)
        dirs = np.array(["", "d/", "d/d/", "d/d/d/"])[depth]
        texts[idx] = A(
            A(
                A(A(A("Calling tool ", tools), " with args path=/srv/"), dirs),
                A(A("f", fname.astype("U")), ".txt timeout="),
            ),
            timeout.astype("U"),
        ).astype(object)
    idx = np.flatnonzero(rule_idx == 1)  # error_line
    if idx.size:
        comp = rng.choice(_COMPONENTS, idx.size)
        code = rng.integers(0, 2**16, idx.size)
        retry = np.array(["false", "true"])[rng.integers(0, 2, idx.size)]
        msg = _join_words(rng, idx.size, 3, 8)
        texts[idx] = A(
            A(
                A(A(A("ERROR [", comp), "] code=0x"), np.char.mod("%X", code)),
                A(A(" retry=", retry), ": "),
            ),
            msg.astype("U"),
        ).astype(object)
    idx = np.flatnonzero(rule_idx == 2)  # net_event
    if idx.size:
        use_v6 = rng.random(idx.size) < 0.1
        octets = rng.integers(1, 255, (idx.size, 4))
        v6tail = rng.integers(1, 0xFFFF, idx.size)
        port = rng.integers(1024, 65535, idx.size)
        lat = rng.uniform(0.1, 500.0, idx.size).round(2)
        v4 = A(
            A(A(octets[:, 0].astype("U"), "."), octets[:, 1].astype("U")),
            A(A(".", octets[:, 2].astype("U")), A(".", octets[:, 3].astype("U"))),
        )
        v6 = A("2001:db8::", np.char.mod("%x", v6tail))
        ip = np.where(use_v6, v6, v4)
        texts[idx] = A(
            A(A("connection from ", ip), A(":", port.astype("U"))),
            A(A(" latency=", np.char.mod("%g", lat)), "ms"),
        ).astype(object)
    idx = np.flatnonzero(rule_idx == 3)  # status
    if idx.size:
        status = rng.choice(_STATUSES, idx.size)
        secs = rng.integers(0, 365 * 24 * 3600, idx.size)
        items = rng.integers(0, 10_000, idx.size)
        base = np.datetime64("2026-01-01T00:00:00")
        when = (base + secs.astype("timedelta64[s]")).astype("U")
        texts[idx] = A(
            A(A("status=", status), A(" at ", when)),
            A(A("+00:00 items=", items.astype("U")), ""),
        ).astype(object)
    idx = np.flatnonzero(rule_idx == 4)  # free text
    if idx.size:
        texts[idx] = np.char.add(_join_words(rng, idx.size, 8, 39).astype("U"), ".").astype(
            object
        )
    return texts


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    hot_frac: float = 0.2,
    mean_turns: int = 8,
) -> tuple[pa.Table, GoldenCounts]:
    """Build the transcript table + golden (rule, tool, role) counts."""
    rng = np.random.default_rng(seed)
    n_conv = max(1, n_turns // mean_turns)
    n_hot = max(1, n_conv // 100)

    # conversation assignment with hot-key skew
    is_hot = rng.random(n_turns) < hot_frac
    conv = np.where(
        is_hot,
        rng.integers(0, n_hot, n_turns),
        rng.integers(n_hot, max(n_hot + 1, n_conv), n_turns),
    ).astype(np.int64)

    # turn_idx = cumcount within conversation (stable order = generation order)
    order = np.argsort(conv, kind="stable")
    sorted_conv = conv[order]
    group_start = np.concatenate(([True], sorted_conv[1:] != sorted_conv[:-1]))
    pos = np.arange(n_turns) - np.maximum.accumulate(
        np.where(group_start, np.arange(n_turns), 0)
    )
    turn_idx = np.empty(n_turns, dtype=np.int32)
    turn_idx[order] = pos.astype(np.int32)

    # per-conversation monotone timestamps: base + conv stagger + cumsum(1-120s)
    incr = rng.integers(1_000_000, 120_000_000, n_turns)  # 1-120 s in µs
    incr_sorted = incr[order]
    cum = np.cumsum(incr_sorted)
    base_per_group = np.where(group_start, cum - incr_sorted, 0)
    cum_within = cum - np.maximum.accumulate(base_per_group) - incr_sorted
    ts_sorted = (
        np.datetime64("2026-01-01T00:00:00", "us")
        + (sorted_conv * 3_600_000_000 + cum_within).astype("timedelta64[us]")
    )
    ts = np.empty(n_turns, dtype="datetime64[us]")
    ts[order] = ts_sorted

    role = rng.choice(_ROLES, n_turns, p=_ROLE_P)
    tool = rng.choice(_TOOLS, n_turns, p=_TOOL_P)
    rule_idx = rng.choice(len(_RULES), n_turns, p=_RULE_P)
    texts = _make_texts(rule_idx, rng)

    conv_ids = np.char.add("conv-", np.char.zfill(conv.astype(str), 8))

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )

    # golden counts: by construction, rule == template
    import collections

    counter: collections.Counter = collections.Counter(
        zip(_RULES[rule_idx], tool, role)
    )
    golden = GoldenCounts({(r, t, ro): n for (r, t, ro), n in counter.items()})
    return table, golden


_SHARD_THRESHOLD = 2_000_000


def _write_one_shard(args: tuple) -> dict:
    out_dir, shard, n_rows, seed, hot_frac = args
    table, golden = generate_transcripts(n_rows, seed=seed, hot_frac=hot_frac)
    # disjoint conv_id space per shard: prefix with the shard number
    conv = pa.compute.binary_join_element_wise(
        f"s{shard:04d}-", table["conv_id"].combine_chunks(), ""
    )
    table = table.set_column(0, "conv_id", conv)
    pq.write_table(table, os.path.join(out_dir, f"part-{shard:05d}.parquet"))
    return {"|".join(k): v for k, v in golden.counts.items()}


def write_transcripts(
    out_dir: str,
    n_turns: int,
    seed: int = 42,
    hot_frac: float = 0.2,
    n_files: int = 16,
) -> GoldenCounts:
    """Write the table as ``n_files`` Parquet files under ``out_dir``.
    Deterministic per parameters.

    Above ``_SHARD_THRESHOLD`` rows, generation is **shard-wise** (each
    file generated independently from a derived seed, conv_id namespaced
    per shard, golden counts summed) and parallelized across local
    processes — the only shape that works at 10¹²-turn scale, where no
    single node can materialize the table. Small tables stay monolithic
    (a single global conv_id space, used by the unit/e2e tests)."""
    os.makedirs(out_dir, exist_ok=True)
    if n_turns <= _SHARD_THRESHOLD:
        table, golden = generate_transcripts(n_turns, seed=seed, hot_frac=hot_frac)
        n = len(table)
        per = (n + n_files - 1) // n_files
        for i in range(n_files):
            chunk = table.slice(i * per, per)
            if len(chunk) == 0:
                break
            pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))
        return golden

    import multiprocessing as mp

    per = (n_turns + n_files - 1) // n_files
    jobs = []
    remaining = n_turns
    for i in range(n_files):
        rows = min(per, remaining)
        if rows <= 0:
            break
        jobs.append((out_dir, i, rows, seed * 100_003 + i, hot_frac))
        remaining -= rows
    procs = min(len(jobs), max(1, (os.cpu_count() or 8) - 2))
    # fork, not spawn: spawn re-imports __main__, which breaks for stdin /
    # embedded scripts; fork is fine — workers only run numpy + pyarrow
    with mp.get_context("fork").Pool(procs) as pool:
        partials = pool.map(_write_one_shard, jobs)
    total: dict[tuple[str, str, str], int] = {}
    for p in partials:
        for k, v in p.items():
            key = tuple(k.split("|"))
            total[key] = total.get(key, 0) + v
    return GoldenCounts(total)


def transcripts_path(
    n_turns: int,
    seed: int = 42,
    hot_frac: float = 0.2,
    root: str = "/tmp/ulp_ray_fixtures",
) -> str:
    """Cache-by-parameters path for generated tables (bench reuse)."""
    hf = f"_h{hot_frac}" if hot_frac != 0.2 else ""
    return os.path.join(root, f"transcripts_n{n_turns}_s{seed}{hf}")


def default_n_files(n_turns: int) -> int:
    """~150k rows (~8 MB) per file, floor 32 so a 32-cpu read always has
    a full wave of tasks; big enough that per-task overhead doesn't
    dominate (1 fused task per file)."""
    return max(32, min(512, n_turns // 150_000))


def ensure_transcripts(
    n_turns: int, seed: int = 42, hot_frac: float = 0.2
) -> str:
    """Idempotent, ATOMIC cache fill: generation lands in a tmp dir that
    renames into place, so an interrupted run never leaves a truncated
    corpus that later callers mistake for complete. The single shared
    entry point for bench.py and __ray_entry__ (one file-count policy)."""
    path = transcripts_path(n_turns, seed=seed, hot_frac=hot_frac)
    if os.path.isdir(path) and os.listdir(path):
        return path
    tmp = f"{path}.building-{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    write_transcripts(
        tmp, n_turns, seed=seed, hot_frac=hot_frac, n_files=default_n_files(n_turns)
    )
    try:
        os.replace(tmp, path)
    except OSError:  # a concurrent builder won — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return path
