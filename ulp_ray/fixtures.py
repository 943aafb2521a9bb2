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

__all__ = ["GoldenCounts", "generate_transcripts", "write_transcripts", "transcripts_path"]

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


def _make_texts(rule_idx: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Vectorized-ish text synthesis: one pass per template over its rows."""
    n = len(rule_idx)
    texts = np.empty(n, dtype=object)

    idx = np.flatnonzero(rule_idx == 0)  # tool_call
    if idx.size:
        tools = rng.choice(_TOOLS[1:], idx.size)
        depth = rng.integers(1, 4, idx.size)
        fname = rng.integers(0, 10_000, idx.size)
        timeout = rng.integers(1, 600, idx.size)
        texts[idx] = [
            f"Calling tool {t} with args path=/srv/{'d/' * d}f{f}.txt timeout={to}"
            for t, d, f, to in zip(tools, depth, fname, timeout)
        ]
    idx = np.flatnonzero(rule_idx == 1)  # error_line
    if idx.size:
        comp = rng.choice(_COMPONENTS, idx.size)
        code = rng.integers(0, 2**16, idx.size)
        retry = rng.integers(0, 2, idx.size)
        nw = rng.integers(3, 9, idx.size)
        texts[idx] = [
            f"ERROR [{c}] code=0x{int(cd):X} retry={'true' if r else 'false'}: "
            + " ".join(rng.choice(_WORDS, w))
            for c, cd, r, w in zip(comp, code, retry, nw)
        ]
    idx = np.flatnonzero(rule_idx == 2)  # net_event
    if idx.size:
        use_v6 = rng.random(idx.size) < 0.1
        octets = rng.integers(1, 255, (idx.size, 4))
        v6tail = rng.integers(1, 0xFFFF, idx.size)
        port = rng.integers(1024, 65535, idx.size)
        lat = rng.uniform(0.1, 500.0, idx.size).round(2)
        texts[idx] = [
            (
                f"connection from 2001:db8::{int(t):x}:{p} latency={l}ms"
                if v6
                else f"connection from {o[0]}.{o[1]}.{o[2]}.{o[3]}:{p} latency={l}ms"
            )
            for v6, o, t, p, l in zip(use_v6, octets, v6tail, port, lat)
        ]
    idx = np.flatnonzero(rule_idx == 3)  # status
    if idx.size:
        status = rng.choice(_STATUSES, idx.size)
        secs = rng.integers(0, 365 * 24 * 3600, idx.size)
        items = rng.integers(0, 10_000, idx.size)
        base = np.datetime64("2026-01-01T00:00:00")
        when = base + secs.astype("timedelta64[s]")
        texts[idx] = [
            f"status={s} at {str(w)}+00:00 items={it}"
            for s, w, it in zip(status, when, items)
        ]
    idx = np.flatnonzero(rule_idx == 4)  # free text
    if idx.size:
        nw = rng.integers(8, 40, idx.size)
        texts[idx] = [" ".join(rng.choice(_WORDS, w)) + "." for w in nw]
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


def write_transcripts(
    out_dir: str,
    n_turns: int,
    seed: int = 42,
    hot_frac: float = 0.2,
    n_files: int = 16,
) -> GoldenCounts:
    """Write the table as ``n_files`` Parquet files (≥4×CPUs files lets Ray
    parallelize the read) under ``out_dir``. Idempotent per parameters."""
    os.makedirs(out_dir, exist_ok=True)
    table, golden = generate_transcripts(n_turns, seed=seed, hot_frac=hot_frac)
    n = len(table)
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if len(chunk) == 0:
            break
        pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    return golden


def transcripts_path(n_turns: int, seed: int = 42, root: str = "/tmp/ulp_ray_fixtures") -> str:
    """Cache-by-parameters path for generated tables (bench reuse)."""
    return os.path.join(root, f"transcripts_n{n_turns}_s{seed}")
