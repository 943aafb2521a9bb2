"""Conversation-level operators vs pandas oracles on the fixture table."""

import pandas as pd
import pytest

from ulp_ray.fixtures import generate_transcripts
from ulp_ray.stages.conversation import (
    assemble_conversations,
    conversation_stats,
    turn_gaps,
)


@pytest.fixture(scope="module")
def transcripts(ray_session):
    import ray.data

    table, _ = generate_transcripts(3_000, seed=5)
    return ray.data.from_arrow(table).repartition(4), table.to_pandas()


def test_conversation_stats_matches_pandas(transcripts):
    ds, df = transcripts
    got = {r["conv_id"]: r for r in conversation_stats(ds).take_all()}
    exp = df.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        t_start=("ts", "min"),
        t_end=("ts", "max"),
    )
    tool_counts = df[df["role"] == "tool"].groupby("conv_id").size()
    assert len(got) == len(exp)
    for cid, row in exp.iterrows():
        g = got[cid]
        assert g["n_turns"] == row["n_turns"]
        assert g["n_tool_turns"] == int(tool_counts.get(cid, 0))
        assert g["t_start"] == row["t_start"].to_pydatetime()
        assert g["t_end"] == row["t_end"].to_pydatetime()
        assert g["duration_s"] == pytest.approx(
            (row["t_end"] - row["t_start"]).total_seconds()
        )


def test_turn_gaps_monotone_positive(transcripts):
    ds, df = transcripts
    out = turn_gaps(ds).take_all()
    assert len(out) == len(df)
    by_conv: dict = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for cid, rows in by_conv.items():
        rows.sort(key=lambda r: r["turn_idx"])
        assert rows[0]["gap_s"] is None or pd.isna(rows[0]["gap_s"])
        # fixture timestamps are monotone per conversation (1-120s steps)
        for r in rows[1:]:
            assert 1.0 <= r["gap_s"] <= 120.0


def test_assemble_conversations(transcripts):
    ds, df = transcripts
    out = assemble_conversations(ds).take_all()
    assert len(out) == df["conv_id"].nunique()
    sample = max(out, key=lambda r: r["n_turns"])
    assert sample["n_turns"] == len(sample["turns"])
    idxs = [t["turn_idx"] for t in sample["turns"]]
    assert idxs == sorted(idxs) == list(range(len(idxs)))
    # texts round-trip exactly (per-turn text equality in export shape)
    exp = df[df["conv_id"] == sample["conv_id"]].sort_values("turn_idx")
    assert [t["text"] for t in sample["turns"]] == exp["text"].tolist()
