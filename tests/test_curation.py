"""Corpus-curation pipeline: planted dups + junk are removed, good docs
survive, report counts reconcile."""

import json
import os

import pyarrow as pa
import pytest

from ulp_ray.pipelines.curation import curate_documents

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs back to "
    "the barn where the farmer keeps all of the fresh hay for the winter"
)


def _docs():
    rows = [
        (0, GOOD),
        (1, GOOD),  # exact dup of 0 → dropped by exact dedup
        (2, GOOD.replace("quick", "speedy")),  # near dup of 0 → dropped by minhash
        (3, "!!!"),  # junk → dropped by quality filter
        (4, "a completely different long document about databases and the "
            "storage engines that power them with many details of the "
            "internal page layout and the write ahead log"),
        (5, GOOD),  # exact dup of 0
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_curation_end_to_end(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_docs())
    out = str(tmp_path / "curation")
    curated, report, _ = curate_documents(
        ds, out_dir=out, min_quality=0.2, jaccard_threshold=0.6
    )
    ids = sorted(r["doc_id"] for r in curated.take_all())
    assert ids == [0, 4]  # dup/near-dup/junk all gone; survivors keep min id
    assert report.rows_in == 6
    assert report.rows_after_quality == 5  # junk removed
    assert report.rows_after_exact_dedup == 3  # 1 and 5 collapsed into 0
    assert report.near_dup_pairs >= 1  # (0, 2)
    assert report.rows_out == 2
    # durable outputs
    on_disk = json.load(open(os.path.join(out, "report.json")))
    assert on_disk["rows_out"] == 2
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out, "curated"))
    assert sorted(t["doc_id"].to_pylist()) == [0, 4]
    assert "quality_score" in t.column_names and "lang_pred" in t.column_names


def test_curation_with_splits(ray_session, tmp_path):
    import json

    import ray.data

    from ulp_ray.pipelines.curation import curate_documents

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "cur")
    curated, report, _ = curate_documents(
        ds, out_dir=out, min_quality=0.2, splits={"train": 0.8, "val": 0.2}
    )
    assert report.split_rows is not None
    assert sum(report.split_rows.values()) == report.rows_out
    assert os.path.isdir(os.path.join(out, "splits", "train"))
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f)["split_rows"] == report.split_rows


def test_curation_near_dup_disabled(ray_session):
    """near_dup=False = analyze → quality filter → exact dedup only (the
    SQL-expressible composition the curate_documents_sql oracle pins)."""
    import ray.data

    ds = ray.data.from_arrow(_docs())
    curated, report, _ = curate_documents(ds, min_quality=0.2, near_dup=False)
    ids = sorted(r["doc_id"] for r in curated.take_all())
    assert ids == [0, 2, 4]  # near-dup 2 SURVIVES; exact dups + junk gone
    assert report.near_dup_pairs == 0
    assert report.rows_out == 3


def test_curation_pair_set_never_touches_driver(ray_session, monkeypatch):
    """The near-dup pair set must stay a Dataset end-to-end inside
    curation: with Dataset.take_all/to_pandas AND the driver-side verify
    all forbidden, the pipeline must still produce the same survivors
    (losers are dropped by the bucketed anti-join, not a driver id set)."""
    import ray.data

    import ulp_ray.stages.dedup as dmod

    def _forbidden(*a, **k):  # noqa: ANN001
        raise AssertionError("pair set / texts must not materialize on the driver")

    monkeypatch.setattr(dmod, "_verify_pairs_driver", _forbidden)
    monkeypatch.setattr(ray.data.Dataset, "take_all", _forbidden)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _forbidden)

    ds = ray.data.from_arrow(_docs())
    curated, report, _ = curate_documents(
        ds, min_quality=0.2, jaccard_threshold=0.6, verify="bucketed"
    )
    monkeypatch.undo()
    assert sorted(r["doc_id"] for r in curated.take_all()) == [0, 4]
    assert report.near_dup_pairs >= 1


def test_curation_contamination_and_repetition_stages(ray_session):
    """probes= drops contaminated docs before analysis;
    max_dup_line_frac= drops repetitive docs at the quality filter."""
    import pyarrow as pa
    import ray.data

    base = _docs().to_pandas()
    probe = "zzcontaminantzz"
    extra = pa.table(
        {
            "doc_id": pa.array([990001, 990002], pa.int64()),
            "text": pa.array(
                [
                    "clean text " + " ".join(f"w{i}" for i in range(30)),
                    f"evil {probe} text " + " ".join(f"w{i}" for i in range(30)),
                ]
            ),
        }
    )
    import pandas as pd

    df = pd.concat([base[["doc_id", "text"]], extra.to_pandas()])
    ds = ray.data.from_pandas(df).repartition(3)
    curated, report, _ = curate_documents(
        ds, min_quality=0.0, near_dup=False, probes=[probe]
    )
    ids = {r["doc_id"] for r in curated.select_columns(["doc_id"]).take_all()}
    assert 990002 not in ids and 990001 in ids
    assert report.rows_after_contamination == report.rows_in - 1

    # repetition bound: a doc of 40 identical lines is dropped
    rep_doc = pa.table(
        {
            "doc_id": pa.array([990003], pa.int64()),
            "text": pa.array(["\n".join(["same line here"] * 40)]),
        }
    )
    df2 = pd.concat([base[["doc_id", "text"]], rep_doc.to_pandas()])
    ds2 = ray.data.from_pandas(df2).repartition(3)
    curated2, report2, _ = curate_documents(
        ds2, min_quality=0.0, near_dup=False, max_dup_line_frac=0.5
    )
    ids2 = {r["doc_id"] for r in curated2.select_columns(["doc_id"]).take_all()}
    assert 990003 not in ids2
    assert report2.rows_after_contamination is None


def test_curation_stage_checkpointing(ray_session, tmp_path):
    """checkpoint_dir: a re-run with identical parameters resumes every
    stage; an invalidated later stage recomputes alone; changed params
    recompute everything."""
    import ray.data

    ds = ray.data.from_arrow(_docs()).repartition(2)
    ck = str(tmp_path / "ck")
    c1, r1, _ = curate_documents(ds, min_quality=0.2, checkpoint_dir=ck)
    assert r1.stages_resumed == []
    rows1 = sorted(x["doc_id"] for x in c1.select_columns(["doc_id"]).take_all())

    c2, r2, _ = curate_documents(ds, min_quality=0.2, checkpoint_dir=ck)
    assert set(r2.stages_resumed) == {"02_filtered", "03_deduped", "04_neardup_pairs"}
    rows2 = sorted(x["doc_id"] for x in c2.select_columns(["doc_id"]).take_all())
    assert rows1 == rows2
    assert r2.rows_out == r1.rows_out and r2.near_dup_pairs == r1.near_dup_pairs

    # invalidate the last stage only → earlier stages still resume
    os.remove(os.path.join(ck, "04_neardup_pairs", "_done.json"))
    _, r3, _ = curate_documents(ds, min_quality=0.2, checkpoint_dir=ck)
    assert set(r3.stages_resumed) == {"02_filtered", "03_deduped"}
    assert r3.rows_out == r1.rows_out

    # parameter change → fingerprint mismatch → full recompute
    _, r4, _ = curate_documents(ds, min_quality=0.1, checkpoint_dir=ck)
    assert r4.stages_resumed == []


def test_curation_checkpoint_zero_pair_stage(ray_session, tmp_path):
    """A zero-row pairs stage checkpoints and resumes (empty-file pin)."""
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "a long unique document about one topic " * 3,
                    "an entirely different text on another subject " * 3,
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    ck = str(tmp_path / "ck0")
    _, r1, _ = curate_documents(ds, min_quality=0.0, checkpoint_dir=ck)
    assert r1.near_dup_pairs == 0
    _, r2, _ = curate_documents(ds, min_quality=0.0, checkpoint_dir=ck)
    assert "04_neardup_pairs" in r2.stages_resumed
    assert r2.rows_out == 2


def test_curation_out_dir_rerun_does_not_duplicate(ray_session, tmp_path):
    """Review regression: re-running with the same out_dir (the
    checkpoint-resume flow) must overwrite curated/, not append a second
    generation of files."""
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data

    ds = ray.data.from_arrow(_docs()).repartition(2)
    out = str(tmp_path / "o")
    ck = str(tmp_path / "c")
    _, r1, _ = curate_documents(ds, out_dir=out, min_quality=0.2, checkpoint_dir=ck)
    _, r2, _ = curate_documents(ds, out_dir=out, min_quality=0.2, checkpoint_dir=ck)
    rows = sum(
        _pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(out, "curated", "*.parquet"))
    )
    assert rows == r2.rows_out == r1.rows_out


def test_curation_exact_ngram_near_dup_method(ray_session, tmp_path):
    """near_dup_method='exact_ngram' swaps the minhash sketch for the
    EXACT prefix-filtered n-gram Jaccard pair finder: same survivor
    rule, deterministic pair set, report records the method."""
    import ray.data

    ds = ray.data.from_arrow(_docs())
    out = str(tmp_path / "curation_ngram")
    curated, report, _ = curate_documents(
        ds,
        out_dir=out,
        min_quality=0.2,
        jaccard_threshold=0.6,
        near_dup_method="exact_ngram",
    )
    ids = sorted(r["doc_id"] for r in curated.take_all())
    assert ids == [0, 4]  # identical survivors to the minhash path here
    assert report.near_dup_pairs >= 1  # (0, 2) found exactly
    assert report.near_dup_method == "exact_ngram"
    on_disk = json.load(open(os.path.join(out, "report.json")))
    assert on_disk["near_dup_method"] == "exact_ngram"

    with pytest.raises(ValueError, match="near_dup_method"):
        curate_documents(ds, near_dup_method="bogus")


def test_curation_component_scope_transitive_closure(ray_session):
    """near_dup_scope='component' dedups by CLUSTER: A~C and B~C (but
    never A~B) put all three in one component — only min-id A survives,
    where the default pair scope would keep both A and B."""
    import ray.data

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu apple banana cherry date"
    ).split()
    a = base.copy()
    a[5] = "changedone"
    b = base.copy()
    b[24] = "changedtwo"
    # word-3-gram Jaccard: A-C = B-C ≈ 0.806 (pass at t=0.7),
    # A-B ≈ 0.647 (fail) — exactly the non-transitive triangle
    docs = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array([" ".join(a), " ".join(b), " ".join(base)]),
        }
    )
    ds = ray.data.from_arrow(docs)
    kw = dict(
        min_quality=0.0,
        jaccard_threshold=0.7,
        near_dup_method="exact_ngram",
    )
    pair_ids = sorted(
        r["doc_id"]
        for r in curate_documents(ds, near_dup_scope="pairs", **kw)[0].take_all()
    )
    comp_curated, comp_report, _ = curate_documents(
        ds, near_dup_scope="component", **kw
    )
    comp_ids = sorted(r["doc_id"] for r in comp_curated.take_all())
    assert pair_ids == [10, 11]  # C dropped, A and B both survive
    assert comp_ids == [10]  # one representative per cluster
    assert comp_report.near_dup_scope == "component"

    with pytest.raises(ValueError, match="near_dup_scope"):
        curate_documents(ds, near_dup_scope="bogus", **kw)


def test_curation_min_logprob_and_token_budget(ray_session):
    """Perplexity filter drops the gibberish doc (low corpus-bigram avg
    log-prob); the token-budget stage caps per-group tokens; report
    fields record both."""
    import ray.data

    # corpus of repeated fluent docs + one gibberish doc whose bigrams
    # are all corpus-unique -> far lower avg log-prob
    rows = [(i, GOOD + f" tail{i % 2}") for i in range(8)]
    rows.append((8, "zq xv qj wk vx kq jz qx zk wv"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * 9, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)

    from ulp_ray.stages.vocab import bigram_logprob

    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_logprob(ds, "text", "doc_id").take_all()
    }
    assert scores[8] < min(scores[i] for i in range(8)) - 0.5
    thresh = (scores[8] + min(scores[i] for i in range(8))) / 2

    curated, report, _ = curate_documents(
        ds,
        min_quality=0.0,
        near_dup=False,
        min_logprob=thresh,
    )
    ids = sorted(r["doc_id"] for r in curated.take_all())
    assert 8 not in ids
    assert report.rows_after_logprob == len(ids)
    assert report.min_logprob == thresh

    # token budget: GOOD has 28 tokens + 1 tail = 29; budget of 60
    # keeps exactly 2 docs of the en group (docs are exact-dedup
    # survivors: ids 0 and 1 by text)
    curated2, report2, _ = curate_documents(
        ds,
        min_quality=0.0,
        near_dup=False,
        token_budget=("lang", 60),
    )
    kept = curated2.take_all()
    assert report2.rows_after_token_budget == len(kept)
    assert sum(r["n_tokens"] for r in kept) <= 60
    assert len(kept) >= 1
    assert report2.token_budget == ["lang", 60]
