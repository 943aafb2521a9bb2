"""Corpus-curation pipeline: the training-data use case composed from the
engine's operators — analyze → quality-filter → exact-dedup → near-dup
removal → curated Parquet + report.

    read_parquet(documents)
      → map_batches(analyze)          # lang-ID, quality features,
                                      # fingerprint (functions/text.py)
      → [optional] drop_contaminated  # broadcast benchmark-probe screen
      → filter(quality ≥ min_quality  # vectorized predicate; optional
               [AND repetition bound])#   Gopher-style dup-line bound
      → exact_dedup(on=text)          # hash-partition + per-group first
                                      # (MUST precede minhash: identical
                                      # docs make LSH buckets quadratic)
      → minhash near-dup pairs        # shingle→sig→LSH→verify ≥ threshold
      → drop the higher doc_id of each verified pair
      → [optional] hash_split(id)     # deterministic train/val/test
      → write_parquet(out_dir/curated [, splits/<name>]) + report.json

Every stage streams; the only all-to-alls are the dedup groupbys (fixed-
width hash keys, never text). The report carries per-stage row counts —
the curation lineage a 100 TB corpus run needs to audit its yield.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env
from ..functions.text import fingerprint_batch, lang_id_batch, quality_features
from ..stages.dedup import exact_dedup, minhash_dedup, ngram_jaccard_pairs

__all__ = ["CurationReport", "curate_documents"]


class _StageCkpt:
    """Stage-level checkpointing for long curation runs: each stage's
    output is written to ``<root>/<stage>/`` with an atomic
    ``_done.json`` carrying the run's parameter fingerprint and the
    stage row count; a re-run whose fingerprint matches reads the
    Parquet back instead of recomputing. Any parameter (or input-size)
    change invalidates every stage — curation stages are corpus-wide
    transforms, so stage grain is the natural resume unit (the
    flagship's partition-grain checkpointing covers the parse path).
    ``_``-prefixed files are ignored by the Parquet dataset reader, so
    the marker can live inside the stage dir (atomic rename puts it
    there only after the data is durable).

    Durability scope: the pre-marker fsync loop in :meth:`save` walks the
    files the DRIVER can list, which makes the done-marker guarantee
    hold on a single node or when ``root`` is driver-local. On a
    multi-node cluster with shared storage, ``write_parquet`` tasks
    write from workers and a driver-side fsync only forces the metadata
    the driver's mount has seen — POSIX-complete for NFS close-to-open
    semantics, but NOT a guarantee for arbitrary shared filesystems.
    Object stores (S3 etc.) don't need it: their writes are atomic at
    PUT granularity, so only the marker rename matters there."""

    def __init__(self, root: str, fingerprint: dict) -> None:
        self.root = root
        self.fp = fingerprint
        self.resumed: list[str] = []
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def load(self, stage: str):
        done = os.path.join(self._dir(stage), "_done.json")
        if not os.path.isfile(done):
            return None
        try:
            with open(done) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        if meta.get("fingerprint") != self.fp:
            return None
        import ray.data

        self.resumed.append(stage)
        return ray.data.read_parquet(self._dir(stage)), int(meta["rows"])

    def save(self, stage: str, ds):
        import pyarrow.parquet as _pq

        from .._env import remote_env as _re

        out = ds.materialize()  # current run consumes the object-store
        rows = out.count()      # copy; the dir below serves future resumes
        d = self._dir(stage)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        if rows > 0:
            out.write_parquet(d, ray_remote_args=_re())
        else:
            # a zero-row stage writes no files — pin one empty file with
            # the schema so a resume can re-read without recomputing
            schema = out.schema()
            arrow_schema = getattr(schema, "base_schema", None)
            if arrow_schema is None or len(arrow_schema) == 0:
                # schema unknowable: better an un-checkpointed stage
                # (recomputed on resume) than a column-less pin that
                # crashes the NEXT run's downstream stages
                return out, rows
            _pq.write_table(
                arrow_schema.empty_table(), os.path.join(d, "part-empty.parquet")
            )
        # the marker vouches for the data: fsync the parquet files (and
        # the dir) BEFORE the marker rename, or a crash could leave a
        # valid marker over torn pages
        for name in os.listdir(d):
            with open(os.path.join(d, name), "rb") as df_:
                os.fsync(df_.fileno())
        dirfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
        tmp = os.path.join(d, "_done.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"fingerprint": self.fp, "rows": rows}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, "_done.json"))
        return out, rows


@dataclass
class CurationReport:
    rows_in: int
    rows_after_contamination: int | None
    rows_after_quality: int
    rows_after_exact_dedup: int
    near_dup_pairs: int
    rows_out: int
    min_quality: float
    jaccard_threshold: float
    split_rows: dict | None = None
    stages_resumed: list | None = None
    near_dup_method: str = "minhash"
    near_dup_scope: str = "pairs"
    min_logprob: float | None = None
    rows_after_logprob: int | None = None
    token_budget: list | None = None
    rows_after_token_budget: int | None = None

    def write(self, out_dir: str) -> None:
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(asdict(self), f, indent=1, sort_keys=True)


def curate_documents(
    ds,
    out_dir: str | None = None,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: dict[str, float] | None = None,
    near_dup: bool = True,
    near_dup_method: str = "minhash",
    near_dup_scope: str = "pairs",
    ngram_n: int = 3,
    verify: str = "auto",
    probes: list[str] | None = None,
    max_dup_line_frac: float | None = None,
    checkpoint_dir: str | None = None,
    cc_max_iters: int = 64,
    min_logprob: float | None = None,
    token_budget: tuple | None = None,
) -> tuple:
    """Run the curation pipeline over a documents dataset.

    Returns ``(curated_dataset, CurationReport, splits_dict)``; when
    ``out_dir`` is given, also writes ``curated/`` Parquet and
    ``report.json``. ``splits`` (e.g. ``{"train": 0.95, "val": 0.05}``)
    adds a deterministic hash-of-id split as the final stage —
    resume-stable and document-atomic — returning the split datasets,
    recording per-split counts in the report, and (with ``out_dir``)
    overwriting ``splits/<name>/`` Parquet. The split filters run over
    the already-materialized curated dataset, so they re-scan the object
    store, not the source files.

    ``near_dup=False`` skips the near-dup stage entirely — the remaining
    composition (analyze → quality filter → exact dedup) is exactly
    SQL-expressible, which is what the ``curate_documents_sql`` oracle
    twin pins. ``near_dup_method`` selects the pair finder:
    ``"minhash"`` (default — the sketch path; ``verify`` is forwarded
    to :func:`minhash_dedup`) or ``"exact_ngram"``
    (:func:`ngram_jaccard_pairs` — EXACT prefix-filtered all-pairs
    word-``ngram_n``-gram Jaccard; same survivor rule, deterministic
    pair set, pricier on heavily-shingled corpora). Both emit
    ``(id_a < id_b)`` pairs, so the min-id survivor rule below is
    method-independent.

    ``near_dup_scope`` picks the survivor semantics: ``"pairs"``
    (default, the oracle-pinned contract) drops the higher id of every
    verified pair — a document survives unless it directly loses a
    pairwise comparison; ``"component"`` takes the TRANSITIVE closure
    of the pair graph (`stages/graph.py` connected components) and
    keeps one min-id representative per duplicate CLUSTER — the classic
    web-crawl MinHash-dedup semantics (similarity isn't transitive, so
    pairs (1,3),(2,3) cluster {1,2,3} even though (1,2) never verified).
    ``"component"`` drops a superset of ``"pairs"``'s losers.

    ``probes`` switches on benchmark decontamination (drop any document
    containing a probe substring — broadcast probe set, corpus streams);
    ``max_dup_line_frac`` adds a Gopher-style repetition bound to the
    quality filter (documents whose duplicate-line fraction
    ``1 − n_distinct_lines/n_lines`` exceeds it are dropped; single-line
    and empty documents pass).

    ``cc_max_iters`` bounds the connected-components rounds when
    ``near_dup_scope="component"`` (with per-round pointer jumping 64
    covers graphs of diameter ~2^64 — the knob exists so an adversarial
    configuration can raise it rather than die mid-pipeline).

    ``min_logprob`` adds a perplexity-style fluency filter AFTER exact
    dedup: documents whose corpus-bigram average log-probability
    (:func:`~ulp_ray.stages.vocab.bigram_logprob` — add-one smoothed,
    estimated on the post-dedup corpus itself) falls below the bound
    are dropped via a bucketed anti-join. Documents with fewer than two
    tokens have no score and pass (no evidence). ``token_budget`` =
    ``(group_col, budget)`` adds a final data-MIXING stage before the
    splits: per group (``lang``, ``source``, or the analyzer's
    ``lang_pred``), keep documents in deterministic hash order while
    the running ``n_tokens`` total stays within the budget
    (:func:`~ulp_ray.stages.split.token_budget_sample`).

    ``checkpoint_dir`` turns on stage-level checkpointing: each stage's
    output lands durably under ``checkpoint_dir/<stage>/`` with an
    atomic done-marker, and a re-run with identical parameters (and
    input row count) resumes from the last completed stage instead of
    recomputing the corpus — ``report.stages_resumed`` records which.

    Scale note: near-dup losers are removed with a bucketed anti-join
    (``stages/join.py``) — the verified-pair set stays a Dataset end to
    end (it is O(corpus) on a heavily duplicated crawl), never a driver
    id set or a task-closure broadcast.
    """
    rows_in = ds.count()

    ckpt = None
    if checkpoint_dir:
        ckpt = _StageCkpt(
            checkpoint_dir,
            {
                "rows_in": rows_in,
                "min_quality": min_quality,
                "jaccard_threshold": jaccard_threshold,
                "id_col": id_col,
                "text_col": text_col,
                "near_dup": bool(near_dup),
                "near_dup_method": near_dup_method,
                "near_dup_scope": near_dup_scope,
                "ngram_n": ngram_n,
                "probes": sorted(probes) if probes else None,
                "max_dup_line_frac": max_dup_line_frac,
                "min_logprob": min_logprob,
                "token_budget": list(token_budget) if token_budget else None,
            },
        )

    def _stage(name: str, build):
        """Materialize a stage: via the durable checkpoint when enabled
        (resume hit → no recompute), else into the object store."""
        if ckpt is not None:
            hit = ckpt.load(name)
            if hit is not None:
                return hit
            return ckpt.save(name, build())
        out = build().materialize()
        return out, out.count()

    rows_after_contamination = None
    if probes:
        from ..stages.contamination import drop_contaminated

        ds, rows_after_contamination = _stage(
            "01_decontaminated",
            lambda: drop_contaminated(ds, probes, text_col=text_col),
        )

    def analyze(batch: pa.Table) -> pa.Table:
        q = quality_features(batch[text_col])
        out = batch
        for name in ("n_tokens", "quality_score"):
            out = out.append_column(name, q[name])
        out = out.append_column("lang_pred", lang_id_batch(batch[text_col]))
        return out.append_column("fingerprint", fingerprint_batch(batch[text_col]))

    analyzed = ds.map_batches(analyze, batch_format="pyarrow", **remote_env())

    def quality_filter(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["quality_score"], min_quality)
        if max_dup_line_frac is not None:
            from ..functions.text import repetition_features

            rep = repetition_features(t[text_col])
            n_lines = rep["n_lines"]
            dup_frac = pc.divide(
                pc.cast(pc.subtract(n_lines, rep["n_distinct_lines"]), pa.float64()),
                pc.cast(pc.max_element_wise(n_lines, 1), pa.float64()),
            )
            mask = pc.and_kleene(
                mask, pc.fill_null(pc.less_equal(dup_frac, max_dup_line_frac), True)
            )
        return t.filter(pc.fill_null(mask, False))

    filtered, rows_after_quality = _stage(
        "02_filtered",
        lambda: analyzed.map_batches(
            quality_filter, batch_format="pyarrow", **remote_env()
        ),
    )

    deduped, rows_after_exact = _stage(
        "03_deduped",
        lambda: exact_dedup(filtered, on=text_col, order_col=id_col),
    )

    rows_after_logprob = None
    if min_logprob is not None:
        from ..stages.join import bucketed_anti_join
        from ..stages.vocab import bigram_logprob

        def build_ppl():
            scores = bigram_logprob(deduped, text_col=text_col, id_col=id_col)
            losers = scores.filter(
                expr=f"avg_logprob < {min_logprob}"
            ).select_columns([id_col])
            # docs absent from the score table (<2 tokens) pass
            return bucketed_anti_join(deduped, losers, on=id_col, right_on=id_col)

        deduped, rows_after_logprob = _stage("03b_ppl_filtered", build_ppl)

    if near_dup:
        if near_dup_method not in ("minhash", "exact_ngram"):
            raise ValueError(
                f"near_dup_method must be 'minhash' or 'exact_ngram', "
                f"got {near_dup_method!r}"
            )
        if near_dup_scope not in ("pairs", "component"):
            raise ValueError(
                f"near_dup_scope must be 'pairs' or 'component', "
                f"got {near_dup_scope!r}"
            )
        if near_dup_method == "exact_ngram":
            find_pairs = lambda: ngram_jaccard_pairs(  # noqa: E731
                deduped,
                text_col=text_col,
                id_col=id_col,
                n=ngram_n,
                threshold=jaccard_threshold,
            )
        else:
            find_pairs = lambda: minhash_dedup(  # noqa: E731
                deduped,
                text_col=text_col,
                id_col=id_col,
                threshold=jaccard_threshold,
                verify=verify,
            )
        # materialized once: counted for the report AND consumed by the
        # anti-join (object store / checkpoint dir, never the driver)
        pairs, n_pairs = _stage("04_neardup_pairs", find_pairs)
    else:
        pairs, n_pairs = None, 0
    if n_pairs:
        # drop losers via a bucketed anti-join — the loser set shuffles
        # as a fixed-width id column, not a driver set in a task closure
        from ..stages.join import bucketed_anti_join

        if near_dup_scope == "component":
            # transitive closure: keep one min-id representative per
            # duplicate CLUSTER (connected component of the pair graph)
            from ..stages.graph import component_losers

            curated = bucketed_anti_join(
                deduped,
                component_losers(pairs, max_iters=cc_max_iters),
                on=id_col,
                right_on="node",
            )
        else:
            # pairwise: drop the higher id of each verified pair
            curated = bucketed_anti_join(
                deduped, pairs.select_columns(["id_b"]), on=id_col, right_on="id_b"
            )
    else:
        curated = deduped

    rows_after_token_budget = None
    if token_budget is not None:
        from ..stages.split import token_budget_sample

        tb_group, tb_budget = token_budget
        src = curated
        curated, rows_after_token_budget = _stage(
            "05_token_budget",
            lambda: token_budget_sample(
                src, tb_group, id_col, "n_tokens", int(tb_budget)
            ),
        )
    curated = curated.materialize()  # counted and (optionally) written
    rows_out = curated.count()

    split_rows = None
    split_sets = {}
    if splits:
        from ..stages.split import hash_split

        split_sets = {
            name: s.materialize()
            for name, s in hash_split(curated, id_col, splits).items()
        }
        split_rows = {name: s.count() for name, s in split_sets.items()}

    report = CurationReport(
        rows_in=rows_in,
        rows_after_contamination=rows_after_contamination,
        rows_after_quality=rows_after_quality,
        rows_after_exact_dedup=rows_after_exact,
        near_dup_pairs=n_pairs,
        rows_out=rows_out,
        min_quality=min_quality,
        jaccard_threshold=jaccard_threshold,
        split_rows=split_rows,
        stages_resumed=(ckpt.resumed if ckpt is not None else None),
        near_dup_method=near_dup_method,
        near_dup_scope=near_dup_scope,
        min_logprob=min_logprob,
        rows_after_logprob=rows_after_logprob,
        token_budget=(list(token_budget) if token_budget else None),
        rows_after_token_budget=rows_after_token_budget,
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # deterministic overwrite: a re-run (the checkpoint_dir resume
        # flow in particular) must not append a second generation of
        # files into curated/ — same discipline as splits/ below
        shutil.rmtree(os.path.join(out_dir, "curated"), ignore_errors=True)
        curated.write_parquet(os.path.join(out_dir, "curated"))
        if split_sets:
            # deterministic overwrite — stale split dirs from a previous
            # run (or a changed split layout) must not survive
            import shutil as _sh

            _sh.rmtree(os.path.join(out_dir, "splits"), ignore_errors=True)
            for name, s in split_sets.items():
                s.write_parquet(os.path.join(out_dir, "splits", name))
        report.write(out_dir)
    return curated, report, split_sets
