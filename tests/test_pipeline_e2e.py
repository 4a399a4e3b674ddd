"""End-to-end pipeline tests: Ray triples vs oracle (P/R >= 0.95 gate),
stage outputs, dedup, aggregates, resume (SURVEY.md §5.2.3-4)."""

import os

import pyarrow as pa
import pytest

from lmss_entity_extractor_ray.config import DEFAULT_CONFIG
from lmss_entity_extractor_ray.pipelines.kg import (
    branch_histogram,
    mention_type_histogram,
    mentions_dataset,
    read_corpus,
    triples_dataset,
    broadcast_artifacts,
)
from lmss_entity_extractor_ray.pipelines.runner import read_triples, run_kg_pipeline
from oracle.mirror import ReferenceMirror, triple_key_set


@pytest.fixture(scope="module")
def oracle_triples(artifacts, small_corpus):
    return ReferenceMirror(artifacts).triples_for_corpus(small_corpus)


@pytest.fixture(scope="module")
def ray_triples(ray_session, artifacts, corpus_files):
    import ray.data as rd

    ds = triples_dataset(read_corpus(corpus_files), artifacts)
    return pa.Table.from_pandas(ds.to_pandas())


class TestGoldenE2E:
    def test_precision_recall_gate(self, ray_triples, oracle_triples):
        ray_keys = triple_key_set(ray_triples)
        ora_keys = triple_key_set(oracle_triples)
        tp = len(ray_keys & ora_keys)
        precision = tp / max(1, len(ray_keys))
        recall = tp / max(1, len(ora_keys))
        assert precision >= 0.95, f"precision {precision}"
        assert recall >= 0.95, f"recall {recall}"
        # with shared deterministic functions the match should be exact
        assert ray_keys == ora_keys

    def test_all_modes_equal(self, ray_session, artifacts, corpus_files, ray_triples):
        """distinct (flagship default, = ray_triples) == fused == modular ==
        groupby backstop — full VALUE equality, not just key sets (scores
        must be bit-identical since all paths share the same kernels)."""
        base = (
            ray_triples.to_pandas()
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        import pandas as pd

        for kwargs in (
            {"mode": "fused"},
            {"mode": "modular"},
            {"mode": "distinct", "global_dedup": True},
        ):
            ds = triples_dataset(read_corpus(corpus_files), artifacts, **kwargs)
            other = (
                ds.to_pandas()
                .sort_values(["subj", "pred", "obj"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(other, base), kwargs

    def test_triples_nonempty_and_schema(self, ray_triples):
        assert ray_triples.num_rows > 0
        assert set(ray_triples.column_names) == {
            "subj", "pred", "obj", "branch", "label", "score", "start", "end", "text",
        }

    def test_no_duplicate_keys(self, ray_triples):
        keys = list(
            zip(
                ray_triples.column("subj").to_pylist(),
                ray_triples.column("pred").to_pylist(),
                ray_triples.column("obj").to_pylist(),
            )
        )
        assert len(keys) == len(set(keys))

    def test_scores_in_range(self, ray_triples):
        scores = ray_triples.column("score").to_pylist()
        assert all(0.0 <= s <= 1.01 for s in scores)

    def test_empty_and_null_text_rows_handled(self, ray_session, artifacts, small_corpus):
        # null-text rows flow through html→text; empty rows produce nothing
        subjs = set()
        texts = small_corpus.column("text").to_pylist()
        urls = small_corpus.column("url").to_pylist()
        empty_urls = {u for u, t in zip(urls, texts) if t is not None and not t.strip()}
        import ray.data as rd

        ds = triples_dataset(rd.from_arrow(small_corpus), artifacts)
        for b in ds.iter_batches(batch_format="pyarrow"):
            subjs.update(b.column("subj").to_pylist())
        assert not (subjs & empty_urls)


class TestByteIdentity:
    def test_text_stage_sha_parity_per_url(self, ray_session, corpus_files, small_corpus):
        """The input_hint per-row invariant: extracted text is byte-identical
        per url — sha256 of the distributed stage's output equals sha256 of
        resolve_text on the raw rows."""
        import hashlib

        from lmss_entity_extractor_ray.functions.text import resolve_text
        from lmss_entity_extractor_ray.stages.text_extract import add_text_stage

        expected = {
            u: hashlib.sha256(resolve_text(t, h).encode("utf-8")).hexdigest()
            for u, t, h in zip(
                small_corpus.column("url").to_pylist(),
                small_corpus.column("text").to_pylist(),
                small_corpus.column("html").to_pylist(),
            )
        }
        got = {}
        ds = add_text_stage(read_corpus(corpus_files))
        for b in ds.iter_batches(batch_format="pyarrow"):
            for u, t in zip(b.column("url").to_pylist(), b.column("text").to_pylist()):
                got[u] = hashlib.sha256(t.encode("utf-8")).hexdigest()
        assert got == expected


class TestStages:
    def test_mentions_dataset(self, ray_session, artifacts, corpus_files):
        forms_ref, _ = broadcast_artifacts(artifacts)
        ds = mentions_dataset(read_corpus(corpus_files), forms_ref)
        batch = next(iter(ds.iter_batches(batch_size=64, batch_format="pyarrow")))
        assert set(batch.column_names) == {
            "url", "text", "start", "end", "type", "source", "context", "vector",
        }
        types = set(batch.column("type").to_pylist())
        assert types <= {"NER_GAZ", "NER_CAP", "NOUN_PHRASE", "KEYWORD"}

    def test_mention_type_histogram(self, ray_session, artifacts, corpus_files):
        forms_ref, _ = broadcast_artifacts(artifacts)
        ds = mentions_dataset(read_corpus(corpus_files), forms_ref)
        hist = mention_type_histogram(ds).to_pandas()
        assert hist["n"].sum() > 0
        assert set(hist["type"]) <= {"NER_GAZ", "NER_CAP", "NOUN_PHRASE", "KEYWORD"}

    def test_branch_histogram_salted(self, ray_session, artifacts, corpus_files, oracle_triples):
        ds = triples_dataset(read_corpus(corpus_files), artifacts)
        hist = branch_histogram(ds, buckets=4).to_pandas()
        # salted two-phase count must equal the plain pandas count
        expected = (
            oracle_triples.to_pandas().groupby("branch").size().sort_values(ascending=False)
        )
        got = dict(zip(hist["branch"], hist["n"]))
        assert got == expected.to_dict()


class TestRunnerResume:
    def test_checkpoint_resume_identical(self, ray_session, artifacts, corpus_files, tmp_path):
        full_dir = str(tmp_path / "full")
        summary = run_kg_pipeline(corpus_files, artifacts, full_dir, num_shards=4)
        assert summary["docs_in"] == 200
        full = read_triples(full_dir).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)

        # killed run: crash after 2 shards, then resume
        crash_dir = str(tmp_path / "crash")
        with pytest.raises(RuntimeError, match="injected failure"):
            run_kg_pipeline(corpus_files, artifacts, crash_dir, num_shards=4, fail_after_shards=2)
        manifest = os.path.join(crash_dir, "manifest.jsonl")
        assert sum(1 for _ in open(manifest)) == 2
        run_kg_pipeline(corpus_files, artifacts, crash_dir, num_shards=4, resume=True)
        assert sum(1 for _ in open(manifest)) == 4

        resumed = read_triples(crash_dir).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        assert resumed[["subj", "pred", "obj"]].equals(full[["subj", "pred", "obj"]])

    def test_manifest_branch_counts(self, ray_session, artifacts, corpus_files, tmp_path, oracle_triples):
        import json as _json

        out = str(tmp_path / "bc")
        run_kg_pipeline(corpus_files, artifacts, out, num_shards=2)
        totals: dict = {}
        with open(os.path.join(out, "manifest.jsonl")) as f:
            for line in f:
                for b, n in _json.loads(line)["branch_counts"].items():
                    totals[b] = totals.get(b, 0) + n
        expected = oracle_triples.to_pandas().groupby("branch").size().to_dict()
        assert totals == expected

    def test_resume_skips_completed(self, ray_session, artifacts, corpus_files, tmp_path):
        out = str(tmp_path / "out")
        run_kg_pipeline(corpus_files, artifacts, out, num_shards=2)
        manifest = os.path.join(out, "manifest.jsonl")
        before = open(manifest).read()
        run_kg_pipeline(corpus_files, artifacts, out, num_shards=2, resume=True)
        assert open(manifest).read() == before  # nothing re-ran


class TestExactLabelHits:
    def test_matches_naive_substring_join(self, ray_session, artifacts, small_corpus):
        """exact_label_hits (automaton, actor pool, Arrow normalize) must
        equal a naive normalized-substring join — the same semantics the
        DuckDB contains() oracle implements."""
        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.exact_hits import (
            exact_label_hits,
            forms_table,
            normalize_alnum,
        )

        got = exact_label_hits(
            rd.from_arrow(small_corpus.select(["url", "text"])), artifacts
        ).to_pandas()
        got_pairs = set(zip(got["url"], got["iri"]))

        ft = forms_table(artifacts)
        forms = list(zip(ft.column("form_norm").to_pylist(), ft.column("iri").to_pylist()))
        exp = set()
        for url, text in zip(
            small_corpus.column("url").to_pylist(), small_corpus.column("text").to_pylist()
        ):
            norm = " " + normalize_alnum(text or "") + " "
            for f, iri in forms:
                if (" " + f + " ") in norm:
                    exp.add((url, iri))
        assert got_pairs == exp
        assert len(exp) > 50  # the corpus plants surface forms, so hits exist

    def test_substring_labels_hit_both_classes(self, ray_session, artifacts):
        """'Intellectual Property' is a label AND a token-boundary prefix of
        'Intellectual Property Practice' (fixture specials 4+5) — a document
        containing the longer phrase must yield BOTH (url, iri) rows."""
        import pyarrow as pa
        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.exact_hits import exact_label_hits

        tbl = pa.table(
            {
                "url": pa.array(["https://x.example/1"], pa.string()),
                "text": pa.array(
                    ["Our Intellectual-Property   PRACTICE advises startups."], pa.string()
                ),
            }
        )
        got = exact_label_hits(rd.from_arrow(tbl), artifacts).to_pandas()
        iris = set(got["iri"])
        assert {"http://lmss.sali.org/IPLaw", "http://lmss.sali.org/IPLawPractice"} <= iris
