"""CLI surface tests — the reference's run_* script equivalents
(build-ontology / extract / classify / search / kg-run)."""

import json

import pytest

from lmss_entity_extractor_ray.cli import main


@pytest.fixture(scope="module")
def owl(tmp_path_factory):
    from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl

    return write_fixture_owl(str(tmp_path_factory.mktemp("cliowl") / "f.owl"))


class TestCLI:
    def test_build_ontology(self, owl, tmp_path, capsys):
        assert main(["build-ontology", "--owl", owl, "--out", str(tmp_path / "art")]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["classes"] == 60 and out["branches"] == 6

    def test_extract_classify_chain(self, owl, tmp_path, capsys):
        doc = tmp_path / "doc.txt"
        doc.write_text(
            "The court considered Securities Law in its ruling. "
            "Counsel advised on contract disputes and employment law matters."
        )
        mentions = str(tmp_path / "mentions.json")
        assert main(["extract", "--owl", owl, "--text-file", str(doc), "--out", mentions]) == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["total_entities"] > 0

        matches = str(tmp_path / "matches.json")
        assert main(["classify", "--owl", owl, "--mentions", mentions, "--out", matches]) == 0
        res = json.loads(capsys.readouterr().out)
        assert 0 < res["matched"] <= res["total"] == stats["total_entities"]
        recs = json.load(open(matches))["matches"]
        assert all({"start", "end", "text", "branch", "label", "score", "iri"} <= set(r) for r in recs)

    def test_search(self, owl, capsys):
        assert main(["search", "--owl", owl, "--query", "securities law"]) == 0
        rows = json.loads(capsys.readouterr().out)
        assert rows and rows[0]["label"] == "Securities Law"

    def test_kg_run_and_resume(self, ray_session, owl, tmp_path, capsys):
        from lmss_entity_extractor_ray.ontology.artifacts import build_or_load
        from lmss_entity_extractor_ray.pipelines.corpus import make_phrase_bank, write_corpus

        art = build_or_load(owl)
        corpus = str(tmp_path / "corpus")
        write_corpus(corpus, 60, seed=42, bank=make_phrase_bank(art), rows_per_file=20)
        out = str(tmp_path / "triples")
        rc = main(["kg-run", "--owl", owl, "--corpus", corpus + "/*.parquet", "--out", out, "--shards", "2"])
        assert rc == 0
        s1 = json.loads(capsys.readouterr().out)
        assert s1["docs_in"] == 60 and s1["triples_out"] > 0
        # resume is a no-op
        assert main(["kg-run", "--owl", owl, "--corpus", corpus + "/*.parquet", "--out", out, "--shards", "2"]) == 0
        assert json.loads(capsys.readouterr().out) == s1
        # Ray session still alive (CLI must not tear down a borrowed session)
        import ray

        assert ray.is_initialized()

    def test_kg_run_bad_glob(self, owl, tmp_path):
        assert main(["kg-run", "--owl", owl, "--corpus", "/nope/*.parquet", "--out", str(tmp_path / "x")]) == 2
