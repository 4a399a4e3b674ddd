"""Extension surfaces: mention-source plugins (SURVEY.md §2.10) and the
ontology downloader / hash-gate utilities (S1/S10)."""

import io

import pytest


class TestPlugins:
    def test_plugin_spans_join_merge(self, artifacts):
        from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor

        def regex_plugin(text):
            # emit a NER span for the literal token "foob4r"
            out = []
            start = text.find("foob4r")
            if start >= 0:
                out.append(("foob4r", start, start + 6, "NER_PLUGIN"))
            return out

        de = DocumentExtractor(artifacts.gazetteer_surface_forms(), plugins=[regex_plugin])
        # stopwords around the token so the noun-phrase chunker doesn't
        # swallow it into one big span (reference merge semantics)
        mentions = de.extract("this is about foob4r in the morning")
        texts = {m["text"] for m in mentions}
        assert "foob4r" in texts
        m = next(m for m in mentions if m["text"] == "foob4r")
        assert m["type"] == "NER_PLUGIN" and m["source"] == "NER"

    def test_register_plugin_after_init(self, artifacts):
        from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor

        de = DocumentExtractor(artifacts.gazetteer_surface_forms())
        de.register_plugin(lambda t: [("zzz", 0, 3, "KEYWORD")] if t.startswith("zzz") else [])
        assert any(m["text"] == "zzz" for m in de.extract("zzz of the rest"))


class TestDownloader:
    def test_github_raw_rewrite(self):
        from lmss_entity_extractor_ray.ontology.download import github_raw_url

        assert (
            github_raw_url("https://github.com/org/repo/blob/main/LMSS.owl")
            == "https://raw.githubusercontent.com/org/repo/main/LMSS.owl"
        )
        assert github_raw_url("https://example.com/x.owl") == "https://example.com/x.owl"

    def test_download_with_injected_opener(self, tmp_path):
        from lmss_entity_extractor_ray.ontology.download import download_ontology

        dest = str(tmp_path / "o.owl")
        ok = download_ontology(
            "https://github.com/org/repo/blob/main/LMSS.owl",
            dest,
            opener=lambda url: io.BytesIO(f"<owl from {url}>".encode()),
        )
        assert ok
        assert "raw.githubusercontent.com" in open(dest).read()

    def test_download_failure_returns_false(self, tmp_path):
        from lmss_entity_extractor_ray.ontology.download import download_ontology

        def boom(url):
            raise OSError("no network")

        assert not download_ontology("https://x/y.owl", str(tmp_path / "o.owl"), opener=boom)

    def test_hash_gate(self, tmp_path):
        from lmss_entity_extractor_ray.ontology.download import needs_rebuild, store_hash

        owl = tmp_path / "f.owl"
        owl.write_text("abc")
        gate = str(tmp_path / "hash.txt")
        assert needs_rebuild(str(owl), gate)  # no stored hash yet
        store_hash(str(owl), gate)
        assert not needs_rebuild(str(owl), gate)
        owl.write_text("abcd")
        assert needs_rebuild(str(owl), gate)
