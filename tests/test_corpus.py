"""Synthetic corpus generator tests (FIXTURES.md §F1)."""

import pyarrow as pa

from lmss_entity_extractor_ray.pipelines.corpus import (
    CORPUS_SCHEMA,
    corpus_table,
    gen_rows,
    write_corpus,
)


class TestCorpus:
    def test_schema(self, small_corpus):
        assert small_corpus.schema.equals(CORPUS_SCHEMA)

    def test_deterministic_per_row(self, phrase_bank):
        # pure function of (seed, row_index): slicing commutes with generation
        full = gen_rows(range(50), 42, phrase_bank)
        part = gen_rows(range(10, 20), 42, phrase_bank)
        assert full["text"][10:20] == part["text"]
        assert full["url"][10:20] == part["url"]

    def test_urls_unique(self, small_corpus):
        urls = small_corpus.column("url").to_pylist()
        assert len(set(urls)) == len(urls)

    def test_null_and_empty_rows_present(self, small_corpus):
        texts = small_corpus.column("text").to_pylist()
        assert any(t is None for t in texts)            # html→text path rows
        assert any(t is not None and not t.strip() for t in texts)  # guard rows

    def test_phrases_present(self, small_corpus, phrase_bank):
        body = " ".join(t for t in small_corpus.column("text").to_pylist() if t)
        hits = sum(1 for p in phrase_bank[:10] if p in body)
        assert hits >= 5  # Zipf head phrases appear

    def test_write_matches_table(self, tmp_path, phrase_bank, small_corpus):
        import pyarrow.parquet as pq

        paths = write_corpus(str(tmp_path), 200, seed=42, bank=phrase_bank, rows_per_file=80)
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        assert tbl.column("text").to_pylist() == small_corpus.column("text").to_pylist()
        assert tbl.column("html").to_pylist() == small_corpus.column("html").to_pylist()
