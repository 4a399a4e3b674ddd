"""Document-format dispatcher (M12/S5-S7) and N-Triples exporter (S9)."""

import pyarrow as pa
import pytest


class TestDispatcher:
    def _table(self):
        from lmss_entity_extractor_ray.sources.filetypes import make_docx, make_pdf

        return pa.table(
            {
                "doc_key": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "payload": pa.array(
                    [
                        b"plain text body",
                        b"<html><body><p>hello <b>world</b></p></body></html>",
                        make_pdf("page one line\nsecond line", compress=True),
                        make_docx("para one\npara two"),
                        b"legacy",
                        b"%PDF-1.4 garbage, no objects",
                        b"PK not a real zip",
                    ],
                    pa.binary(),
                ),
                "kind": pa.array(
                    ["txt", "html", "pdf", "docx", "doc", "pdf", "docx"], pa.string()
                ),
            }
        )

    def test_dispatch(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.sources.documents import extract_documents

        df = extract_documents(rd.from_arrow(self._table())).to_pandas().set_index("doc_key")
        assert df.loc[1, "text"] == "plain text body" and df.loc[1, "quarantine"] is None
        assert df.loc[2, "text"] == "hello world" and df.loc[2, "quarantine"] is None
        # real pure-Python extraction (reference app/main.py:216-223)
        assert df.loc[3, "text"] == "page one line\nsecond line"
        assert df.loc[3, "quarantine"] is None
        assert df.loc[4, "text"] == "para one\npara two"
        assert df.loc[4, "quarantine"] is None
        # unknown kind rejected like the reference's .doc branch (app/main.py:224-227)
        assert df.loc[5, "text"] is None and "unsupported" in df.loc[5, "quarantine"]
        # malformed payloads quarantine instead of killing the job
        assert df.loc[6, "text"] is None and df.loc[6, "quarantine"]
        assert df.loc[7, "text"] is None and df.loc[7, "quarantine"]
        assert "payload" not in df.columns  # fat column dropped

    def test_register_extractor(self):
        from lmss_entity_extractor_ray.sources.documents import extract_text, register_extractor

        register_extractor("rot13", lambda b: b.decode().translate(
            str.maketrans(
                "abcdefghijklmnopqrstuvwxyz", "nopqrstuvwxyzabcdefghijklm"
            )
        ))
        text, q = extract_text(b"uryyb", "rot13")
        assert text == "hello" and q is None

    def test_malformed_payload_quarantines(self):
        from lmss_entity_extractor_ray.sources.documents import extract_text, register_extractor

        def boom(b):
            raise ValueError("corrupt")

        register_extractor("bad", boom)
        text, q = extract_text(b"x", "bad")
        assert text is None and "ValueError" in q


class TestUnicodeRobustness:
    def test_html_to_text_invalid_utf8(self):
        from lmss_entity_extractor_ray.functions.text import html_to_text

        # truncated multi-byte sequence must not raise (errors=replace)
        out = html_to_text(b"<p>caf\xc3</p>")
        assert "caf" in out

    def test_pipeline_handles_unicode_docs(self, ray_session, artifacts):
        import ray.data as rd
        import pyarrow as pa2

        from lmss_entity_extractor_ray.pipelines.kg import triples_dataset

        tbl = pa2.table(
            {
                "url": pa2.array(["u1", "u2", "u3"], pa2.string()),
                "warc_ts": pa2.array([0, 1, 2], pa2.timestamp("us")),
                "html": pa2.array([b"<p>\xff\xfe bad bytes</p>", None, b"<p>ok</p>"], pa2.binary()),
                "text": pa2.array([None, "Fälle des Bürgerlichen Rechts — Sécurités", "plain"], pa2.string()),
                "lang": pa2.array(["en", "de", "en"], pa2.string()),
            }
        )
        # must not raise; u1 resolves via html→text with replacement chars
        triples_dataset(rd.from_arrow(tbl), artifacts).count()


class TestNTriples:
    def test_lines_and_escape(self):
        from lmss_entity_extractor_ray.sinks.ntriples import to_ntriples_table

        t = pa.table(
            {
                "subj": pa.array(["http://a/1", 'http://a/"q"'], pa.string()),
                "pred": pa.array(["http://p", "http://p"], pa.string()),
                "obj": pa.array(["http://o", "http://o\n2"], pa.string()),
            }
        )
        lines = to_ntriples_table(t).column("text").to_pylist()
        assert lines[0] == "<http://a/1> <http://p> <http://o> ."
        assert '\\"q\\"' in lines[1] and "\\n" in lines[1]

    def test_write_ntriples(self, ray_session, tmp_path):
        import ray.data as rd

        from lmss_entity_extractor_ray.sinks.ntriples import write_ntriples

        t = pa.table(
            {
                "subj": pa.array(["s1", "s2"], pa.string()),
                "pred": pa.array(["p", "p"], pa.string()),
                "obj": pa.array(["o1", "o2"], pa.string()),
            }
        )
        out = str(tmp_path / "nt")
        write_ntriples(rd.from_arrow(t), out)
        import glob

        content = "".join(open(f).read() for f in glob.glob(out + "/*"))
        assert "<s1> <p> <o1> ." in content and "<s2> <p> <o2> ." in content


class TestWarc:
    """WARC (ISO 28500) source: round-trip byte identity, gzip member
    layout, non-response skipping, and WARC-fed ≡ parquet-fed triples."""

    def _rows(self, small_corpus, n=40):
        t = small_corpus.slice(0, n)
        urls = t.column("url").to_pylist()
        tss = t.column("warc_ts").to_pylist()
        htmls = t.column("html").to_pylist()
        rows = []
        for u, ts, h in zip(urls, tss, htmls):
            us = int(ts.timestamp() * 1_000_000)
            rows.append((u, us, h if h is not None else b"<html></html>"))
        return rows

    def test_roundtrip_byte_identity(self, small_corpus, tmp_path):
        from lmss_entity_extractor_ray.sources.warc import (
            parse_warc_bytes,
            write_warc,
        )

        rows = self._rows(small_corpus)
        plain = str(tmp_path / "a.warc")
        gz = str(tmp_path / "a.warc.gz")
        write_warc(plain, rows)
        write_warc(gz, rows)
        for path in (plain, gz):
            got = parse_warc_bytes(open(path, "rb").read())
            assert len(got) == len(rows)  # warcinfo record skipped
            for (u, us, h), rec in zip(rows, got):
                assert rec["url"] == u
                assert rec["warc_ts"] == (us // 1_000_000) * 1_000_000
                assert rec["html"] == h  # BYTE-identical payload

    def test_gzip_is_member_per_record(self, small_corpus, tmp_path):
        import gzip as _gz

        from lmss_entity_extractor_ray.sources.warc import write_warc

        rows = self._rows(small_corpus, n=5)
        gz = str(tmp_path / "m.warc.gz")
        write_warc(gz, rows)
        data = open(gz, "rb").read()
        # one gzip magic per record + one for warcinfo (CC layout)
        assert data.count(b"\x1f\x8b\x08") == len(rows) + 1
        # and each member is independently decompressible
        assert _gz.decompress(data[: data.index(b"\x1f\x8b\x08", 3)]).startswith(
            b"WARC/1.0"
        )

    def test_warc_fed_pipeline_equals_parquet_fed(
        self, ray_session, artifacts, small_corpus, tmp_path
    ):
        """End to end: triples from read_warc(...) must keyset-equal
        triples from the same pages as a null-text parquet corpus (both
        resolve text from html via the same extraction path)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.kg import triples_dataset
        from lmss_entity_extractor_ray.sources.warc import read_warc, write_warc

        rows = self._rows(small_corpus)
        warc = str(tmp_path / "cc.warc.gz")
        write_warc(warc, rows)

        pq_path = str(tmp_path / "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "html": pa.array([r[2] for r in rows], pa.binary()),
                    "text": pa.array([None] * len(rows), pa.string()),
                }
            ),
            pq_path,
        )

        from_warc = triples_dataset(
            read_warc(warc).select_columns(["url", "html", "text"]), artifacts
        ).to_pandas()
        from_pq = triples_dataset(
            rd.read_parquet(pq_path), artifacts
        ).to_pandas()
        k1 = set(zip(from_warc["subj"], from_warc["pred"], from_warc["obj"]))
        k2 = set(zip(from_pq["subj"], from_pq["pred"], from_pq["obj"]))
        assert k1 == k2 and len(k1) > 0


class TestJsonlCorpus:
    def test_jsonl_gz_fed_pipeline_equals_parquet_fed(
        self, ray_session, artifacts, small_corpus, tmp_path
    ):
        """Dolma-layout .jsonl.gz (alien key names) → corpus shape →
        triples must keyset-equal the parquet-fed run; text rides verbatim
        (byte-identity invariant), missing lang maps to null."""
        import gzip
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.kg import triples_dataset
        from lmss_entity_extractor_ray.sources.jsonl import read_jsonl_corpus

        t = small_corpus.slice(0, 40)
        urls = t.column("url").to_pylist()
        texts = t.column("text").to_pylist()
        path = str(tmp_path / "dump.jsonl.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            for u, x in zip(urls, texts):
                f.write(json.dumps({"id": u, "content": x if x is not None else ""}) + "\n")

        ds = read_jsonl_corpus(path, url_key="id", text_key="content")
        df = ds.to_pandas()
        assert list(df.columns) == ["url", "html", "text"]
        assert df["html"].isna().all()
        assert sorted(df["url"]) == sorted(urls)

        from_jsonl = triples_dataset(ds, artifacts).to_pandas()
        pq_path = str(tmp_path / "pages.parquet")
        pq.write_table(
            pa.table(
                {"url": pa.array(urls, pa.string()),
                 "html": pa.array([None] * len(urls), pa.binary()),
                 "text": pa.array([x if x is not None else "" for x in texts],
                                  pa.string())}
            ),
            pq_path,
        )
        from_pq = triples_dataset(rd.read_parquet(pq_path), artifacts).to_pandas()
        k1 = set(zip(from_jsonl["subj"], from_jsonl["pred"], from_jsonl["obj"]))
        k2 = set(zip(from_pq["subj"], from_pq["pred"], from_pq["obj"]))
        assert k1 == k2 and len(k1) > 0


class TestWarcRobustness:
    def test_truncated_and_garbage_inputs(self, small_corpus):
        """Truncation at any byte parses the complete-record prefix or
        raises ValueError; garbage raises cleanly — a crawler's reader
        must never crash a shard task with an unexpected error type."""
        from lmss_entity_extractor_ray.sources.warc import (
            build_response_record,
            parse_warc_bytes,
        )

        rec = build_response_record(
            "https://x.example/a", 1_729_555_200_000_000, b"<html>hi</html>"
        )
        full = parse_warc_bytes(rec)
        assert len(full) == 1 and full[0]["html"] == b"<html>hi</html>"
        for cut in range(0, len(rec), 5):
            try:
                out = parse_warc_bytes(rec[:cut])
                assert out == [] or out == full[: len(out)]
            except ValueError:
                pass
        for data in (b"", b"\r\n\r\n", b"GARBAGE" * 10,
                     b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx"):
            try:
                assert parse_warc_bytes(data) == []
            except ValueError:
                pass
