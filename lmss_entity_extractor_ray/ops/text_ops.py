"""Text-analysis operators over a document table (doc_id, text, ...).

Language-ID, quality scoring, token counting and document fingerprinting —
the per-document text statistics a training-data pipeline filters on.  All
stages are stateless vectorized ``map_batches`` (pyarrow.compute kernels or
tight numpy); none shuffles.  At 100 TB each is embarrassingly parallel and
streams block-by-block.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# Frozen stopword set shared with extraction (functions/text.py holds the
# full snapshot; this tiny subset is the quality-metric list so the DuckDB
# oracle can inline it verbatim).
QUALITY_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

_PUNCT = ".!?,;:"


def _tokens_column(text: pa.ChunkedArray) -> pa.ChunkedArray:
    """Whitespace tokenization of trimmed text as list<string> (empty/null →
    empty list), all in Arrow kernels."""
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    # split_pattern_regex on "" yields [""] — mask those to empty lists after
    split = pc.split_pattern_regex(trimmed, r"\s+")
    return split, trimmed


def token_count_batch(batch: pa.Table) -> pa.Table:
    split, trimmed = _tokens_column(batch.column("text"))
    n = pc.list_value_length(split).cast(pa.int64())
    n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n)
    return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    """doc_id → whitespace token count (SQL-parity:
    array_length(regexp_split_to_array(trim(text), '\\s+')))."""
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


_WORDISH_RE = r"[0-9A-Za-z_]+|[^0-9A-Za-z_\s]"


def wordish_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token count: word runs OR single non-word non-space chars
    (the pre-tokenization most BPE vocabularies apply), counted with ONE
    Arrow RE2 kernel — no split materialization.  Both Arrow and DuckDB use
    RE2, so the SQL oracle (``len(regexp_extract_all(text, pattern))``) is
    exact."""
    text = pc.fill_null(batch.column("text"), "")
    n = pc.count_substring_regex(text, _WORDISH_RE).cast(pa.int64())
    return pa.table({"doc_id": batch.column("doc_id"), "n_tokens_bpe": n})


def wordish_token_counts(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(
        wordish_token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    text = pc.fill_null(batch.column("text"), "")
    split, trimmed = _tokens_column(text)
    n_tok = pc.list_value_length(split).cast(pa.int64())
    n_tok = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n_tok)

    len_chars = pc.utf8_length(text).cast(pa.int64())
    # punctuation count via regex-strip (mirrors the DuckDB oracle expression)
    no_punct = pc.replace_substring_regex(text, f"[^{_PUNCT}]", "")
    punct_count = pc.utf8_length(no_punct).cast(pa.int64())
    # non-whitespace char total → mean token length
    no_ws = pc.replace_substring_regex(text, r"\s", "")
    tok_chars = pc.utf8_length(no_ws).cast(pa.float64())
    avg_tok = pc.if_else(
        pc.equal(n_tok, 0),
        pa.scalar(0.0, pa.float64()),
        pc.divide(tok_chars, pc.max_element_wise(n_tok.cast(pa.float64()), 1.0)),
    )
    # stopword ratio over the frozen QUALITY_STOPWORDS list
    toks = split.to_pylist()
    stop = frozenset(QUALITY_STOPWORDS)
    n_tok_l = n_tok.to_pylist()
    stop_ratio = [
        (sum(1 for t in row if t in stop) / nt) if nt else 0.0
        for row, nt in zip(toks, n_tok_l)
    ]
    # ratios ship as e5-scaled int64 via floor(x*1e5 + 0.5) — matching the
    # DuckDB oracle exactly (float rounding is not portable across engines)
    def _e5(arr):
        return pc.floor(pc.add(pc.multiply(arr, 100_000.0), 0.5)).cast(pa.int64())

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "len_chars": len_chars,
            "n_tokens": n_tok,
            "punct_count": punct_count,
            "avg_token_chars_e5": _e5(avg_tok),
            "stopword_ratio_e5": _e5(pa.array(stop_ratio, pa.float64())),
        }
    )


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    """Per-document quality metrics (length / punctuation / stopword ratios)."""
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# language ID — character-bigram profile heuristic (no external models)
# ---------------------------------------------------------------------------

_LANG_PROFILES: Dict[str, tuple] = {
    # top discriminative character bigrams per Latin-script language, most
    # frequent first (hand-frozen public corpus-frequency knowledge)
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ng", "of"),
    "de": ("en", "er", "ch", "de", "ei", "ie", "te", "nd", "un", "ge", "sc", "ic"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "ou", "qu", "ai", "ur", "é "),
    "es": ("de", "la", "os", "es", "ar", "el", "ue", "ra", "as", "ón", "ci", "ad"),
    "it": ("di", "la", "to", "co", "io", "ll", "no", "zi", "tt", "gl", "cc", "it"),
    "pt": ("de", "os", "ão", "ar", "ra", "as", "do", "co", "qu", "nh", "çã", "em"),
    "nl": ("en", "de", "et", "an", "ij", "ge", "aa", "va", "ee", "oo", "ke", "we"),
    "sv": ("en", "ar", "de", "et", "an", "tt", "om", "fö", "år", "ka", "så", "ns"),
    "pl": ("ie", "ni", "po", "na", "ow", "rz", "cz", "sz", "dz", "ej", "ch", "wi"),
    "tr": ("ar", "la", "an", "er", "in", "le", "ir", "bi", "ık", "ğı", "iy", "ka"),
}

# Unicode-script shortcut: non-Latin scripts identify the language family
# far more reliably than bigrams; checked before any bigram scoring.
# (range, lang) — coarse single-language mapping per script.
_SCRIPT_RANGES = (
    ((0x0400, 0x04FF), "ru"),   # Cyrillic
    ((0x0370, 0x03FF), "el"),   # Greek
    ((0x0590, 0x05FF), "he"),   # Hebrew
    ((0x0600, 0x06FF), "ar"),   # Arabic
    ((0x0900, 0x097F), "hi"),   # Devanagari
    ((0x0E00, 0x0E7F), "th"),   # Thai
    ((0xAC00, 0xD7AF), "ko"),   # Hangul syllables
    ((0x3040, 0x30FF), "ja"),   # Hiragana + Katakana
    ((0x4E00, 0x9FFF), "zh"),   # CJK unified (after ja check: kana wins)
)


class LangId:
    """Stateful n-gram language scorer — built once per actor (the pattern
    for model-backed language ID; this deterministic profile scorer is the
    in-container stand-in).

    Two tiers: (1) Unicode-script vote — if ≥ 30% of sampled characters
    fall in one non-Latin script range, that script's language is returned
    directly (ja is checked before zh so kana beats shared CJK ideographs);
    (2) Latin-script bigram profiles: each sampled bigram is looked up ONCE
    in a merged {bigram → weight vector} dict and accumulated with numpy —
    per-doc cost is O(sampled bigrams), independent of profile count."""

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        merged: Dict[str, np.ndarray] = {}
        for li, lang in enumerate(self.langs):
            grams = _LANG_PROFILES[lang]
            for i, g in enumerate(grams):
                vec = merged.get(g)
                if vec is None:
                    vec = np.zeros(len(self.langs), dtype=np.float64)
                    merged[g] = vec
                vec[li] = len(grams) - i
        self.merged = merged

    def _score_one(self, text: str) -> str:
        if not text:
            return "und"
        t = text.lower()
        n = len(t)
        step = max(1, (n - 1) // 2000)  # cap work per doc; sample bigrams

        # tier 1: script vote over the sampled characters
        sampled = t[::step] if step > 1 else t
        counts = [0] * len(_SCRIPT_RANGES)
        for ch in sampled:
            cp = ord(ch)
            if cp < 0x0370:
                continue
            for i, ((lo, hi), _) in enumerate(_SCRIPT_RANGES):
                if lo <= cp <= hi:
                    counts[i] += 1
                    break
        total = max(1, len(sampled))
        for i, ((_, _), lang) in enumerate(_SCRIPT_RANGES):
            if counts[i] / total >= 0.30:
                return lang

        # tier 2: bigram profiles (Latin scripts)
        scores = np.zeros(len(self.langs), dtype=np.float64)
        merged = self.merged
        for i in range(0, n - 1, step):
            vec = merged.get(t[i : i + 2])
            if vec is not None:
                scores += vec
        if not scores.any():
            return "und"
        # deterministic tie-break: lowest lang code (langs is sorted)
        return self.langs[int(np.argmax(scores))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array([self._score_one(t) for t in texts], pa.string()),
            }
        )


def lang_id(ds: rd.Dataset, concurrency=None) -> rd.Dataset:
    kwargs = {"concurrency": concurrency} if concurrency else {"concurrency": 2}
    return ds.map_batches(LangId, batch_format="pyarrow", **kwargs)


# ---------------------------------------------------------------------------
# document fingerprint — sha256 of whitespace-normalized lowercased text
# ---------------------------------------------------------------------------
# The normalization (lowercase, collapse runs of RE2-\s to one space, strip)
# runs as vectorized Arrow kernels; the digest is C-speed hashlib.  Both
# steps are expressible verbatim in DuckDB —
#   sha256(trim(regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g')))
# — so fingerprints is driver-oracle-checkable end to end (Arrow and DuckDB
# both use RE2, so the \s classes agree exactly).


def normalize_for_fingerprint(text: str) -> str:
    """Reference normalization for one string (tests / tiny inputs); the
    batch path does the same transform in Arrow kernels."""
    import re

    # explicit class: RE2's \s (Arrow/DuckDB) is [ \t\n\f\r] — NO \v,
    # unlike Python's ASCII \s
    return re.sub(r"[ \t\n\f\r]+", " ", (text or "").lower()).strip(" ")


def fingerprint_text(text: str) -> str:
    """sha256 hex digest of the normalized text (single-string helper)."""
    import hashlib

    return hashlib.sha256(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    import hashlib

    text = pc.fill_null(batch.column("text"), "")
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "), characters=" "
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(
                [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()],
                pa.string(),
            ),
        }
    )


def fingerprints(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Unicode normalization (NFC)
# ---------------------------------------------------------------------------


def unicode_normalize(ds: rd.Dataset, form: str = "NFC") -> rd.Dataset:
    """(doc_id, norm_sha256, changed) — Unicode-normalize ``text`` and ship
    the digest of the normalized form plus a changed flag (web corpora mix
    composed/decomposed encodings of the same glyphs; normalizing first is
    what makes downstream dedup/fingerprints see them as equal).

    Uses Python's ``unicodedata`` (C implementation of the normative
    algorithm), NOT ``pc.utf8_normalize`` — this pyarrow build emits
    DECOMPOSED output for form="NFC" (observed: 'café' → 'cafe\\u0301'),
    which would break parity with DuckDB's utf8proc-based
    ``nfc_normalize``.  Map-only, no shuffle."""
    import hashlib
    import unicodedata

    def f(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        norm = [unicodedata.normalize(form, t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_sha256": pa.array(
                    [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in norm],
                    pa.string(),
                ),
                "changed": pa.array(
                    [int(a != b) for a, b in zip(norm, texts)], pa.int32()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# regex redaction (PII scrubbing shape)
# ---------------------------------------------------------------------------
# Production patterns for a web corpus; the contract query instance uses a
# pattern that actually fires on the synthetic tables (the mechanism is what
# is under test — both engines run the SAME RE2 pattern).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def regex_redact(
    ds: rd.Dataset, pattern: str, replacement: str = "<REDACTED>"
) -> rd.Dataset:
    """Replace every RE2 ``pattern`` match in ``text`` and report per doc:
    (doc_id, n_redacted, redacted_sha256).

    The match count and the replacement both run as single Arrow RE2
    kernels over the whole batch; the digest is C-speed hashlib.  Arrow and
    DuckDB share RE2, so ``len(regexp_extract_all(...))`` +
    ``sha256(regexp_replace(..., 'g'))`` is an exact SQL oracle.  Shipping
    the digest instead of the scrubbed text keeps the contract result
    small; production pipelines keep the redacted column instead."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        n = pc.count_substring_regex(text, pattern).cast(pa.int64())
        red = pc.replace_substring_regex(text, pattern, replacement)
        sha = pa.array(
            [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in red.to_pylist()],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_redacted": n,
                "redacted_sha256": sha,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def corpus_report(
    ds: rd.Dataset, group_col: str = "lang", text_col: str = "text"
) -> rd.Dataset:
    """Per-group corpus data card: (group, n_docs, n_empty, n_chars,
    n_tokens, max_tokens) — the release-notes summary every corpus drop
    ships (docs per language, token totals, empty-doc counts).

    One map-only pass: per block, Arrow kernels compute char/token counts
    and a block-local group_by emits ≤ |groups| partial rows; the bounded-
    cardinality coordinator fold (ops/combine.py) merges them — no AllToAll
    for a few-kilobyte result.  All outputs are exact integers, so the SQL
    oracle compares value-for-value."""
    from .combine import col_type, combine_partials, sort_table

    def partial(batch: pa.Table) -> pa.Table:
        split, trimmed = _tokens_column(batch.column(text_col))
        n = pc.list_value_length(split).cast(pa.int64())
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n)
        chars = pc.utf8_length(pc.fill_null(batch.column(text_col), "")).cast(
            pa.int64()
        )
        empty = pc.equal(trimmed, "").cast(pa.int64())
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "p_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "p_empty": empty,
                "p_chars": chars,
                "p_tokens": n,
                "p_maxtok": n,
            }
        )
        g = t.group_by([group_col]).aggregate(
            [
                ("p_docs", "sum"),
                ("p_empty", "sum"),
                ("p_chars", "sum"),
                ("p_tokens", "sum"),
                ("p_maxtok", "max"),
            ]
        )
        return g.rename_columns(
            [group_col, "p_docs", "p_empty", "p_chars", "p_tokens", "p_maxtok"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = combine_partials(
        partials,
        [group_col],
        [
            ("p_docs", "sum", "n_docs"),
            ("p_empty", "sum", "n_empty"),
            ("p_chars", "sum", "n_chars"),
            ("p_tokens", "sum", "n_tokens"),
            ("p_maxtok", "max", "max_tokens"),
        ],
        schema=pa.schema(
            [
                (group_col, col_type(ds, group_col)),
                ("p_docs", pa.int64()),
                ("p_empty", pa.int64()),
                ("p_chars", pa.int64()),
                ("p_tokens", pa.int64()),
                ("p_maxtok", pa.int64()),
            ]
        ),
    )
    return rd.from_arrow(sort_table(final, [(group_col, "ascending")]))
