"""Tests for the training-data ops layer (dedup / similarity / text stats /
multimodal) — each op verified against an in-process brute-force oracle or
DuckDB on the driver tables."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs_tbl():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def emb_tbl():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/embeddings.parquet")


# ---------------------------------------------------------------------------
# text ops
# ---------------------------------------------------------------------------

class TestTextOps:
    def test_token_counts(self, docs_ds, docs_tbl):
        from lmss_entity_extractor_ray.ops.text_ops import token_counts

        df = token_counts(docs_ds).to_pandas()
        got = dict(zip(df["doc_id"].tolist(), df["n_tokens"].tolist()))
        for i, t in zip(docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()):
            assert got[i] == len((t or "").split()), i

    def test_token_counts_empty_and_null(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.text_ops import token_counts

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", "   ", None, "one two"], pa.string()),
            }
        )
        out = token_counts(rd.from_arrow(tbl)).to_pandas().set_index("doc_id")["n_tokens"]
        assert out.to_dict() == {1: 0, 2: 0, 3: 0, 4: 2}

    def test_quality_scores(self, docs_ds, docs_tbl):
        from lmss_entity_extractor_ray.ops.text_ops import QUALITY_STOPWORDS, quality_scores

        df = quality_scores(docs_ds).to_pandas().set_index("doc_id")
        texts = dict(zip(docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()))
        stop = set(QUALITY_STOPWORDS)
        for i in list(texts)[:50]:
            t = texts[i]
            toks = t.split()
            assert df.loc[i, "len_chars"] == len(t)
            assert df.loc[i, "n_tokens"] == len(toks)
            sr = sum(1 for x in toks if x in stop) / len(toks)
            assert df.loc[i, "stopword_ratio_e5"] == int(np.floor(sr * 100_000 + 0.5))

    def test_lang_id_mostly_english(self, docs_ds):
        from lmss_entity_extractor_ray.ops.text_ops import lang_id

        df = lang_id(docs_ds).to_pandas()
        # driver docs are English word salad; the profile scorer should call
        # a clear majority en
        assert (df["lang_pred"] == "en").mean() > 0.5

    def test_lang_id_sample_sentences(self):
        """Accuracy corpus: a few unambiguous sentences per language; script
        languages must be exact, Latin-script languages ≥ 80% overall."""
        from lmss_entity_extractor_ray.ops.text_ops import LangId

        latin = {
            "en": [
                "The quick brown fox jumps over the lazy dog and then rests in the shade of the old tree.",
                "This agreement shall be governed by the laws of the state in which the parties reside.",
            ],
            "de": [
                "Der schnelle braune Fuchs springt über den faulen Hund und ruht sich dann unter dem Baum aus.",
                "Die Entscheidung des Gerichts wurde von allen Beteiligten ausdrücklich begrüßt und anerkannt.",
            ],
            "fr": [
                "Le renard brun et rapide saute par-dessus le chien paresseux avant de se reposer à l'ombre.",
                "Cette décision est susceptible de faire l'objet d'un recours devant la cour d'appel.",
            ],
            "es": [
                "La decisión del tribunal fue celebrada por la mayoría de los ciudadanos de la región.",
                "El zorro marrón salta rápidamente sobre el perro perezoso y descansa bajo el árbol.",
            ],
            "it": [
                "La decisione della corte costituzionale degli avvocati italiani arriva dopo molti anni di attesa.",
                "Il gatto salta velocemente sopra il cane pigro e si riposa all'ombra dell'albero antico.",
            ],
            "pt": [
                "A decisão do tribunal não foi aceita pela população da região durante a manifestação.",
                "O governo anunciou novas medidas económicas para a recuperação das famílias portuguesas.",
            ],
            "nl": [
                "De snelle bruine vos springt over de luie hond en rust daarna uit onder de oude boom.",
                "De rechtbank heeft vandaag uitspraak gedaan in de zaak tegen de voormalige bestuurders.",
            ],
            "pl": [
                "Szybki brązowy lis przeskakuje nad leniwym psem i odpoczywa w cieniu starego drzewa.",
                "Decyzja sądu została przyjęta przez większość obywateli naszego województwa.",
            ],
        }
        script = {
            "ru": "Быстрая коричневая лиса перепрыгивает через ленивую собаку и отдыхает в тени.",
            "el": "Η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο και ξεκουράζεται.",
            "ar": "الثعلب البني السريع يقفز فوق الكلب الكسول ثم يستريح في الظل.",
            "he": "השועל החום המהיר קופץ מעל הכלב העצלן ונח בצל העץ.",
            "hi": "तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है और छाया में आराम करती है।",
            "ko": "빠른 갈색 여우가 게으른 개를 뛰어넘고 나무 그늘에서 쉬고 있다.",
            "ja": "素早い茶色の狐はのろまな犬を飛び越えて、木陰でひとやすみします。",
            "zh": "敏捷的棕色狐狸跳过懒狗然后在树荫下休息。",
        }
        scorer = LangId()
        for lang, sent in script.items():
            assert scorer._score_one(sent) == lang, (lang, scorer._score_one(sent))
        total = correct = 0
        for lang, sents in latin.items():
            for s in sents:
                total += 1
                correct += scorer._score_one(s) == lang
        assert correct / total >= 0.8, f"{correct}/{total}"
        assert scorer._score_one("") == "und"
        assert scorer._score_one("12345 67890 !!!") == "und"

    def test_fingerprint_deterministic_and_ws_insensitive(self):
        import hashlib

        from lmss_entity_extractor_ray.ops.text_ops import fingerprint_text

        assert fingerprint_text("Hello  world") == fingerprint_text("hello world")
        assert fingerprint_text("hello world") != fingerprint_text("world hello")
        assert fingerprint_text("") == hashlib.sha256(b"").hexdigest()
        assert fingerprint_text(" a\t b\nc ") == fingerprint_text("A b C")

    def test_fingerprint_batch_matches_single(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.text_ops import fingerprint_text, fingerprints

        df = fingerprints(docs_ds).to_pandas().set_index("doc_id")
        src = docs_ds.to_pandas().set_index("doc_id")
        for doc_id in list(src.index)[:50]:
            assert df.loc[doc_id, "fingerprint"] == fingerprint_text(src.loc[doc_id, "text"])


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _near_dup_corpus():
    """Synthetic corpus with planted near-duplicates (jaccard >= ~0.8)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    rows = []
    for i in range(20):
        rows.append((i, f"{base} unique{i} filler{i} more{i} text{i}"))
    # planted dups: tiny perturbations of the same long text (word-boundary
    # replace so only ONE token changes, not tok50..tok59)
    long = " ".join(f"tok{j}" for j in range(60))
    rows.append((100, long))
    rows.append((101, long + " extra"))
    rows.append((102, long.replace("tok5 ", "tok5x ")))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


class TestDedup:
    def test_exact_dedup_groups(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_dedup_groups

        tbl = pa.table(
            {
                "doc_id": pa.array([5, 3, 9, 7], pa.int64()),
                "text": pa.array(
                    ["a b c d e f g", "a b c d e zzz", "x y", "x  y"], pa.string()
                ),
            }
        )
        df = exact_dedup_groups(rd.from_arrow(tbl)).to_pandas().set_index("dedup_key")
        assert df.loc["a b c d e", "keep_id"] == 3 and df.loc["a b c d e", "n_dups"] == 2
        assert df.loc["x y", "keep_id"] == 7 and df.loc["x y", "n_dups"] == 2

    def test_exact_dedup_keep_first(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_dedup_keep

        tbl = pa.table(
            {
                "doc_id": pa.array([5, 3], pa.int64()),
                "text": pa.array(["a b c", "a b c"], pa.string()),
            }
        )
        df = exact_dedup_keep(rd.from_arrow(tbl)).to_pandas()
        assert df["doc_id"].tolist() == [3]

    def test_mulmod_p61_matches_python_ints(self):
        """The MinHash family is (a·h + b) mod 2^61-1 — verify the vectorized
        Mersenne-folding multiply against exact Python bignum arithmetic,
        including the worst-case corners."""
        import numpy as np

        from lmss_entity_extractor_ray.ops.dedup import _MERSENNE, _mulmod_p61

        rng = np.random.RandomState(0)
        h = rng.randint(0, _MERSENNE, size=2000, dtype=np.uint64)
        a = rng.randint(0, _MERSENNE, size=2000, dtype=np.uint64)
        edge = np.array([0, 1, 2, _MERSENNE - 1, _MERSENNE - 2, (1 << 32) - 1, 1 << 32], dtype=np.uint64)
        for x, y in ((h, a), (edge, edge[::-1].copy()), (edge, np.full(7, _MERSENNE - 1, np.uint64))):
            got = _mulmod_p61(x, y).tolist()
            exp = [(int(i) * int(j)) % _MERSENNE for i, j in zip(x, y)]
            assert got == exp

    def test_minhash_near_dup_vs_bruteforce(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import (
            brute_force_jaccard_pairs,
            near_dup_pairs_minhash,
        )

        tbl = _near_dup_corpus()
        got = near_dup_pairs_minhash(rd.from_arrow(tbl), threshold=0.7)
        # one materialization: separate to_pandas() calls re-execute the plan
        # with unstable block order and would zip misaligned rows
        got_df = got.to_pandas()
        got_pairs = set(zip(got_df["a"].tolist(), got_df["b"].tolist()))
        truth = {(a, b) for a, b, _ in brute_force_jaccard_pairs(tbl, 0.7)}
        # precision exact (every returned pair verified), recall 1.0 for the
        # planted high-jaccard dups (LSH s-curve ~1 at s>=0.8 with 16x4)
        assert got_pairs <= truth or got_pairs == truth
        assert {(100, 101), (100, 102), (101, 102)} <= got_pairs
        assert got_pairs == truth

    def test_minhash_candidate_pairs_bucket_counts(self, ray_session):
        """Identical texts share every band → candidate pair with
        n_buckets == bands; disjoint texts share none → no pair."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import minhash_candidate_pairs

        dup = " ".join(f"tok{j}" for j in range(40))
        other = " ".join(f"zzz{j}" for j in range(40))
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([dup, dup, other], pa.string()),
            }
        )
        df = minhash_candidate_pairs(rd.from_arrow(tbl), bands=16).to_pandas()
        assert sorted(zip(df["a"], df["b"], df["n_buckets"])) == [(1, 2, 16)]

    def test_minhash_empty_doc_pairs(self, ray_session):
        """Empty docs share the sentinel signature → mutual candidates with
        J(∅,∅)=1.0; the distributed verify must keep them."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import near_dup_pairs_minhash

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["", "   ", "alpha beta gamma delta"], pa.string()),
            }
        )
        got = near_dup_pairs_minhash(rd.from_arrow(tbl), threshold=0.7).to_pandas()
        assert sorted(zip(got["a"], got["b"])) == [(1, 2)]
        assert got["jaccard"].tolist() == [1.0]

    def test_ngram_jaccard_pairs_exact_vs_bruteforce(self, ray_session):
        """The inverted-index join is EXACT: must equal all-pairs Jaccard over
        distinct 3-token string shingles (docs with < k tokens excluded)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens, ngram_jaccard_pairs

        tbl = _near_dup_corpus()
        got = ngram_jaccard_pairs(rd.from_arrow(tbl), threshold=0.3).to_pandas()
        got_rows = sorted(zip(got["a"], got["b"], got["jaccard_e5"]))

        def sh(text):
            t = exact_tokens(text)
            return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

        ids = tbl.column("doc_id").to_pylist()
        sets = [sh(t) for t in tbl.column("text").to_pylist()]
        exp = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if not sets[i] or not sets[j]:
                    continue
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= 0.3:
                    a, b = sorted((ids[i], ids[j]))
                    exp.append((a, b, int(jac * 100_000 + 0.5)))
        assert got_rows == sorted(exp)

    def test_simhash_near_dup_exact_blocking(self, ray_session):
        import itertools

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import simhash64, simhash_near_dup_pairs

        tbl = _near_dup_corpus()
        got = simhash_near_dup_pairs(rd.from_arrow(tbl), max_hamming=3).to_pandas()
        got_pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
        # brute-force oracle
        ids = tbl.column("doc_id").to_pylist()
        sigs = {i: simhash64(t) for i, t in zip(ids, tbl.column("text").to_pylist())}
        truth = set()
        for x, y in itertools.combinations(sorted(ids), 2):
            d = bin((sigs[x] ^ sigs[y]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                truth.add((x, y))
        assert got_pairs == truth  # blocking is exact for hamming <= 3

    def test_embedding_near_dup_vs_bruteforce(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.dedup import embedding_near_dup_pairs

        got = embedding_near_dup_pairs(emb_ds, threshold=0.4).to_pandas()
        got_pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = unit @ unit.T
        truth = set()
        n = len(ids)
        for i in range(n):
            for j in range(n):
                if ids[i] < ids[j] and cos[i, j] >= 0.4:
                    truth.add((int(ids[i]), int(ids[j])))
        assert got_pairs == truth


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

class TestSimilarity:
    def _brute(self, emb_tbl, q, k):
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        qv = q / np.linalg.norm(q)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1
        cos = (mat @ qv) / norms
        e5 = np.floor(cos * 100_000 + 0.5).astype(np.int64)
        order = np.lexsort((ids, -e5))
        return [(int(ids[i]), int(e5[i])) for i in order[:k]]

    def test_brute_force_topk(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import brute_force_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        df = brute_force_topk(emb_ds, q, k=10).to_pandas()
        got = list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist()))
        assert got == self._brute(emb_tbl, q, 10)

    def test_lsh_topk_recall(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import lsh_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        truth_ids = {i for i, _ in self._brute(emb_tbl, q, 10)}
        df = lsh_topk(emb_ds, q, k=10, hamming_radius=2).to_pandas()
        got_ids = set(df["vec_id"].tolist())
        # approximate: the query's own vector must be found; recall loosely gated
        assert len(got_ids & truth_ids) >= 3
        assert emb_tbl.column("vec_id")[7].as_py() in got_ids

    def test_multiprobe_full_probe_equals_bruteforce(self, ray_session, emb_ds, emb_tbl):
        """Probing all 2^n_planes buckets degenerates to a full scan — must
        equal the exact baseline (same float formula by construction)."""
        from lmss_entity_extractor_ray.ops.similarity import multiprobe_lsh_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        df = multiprobe_lsh_topk(emb_ds, q, k=10, n_planes=5, n_probes=32).to_pandas()
        got = list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist()))
        assert got == self._brute(emb_tbl, q, 10)

    def test_multiprobe_dominates_radius_ball(self, ray_session, emb_ds, emb_tbl):
        """At EQUAL probed-bucket count (1 + n_planes, the radius-1 ball),
        query-directed probing must recall at least as much of the true
        top-k as blind Hamming expansion, and must always find the query's
        own vector (home bucket is probed first)."""
        from lmss_entity_extractor_ray.ops.similarity import lsh_topk, multiprobe_lsh_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        truth_ids = {i for i, _ in self._brute(emb_tbl, q, 10)}
        ball = set(lsh_topk(emb_ds, q, k=10, n_planes=6, hamming_radius=1)
                   .to_pandas()["vec_id"].tolist())
        mp = set(multiprobe_lsh_topk(emb_ds, q, k=10, n_planes=6, n_probes=7)
                 .to_pandas()["vec_id"].tolist())
        assert len(mp & truth_ids) >= len(ball & truth_ids)
        assert emb_tbl.column("vec_id")[7].as_py() in mp

    def test_multiprobe_mask_order(self):
        """Masks come out by ascending sum of squared flipped margins, home
        bucket first, no duplicates."""
        from lmss_entity_extractor_ray.ops.similarity import _multiprobe_masks

        margins = np.array([0.9, -0.1, 0.5, 0.02])
        masks = _multiprobe_masks(margins, 16)
        assert masks[0] == 0 and len(masks) == len(set(masks)) == 16
        z2 = margins ** 2

        def score(m):
            return sum(z2[i] for i in range(4) if m >> i & 1)

        scores = [score(m) for m in masks]
        assert scores == sorted(scores)
        # closest plane (index 3, |margin| 0.02) is the first flip
        assert masks[1] == 1 << 3

    def test_knn_top1_vs_bruteforce(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import knn_top1

        df = knn_top1(emb_ds).to_pandas().set_index("vec_id")
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)[order]
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = unit @ unit.T
        np.fill_diagonal(cos, -np.inf)
        for i in range(len(ids)):
            j = int(np.argmax(cos[i]))
            assert df.loc[int(ids[i]), "nn_id"] == int(ids[j])
            assert df.loc[int(ids[i]), "cos_e5"] == int(np.floor(cos[i, j] * 100_000 + 0.5))

    def test_lsh_bucketed_adds_column(self, ray_session, emb_ds):
        from lmss_entity_extractor_ray.ops.similarity import lsh_bucketed

        df = lsh_bucketed(emb_ds, dim=64).limit(5).to_pandas()
        assert "bucket" in df.columns

    def test_ivf_topk_full_probe_equals_bruteforce(self, ray_session, emb_ds, emb_tbl):
        """Probing every centroid degenerates IVF to a full scan — the result
        must equal the exact baseline (same float formula by construction)."""
        from lmss_entity_extractor_ray.ops.similarity import ivf_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        df = ivf_topk(emb_ds, q, k=10, n_centroids=8, n_probe=8).to_pandas()
        got = list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist()))
        assert got == self._brute(emb_tbl, q, 10)

    def test_ivf_topk_probe_subset_recall(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import ivf_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        truth_ids = {i for i, _ in self._brute(emb_tbl, q, 10)}
        df = ivf_topk(emb_ds, q, k=10, n_centroids=8, n_probe=4).to_pandas()
        got_ids = set(df["vec_id"].tolist())
        assert len(got_ids & truth_ids) >= 3
        assert emb_tbl.column("vec_id")[7].as_py() in got_ids
        # determinism: same seed → same result
        df2 = ivf_topk(emb_ds, q, k=10, n_centroids=8, n_probe=4).to_pandas()
        assert df.equals(df2)

    def test_ivf_build_query(self, ray_session, emb_ds, emb_tbl, tmp_path):
        """Partitioned IVF index: full-probe query == exact baseline
        (same float formula); subset probe reads only probed cell dirs."""
        import os

        from lmss_entity_extractor_ray.ops.similarity import ivf_build, ivf_query

        idx = str(tmp_path / "ivf")
        cents = ivf_build(emb_ds, idx, n_centroids=8)
        assert cents.shape[0] == 8 and os.path.exists(idx + "/centroids.npy")
        cell_dirs = [d for d in os.listdir(idx) if d.startswith("ivf_cell=")]
        assert 1 < len(cell_dirs) <= 8

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        df = ivf_query(idx, q, k=10, n_probe=8).to_pandas()
        got = list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist()))
        assert got == self._brute(emb_tbl, q, 10)

        truth_ids = {i for i, _ in self._brute(emb_tbl, q, 10)}
        df_sub = ivf_query(idx, q, k=10, n_probe=2).to_pandas()
        got_ids = set(df_sub["vec_id"].tolist())
        assert len(got_ids & truth_ids) >= 3
        assert emb_tbl.column("vec_id")[7].as_py() in got_ids

    def test_lsh_full_radius_equals_bruteforce(self, ray_session, emb_ds, emb_tbl):
        """A Hamming ball of radius n_planes covers every bucket, so the
        radius-expansion path must degenerate to the exact answer."""
        from lmss_entity_extractor_ray.ops.similarity import lsh_topk

        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        df = lsh_topk(emb_ds, q, k=10, n_planes=5, hamming_radius=5).to_pandas()
        got = list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist()))
        assert got == self._brute(emb_tbl, q, 10)

    def test_ivf_append_rolling_ingest(self, ray_session, emb_ds, emb_tbl, tmp_path):
        """Incremental add into the persisted index: appended vectors join
        the existing hive cells as new files (no clobbering), and a
        full-probe query equals the exact baseline over the UNION — a
        lost, duplicated or mis-assigned appended row breaks it."""
        import glob
        import os

        import pyarrow as pa
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.similarity import (
            emb_np,
            ivf_append,
            ivf_build,
            ivf_query,
        )

        idx = str(tmp_path / "ivf_roll")
        ivf_build(emb_ds, idx, n_centroids=8)
        files_before = set(glob.glob(os.path.join(idx, "ivf_cell=*", "*.parquet")))

        OFF = 10_000

        def negate(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mat = -emb_np(b)
            n, d = mat.shape
            neg = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * d),
                pa.array(mat.reshape(-1).astype(np.float32), pa.float32()),
            )
            return pa.table(
                {"vec_id": pc.add(b.column("vec_id"), OFF), "embedding": neg}
            )

        n_added = ivf_append(idx, emb_ds.map_batches(negate, batch_format="pyarrow"))
        assert n_added == emb_tbl.num_rows
        files_after = set(glob.glob(os.path.join(idx, "ivf_cell=*", "*.parquet")))
        assert files_before < files_after  # strictly additive

        # exact union baseline: base vectors + negated/offset vectors
        q = np.array(emb_tbl.column("embedding")[7].as_py(), dtype=np.float64)
        ids = np.asarray(emb_tbl.column("vec_id"), dtype=np.int64)
        mat = emb_np(emb_tbl)
        u_ids = np.concatenate([ids, ids + OFF])
        u_mat = np.concatenate([mat, -mat.astype(np.float32).astype(np.float64)])
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(u_mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (u_mat / norms[:, None]) @ qn
        e5 = np.floor(cos * 100_000 + 0.5).astype(np.int64)
        order = np.lexsort((u_ids, -e5))[:10]
        expect = list(zip(u_ids[order].tolist(), e5[order].tolist()))

        df = ivf_query(idx, q, k=10, n_probe=8).to_pandas()
        assert list(zip(df["vec_id"].tolist(), df["cos_e5"].tolist())) == expect


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

class TestSampling:
    def test_hash_sample_deterministic_and_fractional(self, ray_session, docs_ds, docs_tbl):
        from lmss_entity_extractor_ray.ops.sampling import hash_sample

        a = hash_sample(docs_ds, "doc_id", 0.1).to_pandas()
        b = hash_sample(docs_ds, "doc_id", 0.1).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # reproducible
        n = docs_tbl.num_rows
        assert 0.02 * n < len(a) < 0.25 * n  # ~10% (hash variance at n=500)
        # superset property: a 20% sample with the same salt contains the 10%
        c = hash_sample(docs_ds, "doc_id", 0.2).to_pandas()
        assert set(a["doc_id"]) <= set(c["doc_id"])

    def test_hash_sample_salt_changes_selection(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.sampling import hash_sample

        a = set(hash_sample(docs_ds, "doc_id", 0.1, salt=0).to_pandas()["doc_id"])
        b = set(hash_sample(docs_ds, "doc_id", 0.1, salt=7).to_pandas()["doc_id"])
        assert a != b

    def test_reservoir_sample_size_and_determinism(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.sampling import reservoir_sample

        s1 = reservoir_sample(docs_ds, 25, seed=9)
        s2 = reservoir_sample(docs_ds, 25, seed=9)
        assert s1.num_rows == 25
        assert sorted(s1.column("doc_id").to_pylist()) == sorted(s2.column("doc_id").to_pylist())
        ids = s1.column("doc_id").to_pylist()
        assert len(set(ids)) == 25  # without replacement
        # different seed → different sample
        s3 = reservoir_sample(docs_ds, 25, seed=10)
        assert sorted(ids) != sorted(s3.column("doc_id").to_pylist())

    def test_reservoir_sample_uniform_and_layout_independent(self, ray_session):
        """Round-1 bug regression: per-block RNG seeded only by block shape
        gave rows in equal-shaped blocks zero inclusion probability at most
        positions.  The bottom-k formulation must (a) be independent of the
        block layout, (b) spread a sample statistically uniformly across
        equal-size key strata."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.sampling import reservoir_sample

        tbl = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        s = reservoir_sample(rd.from_arrow(tbl), 200, seed=3)
        ids = s.column("doc_id").to_pylist()
        assert len(ids) == 200 and len(set(ids)) == 200
        # layout independence: a different partitioning yields the same rows
        s2 = reservoir_sample(rd.from_arrow(tbl).repartition(7), 200, seed=3)
        assert sorted(ids) == sorted(s2.column("doc_id").to_pylist())
        # chi-square over 20 equal strata of 100 consecutive ids
        counts = np.zeros(20)
        for i in ids:
            counts[i // 100] += 1
        chi2 = float(((counts - 10.0) ** 2 / 10.0).sum())
        assert chi2 < 43.82  # df=19, p=0.001
        assert (counts > 0).all()  # every stratum reachable


# ---------------------------------------------------------------------------
# windowed aggregate
# ---------------------------------------------------------------------------

class TestWindows:
    def test_tumbling_window_vs_pandas(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.windows import tumbling_window_agg

        tbl = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
        got = tumbling_window_agg(rd.from_arrow(tbl)).to_pandas()
        pdf = tbl.to_pandas()
        pdf["window_start"] = pdf["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        exp = (
            pdf.groupby(["window_start", "event_type"])["value"]
            .agg(["count", "sum"])
            .reset_index()
        )
        merged = got.merge(exp, on=["window_start", "event_type"], how="outer")
        assert len(merged) == len(got) == len(exp)
        assert (merged["n"] == merged["count"]).all()
        assert (
            merged["sum_value_c2"] == np.floor(merged["sum"] * 100 + 0.5).astype(np.int64)
        ).all()

    def test_sessionize_vs_pandas(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.windows import sessionize

        tbl = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
        )
        got = (
            sessionize(rd.from_arrow(tbl).repartition(6), num_partitions=4)
            .to_pandas()
            .sort_values(["user_id", "session_no"])
            .reset_index(drop=True)
        )
        pdf = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        pdf["ts_us"] = pdf["ts"].astype("int64")
        gap = pdf.groupby("user_id")["ts_us"].diff()
        pdf["brk"] = ((gap > 1_800_000_000) & gap.notna()).astype("int64")
        pdf["session_no"] = pdf.groupby("user_id")["brk"].cumsum()
        pdf["v_c2"] = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
        exp = (
            pdf.groupby(["user_id", "session_no"])
            .agg(
                n_events=("ts_us", "size"),
                start_us=("ts_us", "min"),
                end_us=("ts_us", "max"),
                vsum_c2=("v_c2", "sum"),
            )
            .reset_index()
            .sort_values(["user_id", "session_no"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        for c in ("user_id", "session_no", "n_events", "start_us", "end_us", "vsum_c2"):
            assert (got[c].values == exp[c].values).all(), c

    def test_sessionize_golden(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.windows import sessionize

        us = 10**6
        # user 1: three events 0s, 10s, 2000s (gap 1990s > 30min? no — use
        # big gaps); user 2: single event
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array(
                    [0, 10 * us, 10 * us + 1_800_000_001, 10 * us + 1_800_000_002, 0],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            }
        )
        got = (
            sessionize(rd.from_arrow(tbl))
            .to_pandas()
            .sort_values(["user_id", "session_no"])
            .reset_index(drop=True)
        )
        # user 1: events 1,2 in session 0; gap 1_800_000_001-10s... events 3,4
        # land 1800.000001s after event 2 -> new session (gap > 30 min)
        assert got["user_id"].tolist() == [1, 1, 2]
        assert got["session_no"].tolist() == [0, 1, 0]
        assert got["n_events"].tolist() == [2, 2, 1]
        assert got["vsum_c2"].tolist() == [300, 700, 500]

    def test_sliding_window_vs_pandas(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.windows import sliding_window_agg

        tbl = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
        got = sliding_window_agg(rd.from_arrow(tbl), size_hops=3).to_pandas()
        pdf = tbl.to_pandas()
        pdf["hop"] = pdf["ts"].dt.floor("h")
        frames = []
        for k in range(3):
            f = pdf.copy()
            f["window_start"] = (f["hop"] - pd.Timedelta(hours=k)).dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            frames.append(f)
        exp = (
            pd.concat(frames)
            .groupby(["window_start", "event_type"])["value"]
            .agg(["count", "sum"])
            .reset_index()
        )
        merged = got.merge(exp, on=["window_start", "event_type"], how="outer")
        assert len(merged) == len(got) == len(exp)
        assert (merged["n"] == merged["count"]).all()
        assert (
            merged["sum_value_c2"] == np.floor(merged["sum"] * 100 + 0.5).astype(np.int64)
        ).all()
        # every event lands in exactly size_hops windows
        assert got["n"].sum() == 3 * len(pdf)


# ---------------------------------------------------------------------------
# temporal ops: session windows + as-of join
# ---------------------------------------------------------------------------

class TestTemporal:
    def _events(self):
        import pyarrow.parquet as pq

        return pq.read_table(
            f"{SF}/events.parquet",
            columns=["ts", "user_id", "event_id", "event_type", "value"],
        )

    def test_session_windows_vs_pandas(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.temporal import session_window_stats

        tbl = self._events()
        got = (
            session_window_stats(rd.from_arrow(tbl), gap_minutes=30)
            .to_pandas()
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True)
        )
        df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        gap = 30 * 60 * 1_000_000
        new_s = (df["user_id"].ne(df["user_id"].shift())) | (
            df["ts_us"].diff() > gap
        )
        df["sid"] = new_s.cumsum()
        exp = (
            df.groupby(["user_id", "sid"])
            .agg(
                session_start_us=("ts_us", "min"),
                n_events=("event_id", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index()
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
        assert (
            got["session_start_us"].to_numpy() == exp["session_start_us"].to_numpy()
        ).all()
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
        assert (
            got["sum_value_c2"].to_numpy()
            == np.floor(exp["sum_value"].to_numpy() * 100 + 0.5).astype(np.int64)
        ).all()
        # every event lands in exactly one session
        assert got["n_events"].sum() == tbl.num_rows

    def test_asof_lag_vs_bruteforce(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.temporal import asof_lag

        tbl = self._events()
        got = (
            asof_lag(rd.from_arrow(tbl), left_type="click", right_type="purchase")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        df = tbl.to_pandas()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        purch: dict = {}
        for _, r in df[df["event_type"] == "purchase"].iterrows():
            purch.setdefault(int(r["user_id"]), []).append(int(r["ts_us"]))
        exp_rows = []
        for _, r in df[df["event_type"] == "click"].iterrows():
            cands = [
                t for t in purch.get(int(r["user_id"]), []) if t <= int(r["ts_us"])
            ]
            if cands:
                exp_rows.append((int(r["event_id"]), int(r["ts_us"]) - max(cands)))
        exp_rows.sort()
        assert list(zip(got["event_id"], got["asof_lag_us"])) == exp_rows

    def test_range_join_vs_bruteforce(self, ray_session):
        import itertools

        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.temporal import range_join_within

        tbl = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_orderkey"],
        )
        W = 7 * 86_400 * 1_000_000
        got = (
            range_join_within(rd.from_arrow(tbl), window_us=W)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        df = tbl.to_pandas()
        df["ts_us"] = df["o_orderdate"].astype("datetime64[us]").astype("int64")
        exp = []
        for _, grp in df.groupby("o_custkey"):
            recs = list(zip(grp["o_orderkey"], grp["ts_us"]))
            for (k1, t1), (k2, t2) in itertools.combinations(recs, 2):
                if abs(t1 - t2) <= W:
                    a, b = sorted((int(k1), int(k2)))
                    exp.append((a, b, abs(int(t1) - int(t2))))
        exp.sort()
        assert list(zip(got["a"], got["b"], got["diff_us"])) == exp
        assert len(exp) > 0  # the fixture actually exercises the op

    def test_asof_inclusive_tie_and_user_isolation(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.temporal import asof_lag

        ts = pa.array([1_000_000, 1_000_000, 2_000_000, 500_000], pa.timestamp("us"))
        tbl = pa.table(
            {
                "ts": ts,
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "event_id": pa.array([10, 11, 12, 13], pa.int64()),
                "event_type": pa.array(
                    ["click", "purchase", "click", "purchase"], pa.string()
                ),
            }
        )
        got = (
            asof_lag(rd.from_arrow(tbl))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # user 1: purchase at the SAME instant counts (inclusive >=);
        # user 2: a purchase from another user never leaks across entities
        assert list(zip(got["event_id"], got["asof_lag_us"])) == [
            (10, 0),
            (12, 1_500_000),
        ]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

class TestMultimodal:
    def test_decode_features(self, ray_session, docs_ds, docs_tbl):
        import hashlib

        from lmss_entity_extractor_ray.ops.multimodal import (
            decode_features,
            payloads_from_documents,
        )

        df = decode_features(payloads_from_documents(docs_ds)).to_pandas().set_index("item_id")
        texts = dict(zip(docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()))
        for i in list(texts)[:20]:
            raw = texts[i].encode("utf-8")
            assert df.loc[i, "payload_sha256"] == hashlib.sha256(raw).hexdigest()
            assert df.loc[i, "payload_bytes"] == len(raw)
            assert 64 <= df.loc[i, "width"] < 64 + 1024

    def test_resize_truncates_payload(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.multimodal import payloads_from_documents, resize_payloads

        df = resize_payloads(payloads_from_documents(docs_ds), ).limit(5).to_pandas()
        assert all(len(p) <= (1 << 16) for p in df["payload"])
        assert set(df.columns) == {"item_id", "payload", "media_type"}

    def test_frame_sample_fanout(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.multimodal import payloads_from_documents, sample_frames

        src = payloads_from_documents(docs_ds)
        n_in = src.count()
        out = sample_frames(src, n_frames=4)
        df = out.to_pandas()
        assert len(df) == 4 * n_in
        assert set(df["frame"]) == {0, 1, 2, 3}

    def test_exact_dedup_fulltext(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_dedup_fulltext

        tbl = pa.table(
            {
                "doc_id": pa.array([9, 2, 5], pa.int64()),
                "text": pa.array(["same text", "same text", "other"], pa.string()),
            }
        )
        df = exact_dedup_fulltext(rd.from_arrow(tbl)).to_pandas().set_index("text")
        assert df.loc["same text", "keep_id"] == 2 and df.loc["same text", "n_dups"] == 2
        assert df.loc["other", "n_dups"] == 1

    def test_real_decode_seam_raises(self):
        from lmss_entity_extractor_ray.ops.multimodal import real_decode

        with pytest.raises(NotImplementedError):
            real_decode(b"x", "image/png")


# ---------------------------------------------------------------------------
# relational coverage vs DuckDB
# ---------------------------------------------------------------------------

class TestRelationalVsDuckDB:
    @pytest.fixture(scope="class")
    def con(self):
        import duckdb

        con = duckdb.connect()
        for t in "customer supplier part orders lineitem events nation".split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        return con

    def _cmp(self, ds, sql, con):
        import pandas as pd

        a = ds.to_pandas()
        b = con.sql(sql).df()
        a = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_pricing_summary(self, ray_session, con):
        import ray.data as rd

        import __ray_entry__ as e

        self._cmp(e.queries()["pricing_summary"](SF), e.oracle_sql()["pricing_summary"], con)

    def test_top_customers(self, ray_session, con):
        import __ray_entry__ as e

        self._cmp(e.queries()["top_customers"](SF), e.oracle_sql()["top_customers"], con)

    def test_events_by_type(self, ray_session, con):
        import __ray_entry__ as e

        self._cmp(e.queries()["events_by_type"](SF), e.oracle_sql()["events_by_type"], con)

    def test_supplier_balance(self, ray_session, con):
        import __ray_entry__ as e

        self._cmp(
            e.queries()["supplier_balance_by_nation"](SF),
            e.oracle_sql()["supplier_balance_by_nation"],
            con,
        )

    def test_kg_triples_value_oracle(self, ray_session, con):
        """Flagship dual-read oracle in CI: the sf0.001 triples re-derived
        by SQL from the dumped mention + vocab tables must match the Ray
        output value-for-value (oracle_sql templates the /tmp paths per sf)."""
        import __ray_entry__ as e

        sqls = e.oracle_sql("sf0.001")
        self._cmp(e.queries()["kg_triples"](SF), sqls["kg_triples"], con)
        self._cmp(
            e.queries()["kg_triples_dedup_backstop"](SF),
            sqls["kg_triples_dedup_backstop"],
            con,
        )

    def test_minhash_value_oracle(self, ray_session, con):
        """MinHash dual-read oracle in CI: SQL recomputes the exact
        word-shingle Jaccard over the written candidate pairs."""
        import duckdb

        import __ray_entry__ as e

        con2 = duckdb.connect()
        con2.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        self._cmp(
            e.queries()["minhash_near_dup"](SF),
            e.oracle_sql("sf0.001")["minhash_near_dup"],
            con2,
        )


# ---------------------------------------------------------------------------
# graph (dup clusters) + grouped top-k
# ---------------------------------------------------------------------------

class TestGraph:
    def _pairs(self):
        import ray.data as rd

        # chain 1-2-3-4, chain 10-11-12, star 20-{21,22,23}, pair 30-31
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([1, 2, 3, 10, 11, 20, 20, 20, 30], pa.int64()),
                    "b": pa.array([2, 3, 4, 11, 12, 21, 22, 23, 31], pa.int64()),
                }
            )
        )

    def test_connected_components(self, ray_session):
        from lmss_entity_extractor_ray.ops.graph import connected_components

        expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                  20: 20, 21: 20, 22: 20, 23: 20, 30: 30, 31: 30}
        # small-graph single-task path (the default at this size)
        df = connected_components(self._pairs(), num_partitions=4).to_pandas()
        assert dict(zip(df["doc_id"], df["cluster_id"])) == expect
        # BSP path forced — must agree exactly
        df2 = connected_components(
            self._pairs(), num_partitions=4, small_graph_limit=0
        ).to_pandas()
        assert dict(zip(df2["doc_id"], df2["cluster_id"])) == expect

    def test_cc_single_partition_and_empty(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import connected_components

        df = connected_components(self._pairs(), num_partitions=2).to_pandas()
        assert dict(zip(df["doc_id"], df["cluster_id"]))[4] == 1
        empty = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
        assert connected_components(empty).count() == 0

    def test_cc_vs_networkx_style_union_find(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import connected_components

        rng = np.random.RandomState(7)
        a = rng.randint(0, 200, 300).astype("int64")
        b = rng.randint(0, 200, 300).astype("int64")
        keep = a != b
        a, b = a[keep], b[keep]
        pairs = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
        df = connected_components(pairs, num_partitions=5).to_pandas()
        got = dict(zip(df["doc_id"], df["cluster_id"]))
        df_bsp = connected_components(
            rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})),
            num_partitions=5, small_graph_limit=0,
        ).to_pandas()
        assert dict(zip(df_bsp["doc_id"], df_bsp["cluster_id"])) == got

        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        exp = {n: find(n) for n in set(a.tolist()) | set(b.tolist())}
        assert got == exp

    def test_keep_canonical(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import keep_canonical

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(list(range(35)), pa.int64())})
        )
        kept = sorted(keep_canonical(docs, self._pairs()).to_pandas()["doc_id"])
        dropped = sorted(set(range(35)) - set(kept))
        assert dropped == [2, 3, 4, 11, 12, 21, 22, 23, 31]


class TestBfsHops:
    def test_vs_bruteforce_and_bsp_parity(self, ray_session):
        import collections

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import bfs_hops

        rng = np.random.RandomState(17)
        src = rng.randint(0, 120, 400).astype("int64")
        dst = rng.randint(0, 120, 400).astype("int64")
        keep = src != dst
        src, dst = src[keep], dst[keep]
        # symmetrize for undirected reach
        s2 = np.concatenate([src, dst])
        d2 = np.concatenate([dst, src])
        seeds = [int(min(s2.min(), d2.min()))]
        K = 3

        def make():
            return rd.from_arrow(
                pa.table({"src": pa.array(s2), "dst": pa.array(d2)})
            ).repartition(5)

        got = bfs_hops(make(), seeds, iters=K).to_pandas()
        gmap = dict(zip(got["node"], got["dist"]))
        # brute force: K rounds of relaxation
        nodes = np.unique(np.concatenate([s2, d2]))
        dist = {int(v): -1 for v in nodes}
        dist[seeds[0]] = 0
        adj = collections.defaultdict(list)
        for a, b in zip(s2.tolist(), d2.tolist()):
            adj[a].append(b)
        for _ in range(K):
            nxt = dict(dist)
            for u, du in dist.items():
                if du >= 0:
                    for v in adj[u]:
                        if nxt[v] < 0 or du + 1 < nxt[v]:
                            nxt[v] = du + 1
            dist = nxt
        assert gmap == dist
        # BSP path must agree exactly
        bsp = bfs_hops(
            make(), seeds, iters=K, num_partitions=4, small_graph_limit=0
        ).to_pandas()
        assert dict(zip(bsp["node"], bsp["dist"])) == gmap

    def test_chain_cutoff(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import bfs_hops

        # directed chain 0->1->2->3->4->5, 3 iterations from 0
        e = rd.from_arrow(
            pa.table(
                {"src": pa.array([0, 1, 2, 3, 4], pa.int64()),
                 "dst": pa.array([1, 2, 3, 4, 5], pa.int64())}
            )
        )
        got = bfs_hops(e, [0], iters=3).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == {
            0: 0, 1: 1, 2: 2, 3: 3, 4: -1, 5: -1
        }


class TestTriangles:
    def test_vs_bruteforce(self, ray_session):
        import itertools

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import triangle_counts

        rng = np.random.RandomState(9)
        n_nodes = 40
        cand = [
            (i, j) for i in range(n_nodes) for j in range(i + 1, n_nodes)
        ]
        pick = rng.rand(len(cand)) < 0.2
        edges = [e for e, p in zip(cand, pick) if p]
        eset = set(edges)
        exp: dict = {}
        for x, y, z in itertools.combinations(range(n_nodes), 3):
            if (x, y) in eset and (x, z) in eset and (y, z) in eset:
                for v in (x, y, z):
                    exp[v] = exp.get(v, 0) + 1
        ds = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([e[0] for e in edges], pa.int64()),
                    "b": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ).repartition(4)
        got = triangle_counts(ds).to_pandas()
        assert dict(zip(got["node"], got["n_triangles"])) == exp

    def test_common_neighbor_scores_vs_bruteforce(self, ray_session):
        import itertools

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import common_neighbor_scores

        rng = np.random.RandomState(31)
        n_nodes = 30
        cand = [(i, j) for i in range(n_nodes) for j in range(i + 1, n_nodes)]
        pick = rng.rand(len(cand)) < 0.25
        edges = [e for e, p in zip(cand, pick) if p]
        adj = {v: set() for v in range(n_nodes)}
        for x, y in edges:
            adj[x].add(y)
            adj[y].add(x)
        exp = {}
        for u, v in itertools.combinations(range(n_nodes), 2):
            common = len(adj[u] & adj[v])
            if common >= 2:
                exp[(u, v)] = (
                    common,
                    common * 100000 // (len(adj[u]) + len(adj[v]) - common),
                )
        ds = rd.from_arrow(
            pa.table(
                {"a": pa.array([e[0] for e in edges], pa.int64()),
                 "b": pa.array([e[1] for e in edges], pa.int64())}
            )
        ).repartition(4)
        got = common_neighbor_scores(ds, num_partitions=3).to_pandas()
        got_map = {
            (u, v): (c, j)
            for u, v, c, j in zip(
                got["u"], got["v"], got["common"], got["jaccard_e5"]
            )
        }
        assert got_map == exp

    def test_hub_skew_star_plus_triangles(self, ray_session):
        """Zipf-hub shape (the docstring's 'hub-scale knob', now code): a
        hub with 500 leaves closes triangles only through two leaf-leaf
        edges.  Degree orientation makes the LEAVES generate the wedges
        (the hub is the highest-rank endpoint of every star edge), so the
        wedge population stays O(leaves) instead of the hub's O(500²) —
        and the counts must still be exact."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import triangle_counts

        hub_edges = [(0, i) for i in range(1, 501)]
        closers = [(1, 2), (3, 4)]           # close (0,1,2) and (0,3,4)
        disjoint = [(900, 901), (900, 902), (901, 902)]
        edges = hub_edges + closers + disjoint
        ds = rd.from_arrow(
            pa.table(
                {"a": pa.array([e[0] for e in edges], pa.int64()),
                 "b": pa.array([e[1] for e in edges], pa.int64())}
            )
        ).repartition(4)
        got = dict(
            zip(*(lambda d: (d["node"], d["n_triangles"]))(
                triangle_counts(ds, num_partitions=4).to_pandas()
            ))
        )
        assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1, 900: 1, 901: 1, 902: 1}

    def test_string_keys_and_no_triangles(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import triangle_counts

        # square without diagonals: zero triangles -> empty result
        sq = rd.from_arrow(
            pa.table(
                {"a": pa.array(["a", "a", "b", "c"]),
                 "b": pa.array(["b", "c", "d", "d"])}
            )
        )
        assert triangle_counts(sq).count() == 0
        # one closed triangle on string keys
        tri = rd.from_arrow(
            pa.table({"a": pa.array(["x", "x", "y"]), "b": pa.array(["y", "z", "z"])})
        )
        got = triangle_counts(tri).to_pandas()
        assert dict(zip(got["node"], got["n_triangles"])) == {"x": 1, "y": 1, "z": 1}


class TestCrossCorpusNearDup:
    def test_cross_only_pairs(self, ray_session):
        """Only (A, B) pairs come back — within-side near-dups are
        excluded, b carries its ORIGINAL id, and values equal the exact
        Jaccard the self-join would report."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import cross_ngram_jaccard_pairs

        text = "alpha beta gamma delta epsilon zeta"
        a = pa.table(
            {"doc_id": pa.array([0, 2, 4], pa.int64()),
             "text": pa.array([text, text, "totally different words here now"],
                              pa.string())}
        )
        b = pa.table(
            {"doc_id": pa.array([1, 3], pa.int64()),
             "text": pa.array([text, "another unrelated string of tokens x"],
                              pa.string())}
        )
        got = cross_ngram_jaccard_pairs(
            rd.from_arrow(a), rd.from_arrow(b), threshold=0.5
        ).to_pandas()
        pairs = set(zip(got["a"], got["b"]))
        # A-side 0 and 2 each match B-side 1 at J=1.0; the within-A pair
        # (0, 2) must NOT appear even though it is also J=1.0
        assert pairs == {(0, 1), (2, 1)}
        assert set(got["jaccard_e5"]) == {100_000}


class TestKeepBestInCluster:
    def test_longest_wins_not_min_id(self, ray_session):
        """The score winner differs from the min-id canonical: cluster
        {1,2,3} keeps 2 (highest score); ties break to the smaller id;
        unpaired docs always survive."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import (
            keep_best_in_cluster,
            keep_canonical,
        )

        docs = pa.table(
            {"doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
             "n_chars": pa.array([10, 99, 50, 7, 7, 42], pa.int64())}
        )
        pairs = pa.table(
            {"a": pa.array([1, 2, 4], pa.int64()),
             "b": pa.array([2, 3, 5], pa.int64())}
        )
        kept = keep_best_in_cluster(
            rd.from_arrow(docs), rd.from_arrow(pairs), score_col="n_chars"
        ).to_pandas()
        # cluster {1,2,3} -> 2 (score 99); cluster {4,5} -> 4 (tie, min id);
        # 6 unpaired
        assert sorted(kept["doc_id"]) == [2, 4, 6]
        # min-id policy keeps 1 instead — the two policies genuinely differ
        mincan = keep_canonical(
            rd.from_arrow(docs), rd.from_arrow(pairs)
        ).to_pandas()
        assert sorted(mincan["doc_id"]) == [1, 4, 6]

    def test_empty_pairs_keeps_all(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import keep_best_in_cluster

        docs = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "n_chars": pa.array([5, 6], pa.int64())}
        )
        pairs = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        kept = keep_best_in_cluster(
            rd.from_arrow(docs), rd.from_arrow(pairs), score_col="n_chars"
        ).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2]


class TestKCore:
    @staticmethod
    def _brute_peel(edges, k, rounds):
        """Reference Jacobi peel: remove ALL remaining degree<k nodes each
        round simultaneously."""
        nodes = sorted({v for e in edges for v in e})
        removed = {}
        remaining = set(nodes)
        for r in range(1, rounds + 1):
            deg = {v: 0 for v in remaining}
            for x, y in edges:
                if x in remaining and y in remaining:
                    deg[x] += 1
                    deg[y] += 1
            peel = {v for v in remaining if deg[v] < k}
            if not peel:
                break
            for v in peel:
                removed[v] = r
            remaining -= peel
        return {v: removed.get(v, -1) for v in nodes}

    def test_cycle_with_tail(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import kcore_peel

        # C4 (survives k=2) + path tail 0-4-5-6 peeling one node per round
        edges = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 4), (4, 5), (5, 6)]
        t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                      "b": pa.array([e[1] for e in edges], pa.int64())})
        got = kcore_peel(rd.from_arrow(t), k=2, rounds=4).to_pandas()
        assert dict(zip(got["node"], got["removed_round"])) == {
            0: -1, 1: -1, 2: -1, 3: -1, 4: 3, 5: 2, 6: 1}

    def test_vs_bruteforce_random(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import kcore_peel

        rng = np.random.RandomState(23)
        n_nodes = 60
        cand = [(i, j) for i in range(n_nodes) for j in range(i + 1, n_nodes)]
        pick = rng.rand(len(cand)) < 0.06
        edges = [e for e, p in zip(cand, pick) if p]
        ds = rd.from_arrow(
            pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                      "b": pa.array([e[1] for e in edges], pa.int64())})
        ).repartition(4)
        for k, rounds in ((2, 3), (3, 4), (4, 6)):
            got = kcore_peel(ds, k=k, rounds=rounds).to_pandas()
            assert (
                dict(zip(got["node"], got["removed_round"]))
                == self._brute_peel(edges, k, rounds)
            ), (k, rounds)

    def test_string_nodes_and_bounded_rounds(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import kcore_peel

        # path a-b-c with rounds=1: only the endpoints peel (round bound)
        t = pa.table({"a": pa.array(["a", "b"]), "b": pa.array(["b", "c"])})
        got = kcore_peel(rd.from_arrow(t), k=2, rounds=1).to_pandas()
        assert dict(zip(got["node"], got["removed_round"])) == {
            "a": 1, "b": -1, "c": 1}


class TestPageRank:
    def _random_edges(self, seed=3, n_nodes=150, n_edges=600):
        rng = np.random.RandomState(seed)
        src = rng.randint(0, n_nodes, n_edges).astype("int64")
        dst = rng.randint(0, n_nodes, n_edges).astype("int64")
        keep = src != dst
        return src[keep], dst[keep]

    def test_small_vs_bsp_bit_exact(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import pagerank

        src, dst = self._random_edges()
        edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        a = pagerank(edges, iters=5).to_pandas()
        b = pagerank(
            rd.from_arrow(
                pa.table({"src": pa.array(src), "dst": pa.array(dst)})
            ).repartition(7),
            iters=5,
            num_partitions=4,
            small_graph_limit=0,
        ).to_pandas()
        ga = dict(zip(a["node"], a["rank_q"]))
        gb = dict(zip(b["node"], b["rank_q"]))
        assert ga == gb  # BSP must agree with the single-task path bit-exactly

    def test_warm_start_equals_cold_continuation(self, ray_session):
        """Warm-starting k iterations from a j-iteration checkpoint over
        the same graph must be bit-identical to a cold j+k run — on BOTH
        the single-task and the BSP path; a node absent from the
        checkpoint (incremental-graph delta) falls back to the cold r_0."""
        import pyarrow as pa
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import (
            _init_ranks_for,
            _iterate_local,
            pagerank,
        )

        src, dst = self._random_edges(seed=11)
        edges = rd.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ).materialize()
        cold5 = pagerank(edges, iters=5).to_pandas()
        ckpt = pagerank(edges, iters=3).to_pandas()
        ckpt_tbl = pa.table(
            {"node": pa.array(ckpt["node"].to_numpy(), pa.int64()),
             "rank_q": pa.array(ckpt["rank_q"].to_numpy(), pa.int64())}
        )
        warm = pagerank(edges, iters=2, init_ranks=ckpt_tbl).to_pandas()
        assert dict(zip(warm["node"], warm["rank_q"])) == dict(
            zip(cold5["node"], cold5["rank_q"])
        )
        warm_bsp = pagerank(
            edges, iters=2, init_ranks=ckpt_tbl,
            num_partitions=4, small_graph_limit=0,
        ).to_pandas()
        assert dict(zip(warm_bsp["node"], warm_bsp["rank_q"])) == dict(
            zip(cold5["node"], cold5["rank_q"])
        )

        # delta node 999 unseen by the checkpoint: expected = reference
        # iteration seeded by the documented lookup rule
        src2 = np.concatenate([src, [999]])
        dst2 = np.concatenate([dst, [0]])
        edges2 = rd.from_arrow(
            pa.table({"src": pa.array(src2), "dst": pa.array(dst2)})
        )
        got = pagerank(edges2, iters=2, init_ranks=ckpt_tbl).to_pandas()
        nodes2 = np.unique(np.concatenate([src2, dst2]))
        r0 = _init_ranks_for(nodes2, ckpt_tbl, len(nodes2), 10**12)
        exp = _iterate_local(src2, dst2, nodes2, 2, 10**12, 85, 100, r0=r0)
        assert dict(zip(got["node"], got["rank_q"])) == dict(
            zip(nodes2.tolist(), exp.tolist())
        )

    def test_matches_float_reference(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import pagerank

        src, dst = self._random_edges(seed=11)
        edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        got = pagerank(edges, iters=20).to_pandas()
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        outdeg = np.bincount(si, minlength=n).astype(float)
        r = np.full(n, 1.0 / n)
        for _ in range(20):
            contrib = np.zeros(n)
            np.add.at(contrib, di, (r / np.maximum(outdeg, 1.0))[si])
            r = 0.15 / n + 0.85 * contrib
        ref = dict(zip(nodes.tolist(), r))
        for node, rq in zip(got["node"], got["rank_q"]):
            # quantization error accumulates ~iters * nodes / scale — tiny
            assert abs(rq / 1e12 - ref[node]) < 1e-6

    def test_hub_ranks_highest_and_dangling(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import pagerank

        # star: spokes 1..5 -> hub 0 (hub is a sink: dangling mass dropped)
        src = pa.array([1, 2, 3, 4, 5], pa.int64())
        dst = pa.array([0, 0, 0, 0, 0], pa.int64())
        df = pagerank(
            rd.from_arrow(pa.table({"src": src, "dst": dst})), iters=5
        ).to_pandas()
        ranks = dict(zip(df["node"], df["rank_q"]))
        assert ranks[0] > ranks[1]
        assert len({ranks[i] for i in range(1, 6)}) == 1  # spokes identical

    def test_empty_edges(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import pagerank

        empty = rd.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        assert pagerank(empty).count() == 0

    def test_weighted_small_vs_bsp_and_unit_weight_equivalence(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.pagerank import pagerank

        src, dst = self._random_edges(seed=23)
        rng = np.random.RandomState(5)
        w = rng.randint(1, 40, len(src)).astype("int64")

        def edges(weights):
            return rd.from_arrow(
                pa.table(
                    {"src": pa.array(src), "dst": pa.array(dst),
                     "w": pa.array(weights)}
                )
            )

        a = pagerank(edges(w), weight="w", iters=5).to_pandas()
        b = pagerank(
            edges(w).repartition(6), weight="w", iters=5,
            num_partitions=4, small_graph_limit=0,
        ).to_pandas()
        assert dict(zip(a["node"], a["rank_q"])) == dict(zip(b["node"], b["rank_q"]))
        # weight = 1 everywhere must reduce to the unweighted recurrence
        ones = np.ones(len(src), dtype="int64")
        u = pagerank(edges(ones), weight="w", iters=5).to_pandas()
        plain = pagerank(edges(ones), iters=5).to_pandas()
        assert dict(zip(u["node"], u["rank_q"])) == dict(
            zip(plain["node"], plain["rank_q"])
        )
        # heavier in-edges raise rank: two sources feeding v=0 vs v=1
        src2 = pa.array([2, 3, 2, 3], pa.int64())
        dst2 = pa.array([0, 0, 1, 1], pa.int64())
        w2 = pa.array([9, 9, 1, 1], pa.int64())
        df = pagerank(
            rd.from_arrow(pa.table({"src": src2, "dst": dst2, "w": w2})),
            weight="w", iters=5,
        ).to_pandas()
        r = dict(zip(df["node"], df["rank_q"]))
        assert r[0] > r[1]


class TestTopK:
    def test_group_topk_vs_pandas(self, ray_session):
        import pandas as pd

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.topk import group_topk

        rng = np.random.RandomState(0)
        n = 4000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 29, n).astype("int64")),
                "val": pa.array(rng.rand(n)),
                "id": pa.array(np.arange(n, dtype="int64")),
            }
        )
        got = (
            group_topk(rd.from_arrow(t).repartition(8), "k", "val", "id", 3)
            .to_pandas()
            .sort_values(["k", "rn"])
            .reset_index(drop=True)[["k", "val", "id", "rn"]]
        )
        df = t.to_pandas().sort_values(["k", "val", "id"], ascending=[True, False, True])
        df["rn"] = df.groupby("k").cumcount() + 1
        exp = (
            df[df.rn <= 3]
            .sort_values(["k", "rn"])
            .reset_index(drop=True)[["k", "val", "id", "rn"]]
        )
        exp["rn"] = exp["rn"].astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    def test_stratified_sample_deterministic_and_layout_independent(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.topk import stratified_sample

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(1000, dtype="int64")),
                "lang": pa.array([["en", "de", "fr", "it"][i % 4] for i in range(1000)]),
            }
        )
        a = (
            stratified_sample(rd.from_arrow(t).repartition(2), "lang", 7)
            .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
        )
        b = (
            stratified_sample(rd.from_arrow(t).repartition(13), "lang", 7)
            .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
        )
        assert a.equals(b)
        assert (a.groupby("lang").size() == 7).all()


class TestPrefixKeyArrow:
    def test_parity_with_python_split(self, ray_session):
        from lmss_entity_extractor_ray.ops.dedup import _prefix_key_arrow, prefix_key

        cases = [
            "a b c d e f g", "  leading  spaces ", "", "one",
            "tab\tsep\nnl  x y z w", " \t ", "a " * 100,
            "nb sp unicode ws", " thin space test x y z",
        ]
        col = pa.chunked_array([pa.array(cases)])
        got = _prefix_key_arrow(col, 5).to_pylist()
        assert got == [prefix_key(c, 5) for c in cases]


class TestCuration:
    def test_wordish_token_counts(self, docs_ds, docs_tbl, ray_session):
        import re

        from lmss_entity_extractor_ray.ops.text_ops import wordish_token_counts

        df = wordish_token_counts(docs_ds).to_pandas()
        got = dict(zip(df["doc_id"], df["n_tokens_bpe"]))
        pat = re.compile(r"[0-9A-Za-z_]+|[^0-9A-Za-z_\s]", re.ASCII)
        for i, t in zip(
            docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()
        ):
            assert got[i] == len(pat.findall(t or "")), i

    def test_curate_end_to_end_vs_duckdb(self, ray_session):
        import duckdb

        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.curate import curate

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
        got = (
            curate(docs)
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as e

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        exp = (
            con.sql(e.oracle_sql()["curation_pipeline"])
            .df()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["lang"].tolist() == exp["lang"].tolist()


class TestJoinStatsTfidf:
    def test_hash_join_vs_duckdb(self, ray_session):
        import duckdb
        import pandas as pd

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.join import hash_join

        orders = rd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey", "o_totalprice"])
        cust = rd.read_parquet(f"{SF}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        got = (
            hash_join(orders, cust, on="o_custkey", right_on="c_custkey")
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
                FROM '{SF}/orders.parquet' o JOIN '{SF}/customer.parquet' c
                ON o.o_custkey = c.c_custkey ORDER BY o_orderkey"""
        ).df()
        pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)

    def test_hash_join_outer_and_empty(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.join import hash_join

        l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                                    "x": pa.array([10, 20, 30, 40], pa.int64())}))
        r = rd.from_arrow(pa.table({"k": pa.array([2, 4, 9], pa.int64()),
                                    "y": pa.array([200, 400, 900], pa.int64())}))
        lo = hash_join(l, r, on="k", how="left outer").to_pandas().sort_values("k")
        assert lo["k"].tolist() == [1, 2, 3, 4]
        assert lo["y"].fillna(-1).tolist() == [-1, 200, -1, 400]
        er = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                     "y": pa.array([], pa.int64())}))
        assert hash_join(l, er, on="k").count() == 0

    def test_grouped_quantiles_vs_duckdb(self, ray_session):
        import duckdb
        import pandas as pd

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.stats import grouped_quantiles

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
        got = (
            grouped_quantiles(docs.repartition(7), "lang", "n_chars")
            .to_pandas().sort_values("lang").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""SELECT lang, quantile_disc(n_chars, 0.25) q25,
                       quantile_disc(n_chars, 0.5) q50,
                       quantile_disc(n_chars, 0.9) q90
                FROM '{SF}/documents.parquet' GROUP BY lang ORDER BY lang"""
        ).df().astype({"q25": "int64", "q50": "int64", "q90": "int64"})
        pd.testing.assert_frame_equal(got, exp)

    def test_tfidf_topk_vs_duckdb(self, ray_session):
        import duckdb
        import pandas as pd

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.tfidf import tfidf_topk

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            tfidf_topk(docs.repartition(5), k=5)
            .to_pandas().sort_values(["doc_id", "rn"]).reset_index(drop=True)
            .astype({"rn": "int64"})
        )
        exp = duckdb.sql(
            rf"""WITH toks AS (
                    SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                                       x -> x <> '') AS t
                    FROM '{SF}/documents.parquet'),
                tf AS (SELECT doc_id, term, count(*) AS tfv
                       FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
                df AS (SELECT term, count(*) AS dfv FROM tf GROUP BY term)
                SELECT doc_id, term,
                       CAST(floor(tfv * 1.0 / dfv * 100000 + 0.5) AS BIGINT) AS tfidf_e5, rn
                FROM (SELECT tf.doc_id, tf.term, tf.tfv, df.dfv,
                             row_number() OVER (PARTITION BY tf.doc_id
                                 ORDER BY tf.tfv * 1.0 / df.dfv DESC, tf.term) AS rn
                      FROM tf JOIN df USING (term)) x
                WHERE rn <= 5 ORDER BY doc_id, rn"""
        ).df().astype({"rn": "int64", "tfidf_e5": "int64"})
        pd.testing.assert_frame_equal(got, exp)


class TestJoinVariants:
    def test_semi_and_anti(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.join import hash_join

        l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                                    "x": pa.array([1, 2, 3, 4, 5], pa.int64())}))
        r = rd.from_arrow(pa.table({"k": pa.array([2, 4, 4], pa.int64())}))
        semi = sorted(hash_join(l, r, on="k", how="left semi").to_pandas()["k"])
        anti = sorted(hash_join(l, r, on="k", how="left anti").to_pandas()["k"])
        assert semi == [2, 4]
        assert anti == [1, 3, 5]


class TestChunking:
    def test_chunk_documents_edges(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.chunking import chunk_documents

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", None, "one two three", " ".join(f"w{i}" for i in range(130))]),
            }
        )
        df = chunk_documents(rd.from_arrow(t), 64).to_pandas().sort_values(["doc_id", "chunk_id"])
        assert df[df.doc_id == 3]["chunk"].tolist() == ["one two three"]
        d4 = df[df.doc_id == 4]
        assert d4["n_tokens"].tolist() == [64, 64, 2]
        assert d4["chunk"].iloc[2] == "w128 w129"
        assert set(df["doc_id"]) == {3, 4}  # empty/null docs emit no chunks


class TestPrefixScan:
    def test_ordered_cumsum_vs_sequential(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.prefix import ordered_cumsum

        rng = np.random.RandomState(3)
        t = pa.table(
            {
                "k": pa.array(rng.permutation(500).astype("int64")),
                "v": pa.array(rng.randint(1, 9, 500).astype("int64")),
            }
        )
        df = (
            ordered_cumsum(rd.from_arrow(t).repartition(7), ["k"], "v")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        exp = df["v"].cumsum().shift(1).fillna(0).astype("int64")
        assert df["cum_before"].tolist() == exp.tolist()

    def test_pack_sequences_layout_independent(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.prefix import pack_sequences

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        a = pack_sequences(docs.repartition(2), 256, 64).to_pandas().sort_values("seq_id").reset_index(drop=True)
        b = pack_sequences(docs.repartition(9), 256, 64).to_pandas().sort_values("seq_id").reset_index(drop=True)
        assert a.equals(b)
        # every full sequence carries exactly seq_tokens... tokens per seq
        # bounded by construction: cum-based assignment puts <= 256+63 tokens
        assert (a["sum_tokens"] <= 256 + 63).all()


class TestRunningSum:
    def test_running_sum_vs_duckdb(self, ray_session):
        import duckdb

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.temporal import running_sum

        ev = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "user_id", "event_id", "value"])
        got = running_sum(ev).to_pandas().sort_values("event_id").reset_index(drop=True)
        exp = duckdb.sql(
            f"""SELECT event_id,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c2
                FROM '{SF}/events.parquet' ORDER BY event_id"""
        ).df()
        assert got["running_c2"].tolist() == exp["running_c2"].tolist()


class TestPartitioning:
    def test_shuffle_partitions_floor_and_ceiling(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.partitioning import (
            cluster_cpus,
            shuffle_partitions,
        )

        assert shuffle_partitions(None) == max(2, cluster_cpus())
        ds = rd.read_parquet(f"{SF}/documents.parquet")
        # small file: CPU floor wins
        assert shuffle_partitions(ds) == max(2, cluster_cpus())
        # huge scale factor forces the data ceiling above the floor
        assert shuffle_partitions(ds, scale=1e7) > max(2, cluster_cpus())


class TestTfidfJoinPath:
    def test_join_path_equals_broadcast_path(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.tfidf import tfidf_topk

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        a = (
            tfidf_topk(docs, k=5)
            .to_pandas().sort_values(["doc_id", "rn"]).reset_index(drop=True)
        )
        b = (
            tfidf_topk(docs, k=5, broadcast_vocab_limit=0)  # force the join path
            .to_pandas().sort_values(["doc_id", "rn"]).reset_index(drop=True)
        )
        assert a.equals(b)


class TestJoinStringKey:
    def test_string_key_join(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.join import hash_join

        l = rd.from_arrow(pa.table({"t": pa.array(["x", "y", "z", "y"]),
                                    "v": pa.array([1, 2, 3, 4], pa.int64())}))
        r = rd.from_arrow(pa.table({"t": pa.array(["y", "z", "w"]),
                                    "w": pa.array([20, 30, 40], pa.int64())}))
        df = hash_join(l, r, on="t").to_pandas().sort_values(["t", "v"])
        assert list(zip(df["t"], df["v"], df["w"])) == [("y", 2, 20), ("y", 4, 20), ("z", 3, 30)]


class TestChunkReassembly:
    def test_chunks_reassemble_to_token_stream(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.chunking import chunk_documents

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        df = (
            chunk_documents(docs, 32)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
        )
        joined = df.groupby("doc_id")["chunk"].agg(" ".join)
        import pyarrow.parquet as pq

        src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        for doc_id, text in zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist()):
            toks = (text or "").split()
            if toks:
                assert joined[doc_id] == " ".join(toks), doc_id
            else:
                assert doc_id not in joined.index


# ---------------------------------------------------------------------------
# round-3 advisor regressions
# ---------------------------------------------------------------------------

class TestAdviceRegressions:
    def test_embedding_near_dup_nonascending_blocks(self, ray_session, emb_tbl):
        """Off-diagonal pair tiles must not assume globally ascending vec_ids
        across blocks: reverse the row order (high ids land in early blocks)
        and the pair set must still equal brute force."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import embedding_near_dup_pairs

        rev = emb_tbl.take(list(range(emb_tbl.num_rows - 1, -1, -1)))
        ds = rd.from_arrow(rev).repartition(6)
        got = embedding_near_dup_pairs(ds, threshold=0.4).to_pandas()
        got_pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = unit @ unit.T
        truth = set()
        n = len(ids)
        for i in range(n):
            for j in range(n):
                if ids[i] < ids[j] and cos[i, j] >= 0.4:
                    truth.add((int(ids[i]), int(ids[j])))
        assert got_pairs == truth

    def test_minhash_short_docs_not_false_dups(self, ray_session):
        """Distinct sub-shingle_k-token docs must never pair; empty /
        whitespace-only docs are identical under normalization and pair at
        J=1.0 (the jaccard(∅,∅)=1 convention shared with the brute-force
        oracle)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import (
            brute_force_jaccard_pairs,
            near_dup_pairs_minhash,
        )

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "text": [
                    "alpha beta",        # sub-k, distinct
                    "gamma delta",       # sub-k, distinct
                    "",                  # empty
                    "   \t ",            # whitespace-only → no tokens
                    "alpha beta",        # exact dup of 1
                    "one two three four five",
                    "one two three four six",
                ],
            }
        )
        ds = rd.from_arrow(tbl).repartition(3)
        got = near_dup_pairs_minhash(ds, threshold=0.5, shingle_k=3).to_pandas()
        got_pairs = {
            (a, b, round(j, 5))
            for a, b, j in zip(got["a"], got["b"], got["jaccard"])
        }
        truth = set(brute_force_jaccard_pairs(tbl, 0.5, shingle_k=3))
        assert got_pairs == truth
        # explicitly: the two distinct 2-token docs are NOT a pair
        assert not any(a == 1 and b == 2 for a, b, _ in got_pairs)
        # and the empty/whitespace docs ARE (identical normalized text)
        assert (3, 4, 1.0) in got_pairs

    def test_combine_partials_empty_input_keeps_types(self, ray_session):
        """Zero-row partials must yield a correctly TYPED empty table (not
        null-typed columns that crash downstream sort/cast)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.combine import combine_partials, sort_table

        tbl = pa.table(
            {
                "k": pa.array([], pa.string()),
                "s": pa.array([], pa.int64()),
            }
        )
        ds = rd.from_arrow(tbl)
        out = combine_partials(ds, keys=["k"], aggs=[("s", "sum", "total")])
        assert out.num_rows == 0
        assert out.schema.field("k").type == pa.string()
        assert out.schema.field("total").type == pa.int64()
        # downstream sort on the empty typed table must not raise
        sort_table(out, [("total", "descending")])

        # a filter-emptied dataset has NO recoverable schema in Ray — the
        # caller's explicit schema= covers it
        tbl2 = pa.table({"k": ["a", "b"], "s": pa.array([1, 2], pa.int64())})
        ds2 = rd.from_arrow(tbl2).filter(lambda r: False)
        out2 = combine_partials(
            ds2, keys=["k"], aggs=[("s", "sum", "total")],
            schema=pa.schema([("k", pa.string()), ("s", pa.int64())]),
        )
        assert out2.num_rows == 0
        assert out2.schema.field("k").type == pa.string()
        assert out2.schema.field("total").type == pa.int64()

    def test_window_aggs_on_emptied_input(self, ray_session):
        """Every coordinator-merged query must survive an input filtered to
        zero rows with its non-empty schema (oracle comparison on empty
        inputs)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.relational import events_by_type
        from lmss_entity_extractor_ray.ops.windows import (
            sliding_window_agg,
            tumbling_window_agg,
        )

        events = rd.read_parquet(f"{SF}/events.parquet")
        nonempty = tumbling_window_agg(events).schema()
        emptied = events.filter(expr="value < -1e18")
        for fn in (tumbling_window_agg, sliding_window_agg, events_by_type):
            out = fn(emptied)
            assert out.count() == 0
        got = tumbling_window_agg(emptied).schema()
        assert got.names == nonempty.names
        assert [str(t) for t in got.types] == [str(t) for t in nonempty.types]

    def test_cc_raises_when_unconverged(self, ray_session):
        """A component with diameter > max_iters must fail loudly, never
        silently emit wrong cluster labels."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.graph import connected_components

        n = 12  # chain 0-1-...-11
        pairs = pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
        ds = rd.from_arrow(pairs)
        with pytest.raises(RuntimeError, match="not converged"):
            connected_components(ds, max_iters=1, small_graph_limit=0).to_pandas()
        # and with enough iterations the chain resolves to one component
        df = connected_components(
            rd.from_arrow(pairs), small_graph_limit=0
        ).to_pandas()
        assert set(df["cluster_id"]) == {0}
        assert len(df) == n
        # the single-task path resolves the same chain without iteration caps
        df2 = connected_components(rd.from_arrow(pairs)).to_pandas()
        assert set(df2["cluster_id"]) == {0} and len(df2) == n

    def test_exact_tokens_vtab_matches_re2(self, ray_session):
        """RE2's \\s excludes vertical tab; the Python tokenizer and
        fingerprint normalizer must agree with Arrow/DuckDB on \\v docs."""
        import duckdb

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens
        from lmss_entity_extractor_ray.ops.text_ops import (
            fingerprint_batch,
            fingerprint_text,
            normalize_for_fingerprint,
        )

        doc = "Alpha\x0bBeta\tGamma  Delta\x0b"
        sql = duckdb.sql(
            "select list_filter(regexp_split_to_array(lower(?), '\\s+'), t -> t != '')",
            params=[doc],
        ).fetchone()[0]
        assert exact_tokens(doc) == sql
        # normalizer: single-string helper == Arrow batch kernel on \v text
        batch = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [doc]})
        arrow_fp = fingerprint_batch(batch).column("fingerprint")[0].as_py()
        assert fingerprint_text(doc) == arrow_fp
        assert "\x0b" in normalize_for_fingerprint(doc)


# ---------------------------------------------------------------------------
# round-3 ops: redaction, repetition stats, decontamination, multi-query ANN,
# k-means assignment
# ---------------------------------------------------------------------------

class TestRound3Ops:
    def test_regex_redact_vs_duckdb(self, ray_session, docs_ds):
        import duckdb

        from lmss_entity_extractor_ray.ops.text_ops import regex_redact

        pat = r"\b(customer|supplier)\b"
        got = (
            regex_redact(docs_ds, pattern=pat, replacement="<X>")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text,''), '{pat}')) AS BIGINT)
                       AS n_redacted,
                   sha256(regexp_replace(coalesce(text,''), '{pat}', '<X>', 'g'))
                       AS redacted_sha256
                FROM '{SF}/documents.parquet' ORDER BY doc_id"""
        ).df()
        assert got["n_redacted"].tolist() == exp["n_redacted"].tolist()
        assert got["redacted_sha256"].tolist() == exp["redacted_sha256"].tolist()
        assert got["n_redacted"].sum() > 0  # the pattern actually fires

    def test_repetition_stats_edge_cases(self, ray_session):
        """Hand-computed oracle over pathological docs (empty, whitespace,
        single token, all-same, all-distinct)."""
        from collections import Counter

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens
        from lmss_entity_extractor_ray.ops.repetition import repetition_stats

        texts = ["a b a b a", "", "x", "hello world hello world", "   ",
                 "one two three", "a a a a", "Tab\there\tand  spaces"]
        ids = list(range(1, len(texts) + 1))
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        got = (
            repetition_stats(rd.from_arrow(tbl).repartition(3))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )

        def e5(x):
            return int(np.floor(x * 100000 + 0.5))

        for d, t in zip(ids, texts):
            toks = exact_tokens(t)
            nt = len(toks)
            c = Counter(toks)
            bgs = [" ".join(toks[j : j + 2]) for j in range(nt - 1)]
            assert got.loc[d, "n_tokens"] == nt
            assert got.loc[d, "distinct_token_frac_e5"] == (e5(len(c) / nt) if nt else 0)
            assert got.loc[d, "top_token_frac_e5"] == (e5(max(c.values()) / nt) if nt else 0)
            assert got.loc[d, "dup_bigram_frac_e5"] == (
                e5(1 - len(set(bgs)) / len(bgs)) if bgs else 0
            )

    def test_decontaminate_vs_bruteforce(self, ray_session, docs_ds, docs_tbl):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.decontam import decontaminate
        from lmss_entity_extractor_ray.ops.dedup import exact_tokens

        k = 3
        ids = docs_tbl.column("doc_id").to_pylist()
        txts = docs_tbl.column("text").to_pylist()
        sh = {}
        for d, s in zip(ids, txts):
            toks = exact_tokens(s)
            sh[d] = (
                {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                if len(toks) >= k
                else set()
            )
        bench_ids = {d for d in ids if d % 7 == 3}
        bench_sh = set().union(*(sh[d] for d in bench_ids)) if bench_ids else set()
        expect = sorted(
            d for d in ids if d not in bench_ids and not (sh[d] & bench_sh)
        )

        bench_tbl = docs_tbl.filter(
            pa.array([d in bench_ids for d in ids])
        )
        train_tbl = docs_tbl.filter(pa.array([d not in bench_ids for d in ids]))
        got = decontaminate(
            rd.from_arrow(train_tbl).repartition(4),
            rd.from_arrow(bench_tbl),
            shingle_k=k,
        ).to_pandas()
        assert sorted(got["doc_id"].tolist()) == expect

    def test_corpus_report_vs_bruteforce(self, ray_session):
        from collections import defaultdict

        import pyarrow.parquet as pq
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.text_ops import corpus_report

        tbl = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = corpus_report(rd.from_arrow(tbl).repartition(4)).to_pandas().set_index("lang")
        exp = defaultdict(lambda: [0, 0, 0, 0, 0])
        for lang, text in zip(
            tbl.column("lang").to_pylist(), tbl.column("text").to_pylist()
        ):
            t = (text or "").strip()
            n = len(t.split()) if t else 0
            e = exp[lang]
            e[0] += 1
            e[1] += 1 if not t else 0
            e[2] += len(text or "")
            e[3] += n
            e[4] = max(e[4], n)
        assert sorted(got.index) == sorted(exp)
        for lang, (nd, ne, nc, nt, mx) in exp.items():
            row = got.loc[lang]
            assert (row.n_docs, row.n_empty, row.n_chars, row.n_tokens, row.max_tokens) == (
                nd, ne, nc, nt, mx
            )

    def test_fuzzy_decontaminate_vs_bruteforce(self, ray_session, docs_tbl):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.decontam import fuzzy_decontaminate
        from lmss_entity_extractor_ray.ops.dedup import exact_tokens

        k, num, den = 3, 3, 5
        ids = docs_tbl.column("doc_id").to_pylist()
        txts = docs_tbl.column("text").to_pylist()
        sh = {}
        for d, s in zip(ids, txts):
            toks = exact_tokens(s)
            sh[d] = (
                {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                if len(toks) >= k
                else set()
            )
        bench_ids = {d for d in ids if d % 7 == 3}
        expect = sorted(
            d
            for d in ids
            if d not in bench_ids
            and not any(
                sh[d] and len(sh[d] & sh[e]) * den >= num * len(sh[d])
                for e in bench_ids
            )
        )

        bench_tbl = docs_tbl.filter(pa.array([d in bench_ids for d in ids]))
        train_tbl = docs_tbl.filter(pa.array([d not in bench_ids for d in ids]))
        got = fuzzy_decontaminate(
            rd.from_arrow(train_tbl).repartition(4),
            rd.from_arrow(bench_tbl),
            tau=(num, den),
            shingle_k=k,
        ).to_pandas()
        assert sorted(got["doc_id"].tolist()) == expect

    def test_fuzzy_decontaminate_empty_bench(self, ray_session, docs_ds, docs_tbl):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.decontam import fuzzy_decontaminate

        empty = docs_tbl.slice(0, 0)
        got = fuzzy_decontaminate(docs_ds, rd.from_arrow(empty)).count()
        assert got == docs_tbl.num_rows

    def test_multi_query_topk_vs_bruteforce(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import multi_query_topk

        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        order = np.argsort(ids)[:3]
        queries = [(int(ids[i]), mat[i]) for i in order]
        got = (
            multi_query_topk(emb_ds, queries, k=5)
            .to_pandas()
            .sort_values(["query_id", "rn"])
            .reset_index(drop=True)
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        for qid, qv in queries:
            qn = qv / np.linalg.norm(qv)
            cos = (mat @ qn) / norms
            e5 = np.floor(cos * 100_000 + 0.5).astype(np.int64)
            o = np.lexsort((ids, -e5))[:5]
            sub = got[got["query_id"] == qid]
            assert sub["vec_id"].tolist() == [int(ids[i]) for i in o]
            assert sub["cos_e5"].tolist() == [int(e5[i]) for i in o]
            assert sub["rn"].tolist() == [1, 2, 3, 4, 5]

    def test_kmeans_assign_layout_independent(self, ray_session, emb_ds, emb_tbl):
        from lmss_entity_extractor_ray.ops.similarity import ivf_centroids, kmeans_assign

        a = kmeans_assign(emb_ds, n_centroids=8, seed=17).to_pandas()
        b = (
            kmeans_assign(emb_ds.repartition(7), n_centroids=8, seed=17)
            .to_pandas()
        )
        am = dict(zip(a["vec_id"], a["cluster_id"]))
        bm = dict(zip(b["vec_id"], b["cluster_id"]))
        assert am == bm
        assert set(a["cluster_id"]).issubset(set(range(8)))
        # matches a driver-side recompute with the same centroids
        cents = ivf_centroids(emb_ds, n_centroids=8, seed=17)
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        exp = np.argmax((mat / norms) @ cents.T, axis=1)
        for i, d in enumerate(ids):
            assert am[int(d)] == int(exp[i])


class TestAutoShingleCap:
    def _mk_corpus(self, n=240, boiler="lorem ipsum dolor sit amet", ray=None):
        import ray.data as rd

        rows = []
        for i in range(n):
            # unique tail so docs are distinct; shared boilerplate head
            rows.append(f"{boiler} uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e "
                        f"uniq{i}f uniq{i}g uniq{i}h uniq{i}i uniq{i}j")
        # one true near-dup pair: 240/241 share everything but one token
        rows.append(rows[0] + " tailx")
        ids = list(range(len(rows)))
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": rows})
        return tbl, rd.from_arrow(tbl).repartition(4)

    def test_auto_cap_on_boilerplate_corpus(self, ray_session):
        from lmss_entity_extractor_ray.ops.dedup import (
            auto_shingle_cap,
            ngram_jaccard_pairs,
        )

        tbl, ds = self._mk_corpus()
        # tight pair budget: the 3 boilerplate 3-grams (freq 241 → ~29k
        # pairs each) must not fit, the distinct tails must
        cap = auto_shingle_cap(
            ds, shingle_k=3, floor=4, sample_docs=10_000,
            pairs_per_doc=1.0, min_budget=10_000,
        )
        assert cap is not None and 4 <= cap < 241
        exact = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
        capped = ngram_jaccard_pairs(
            ds, threshold=0.5, max_shingle_freq=cap
        ).to_pandas()
        exact_pairs = set(zip(exact["a"], exact["b"]))
        capped_pairs = set(zip(capped["a"], capped["b"]))
        # idf-filtered J: on this corpus the only discriminative overlap is
        # the dup pair's tail, so no false pairs appear…
        assert capped_pairs <= exact_pairs
        # …and the true near-dup (shares its entire unique tail) survives
        # even though ALL its boilerplate shingles were dropped
        assert (0, 240) in capped_pairs

    def test_auto_cap_none_on_benign_corpus(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import auto_shingle_cap

        tbl = pa.table(
            {
                "doc_id": pa.array(range(50), pa.int64()),
                "text": [f"w{i}a w{i}b w{i}c w{i}d w{i}e" for i in range(50)],
            }
        )
        assert auto_shingle_cap(rd.from_arrow(tbl), floor=4) is None

    def test_auto_mode_through_minhash(self, ray_session):
        from lmss_entity_extractor_ray.ops.dedup import near_dup_pairs_minhash

        tbl, ds = self._mk_corpus(n=60)
        got = near_dup_pairs_minhash(
            ds, threshold=0.5, max_shingle_freq="auto"
        ).to_pandas()
        assert (0, 60) in set(zip(got["a"], got["b"]))


class TestModelScores:
    def test_model_scores_vs_duckdb(self, ray_session, docs_ds):
        import duckdb

        from lmss_entity_extractor_ray.ops.model_score import model_scores

        got = (
            model_scores(docs_ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ntok = ("CASE WHEN trim(text) = '' THEN 0 ELSE "
                "array_length(regexp_split_to_array(trim(text), '\\s+')) END")
        toks = "regexp_split_to_array(trim(text), '\\s+')"
        stop = "('the','a','an','of','to','and','in','is','it','for')"
        exp = duckdb.sql(f"""
            WITH q AS (
                SELECT doc_id, length(text) AS lc, {ntok} AS nt,
                       length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS pc,
                       CASE WHEN {ntok} = 0 THEN 0
                            ELSE CAST(floor(length(regexp_replace(text, '\\s', '', 'g'))
                                            / greatest({ntok}, 1) * 100000 + 0.5) AS BIGINT)
                            END AS atc,
                       CASE WHEN {ntok} = 0 THEN 0
                            ELSE CAST(floor(len(list_filter({toks}, x -> x IN {stop}))
                                            / {ntok} * 100000 + 0.5) AS BIGINT)
                            END AS sr
                FROM '{SF}/documents.parquet'),
            z AS (SELECT doc_id,
                         -10.0 + 0.00390625*lc + 0.03125*nt + (-0.25)*pc
                               + 0.0000152587890625*atc + (-0.000030517578125)*sr AS zv
                  FROM q)
            SELECT doc_id, CAST(floor(zv*100000 + 0.5) AS BIGINT) AS logit_e5,
                   CASE WHEN zv > 0 THEN 1 ELSE 0 END AS keep
            FROM z ORDER BY doc_id
        """).df()
        assert got["logit_e5"].tolist() == exp["logit_e5"].tolist()
        assert got["keep"].tolist() == exp["keep"].tolist()
        # the decision boundary actually splits the corpus
        assert 0 < got["keep"].sum() < len(got)


class TestBloomJoin:
    def test_bloom_join_equals_plain_join(self, ray_session):
        import duckdb
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.bloom import (
            bloom_join,
            bloom_semi_filter,
            build_bloom,
        )

        orders = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
        )
        cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
        import pyarrow.compute as pc

        rich = cust.map_batches(
            lambda b: b.filter(pc.greater(b.column("c_acctbal"), 8000.0)),
            batch_format="pyarrow",
        )
        got = (
            bloom_join(orders, rich, on="o_custkey", right_on="c_custkey")
            .select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_acctbal"])
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(f"""
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_acctbal
            FROM '{SF}/orders.parquet' o
            JOIN (SELECT c_custkey, c_acctbal FROM '{SF}/customer.parquet'
                  WHERE c_acctbal > 8000) c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_orderkey
        """).df()
        assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
        assert got["c_acctbal"].tolist() == exp["c_acctbal"].tolist()

        # no false negatives: the pre-filter keeps EVERY truly matching row,
        # and it actually prunes (selectivity << 1 on this predicate)
        bloom = build_bloom(rich, "c_custkey")
        kept = bloom_semi_filter(orders, bloom, "o_custkey").count()
        assert len(exp) <= kept < orders.count()


class TestSplitAndGate:
    def test_dataset_split_deterministic_and_complete(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.sampling import dataset_split

        a = dataset_split(docs_ds).to_pandas()
        b = dataset_split(docs_ds.repartition(7)).to_pandas()
        am = dict(zip(a["doc_id"], a["split"]))
        bm = dict(zip(b["doc_id"], b["split"]))
        assert am == bm  # layout-independent
        counts = a["split"].value_counts()
        assert set(counts.index) <= {"train", "val", "test"}
        assert counts.sum() == len(a)
        # roughly the requested proportions at n=500
        assert counts.get("train", 0) > counts.get("val", 0)
        assert counts.get("train", 0) > counts.get("test", 0)

    def test_length_percentile_gate_vs_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.stats import grouped_quantile_gate

        docs = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        got = sorted(
            grouped_quantile_gate(docs, key="lang", value="n_chars", q=0.25)
            .to_pandas()["doc_id"]
            .tolist()
        )
        exp = sorted(
            duckdb.sql(f"""
                WITH t AS (SELECT lang, quantile_disc(n_chars, 0.25) AS q
                           FROM '{SF}/documents.parquet' GROUP BY lang)
                SELECT d.doc_id FROM '{SF}/documents.parquet' d
                JOIN t USING (lang) WHERE d.n_chars >= t.q
            """).df()["doc_id"].tolist()
        )
        assert got == exp


class TestCardinality:
    def test_exact_distinct_vs_duckdb(self, ray_session, docs_ds):
        import duckdb

        from lmss_entity_extractor_ray.ops.cardinality import distinct_tokens_exact

        got = distinct_tokens_exact(docs_ds).to_pandas()["n_distinct_tokens"][0]
        exp = duckdb.sql(f"""
            SELECT count(DISTINCT term) FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                    x -> x <> '')) AS term
                FROM '{SF}/documents.parquet')
        """).fetchone()[0]
        assert got == exp

    def test_hll_within_error_bound(self, ray_session):
        """HLL at p=12 has ~1.6% std error; gate at 5% on a 20k-token vocab
        (synthetic tokens so the true cardinality is known and large enough
        for the asymptotic regime)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.cardinality import (
            distinct_tokens_exact,
            distinct_tokens_hll,
        )

        rows = [" ".join(f"tok{i}_{j}" for j in range(20)) for i in range(1000)]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(rows)), pa.int64()), "text": rows}
        )
        ds = rd.from_arrow(tbl).repartition(6)
        exact = distinct_tokens_exact(ds).to_pandas()["n_distinct_tokens"][0]
        assert exact == 20_000
        est = distinct_tokens_hll(ds, p=12).to_pandas()["n_distinct_tokens_est"][0]
        assert abs(est - exact) / exact < 0.05
        # layout independence: sketches merge by register max — same estimate
        est2 = distinct_tokens_hll(rd.from_arrow(tbl).repartition(2), p=12)
        assert est2.to_pandas()["n_distinct_tokens_est"][0] == est


class TestHeavyHitters:
    def test_top_tokens_vs_duckdb(self, ray_session, docs_ds):
        import duckdb

        from lmss_entity_extractor_ray.ops.heavy_hitters import top_tokens

        got = top_tokens(docs_ds, k=15).to_pandas()
        exp = duckdb.sql(f"""
            SELECT term AS token, count(*) AS n FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                    x -> x <> '')) AS term
                FROM '{SF}/documents.parquet')
            GROUP BY term ORDER BY n DESC, token LIMIT 15
        """).df()
        assert got["token"].tolist() == exp["token"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()

    def test_top_tokens_refuses_uncertifiable(self, ray_session):
        """Near-uniform vocabulary: no token clears the pigeonhole bar —
        the operator must raise instead of silently returning a wrong
        top-k."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.heavy_hitters import top_tokens

        rows = [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(200)]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(rows)), pa.int64()), "text": rows}
        )
        with pytest.raises(ValueError, match="raise m"):
            top_tokens(rd.from_arrow(tbl).repartition(4), k=5, m=8).to_pandas()


class TestUnicodeNormalize:
    def test_nfc_parity_with_duckdb_on_nonascii(self, ray_session):
        import duckdb
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.text_ops import unicode_normalize

        texts = ["café münchen", "café", "å vs å",
                 "plain ascii", "", "ﬁle ligatures stay in NFC"]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        got = (
            unicode_normalize(rd.from_arrow(tbl).repartition(2))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        exp = con.sql("""
            SELECT doc_id, sha256(nfc_normalize(coalesce(text,''))) AS h,
                   CASE WHEN nfc_normalize(coalesce(text,'')) <> coalesce(text,'')
                        THEN 1 ELSE 0 END AS c
            FROM t ORDER BY doc_id
        """).df()
        assert got["norm_sha256"].tolist() == exp["h"].tolist()
        assert got["changed"].tolist() == exp["c"].tolist()
        assert got["changed"].sum() >= 2  # the decomposed inputs DID change


class TestUnigramNLL:
    def test_unigram_nll_vs_python(self, ray_session, docs_ds, docs_tbl):
        """Independent in-test recompute: global tf -> quantized per-token
        information content -> per-doc integer sums."""
        from collections import Counter

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens
        from lmss_entity_extractor_ray.ops.lm_score import unigram_nll

        got = (
            unigram_nll(docs_ds).to_pandas().set_index("doc_id").sort_index()
        )
        tf = Counter()
        docs = {}
        for d, t in zip(
            docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()
        ):
            toks = exact_tokens(t)
            docs[d] = toks
            tf.update(toks)
        n = float(sum(tf.values()))
        q = {t: int(np.floor(100_000.0 * np.log(n / float(c)))) for t, c in tf.items()}
        for d, toks in docs.items():
            assert got.loc[d, "n_tokens"] == len(toks)
            assert got.loc[d, "nll_e5_sum"] == sum(q[t] for t in toks)
        # rarer tokens carry more bits: docs differ, scores discriminate
        assert got["nll_e5_sum"].nunique() > 10

    def test_bigram_nll_vs_python(self, ray_session, docs_ds, docs_tbl):
        """Independent recompute of the add-one bigram model: corpus c2/c1
        counts + exact vocabulary -> quantized conditional information ->
        per-doc integer sums; <2-token docs emit (0, 0)."""
        from collections import Counter

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens
        from lmss_entity_extractor_ray.ops.lm_score import bigram_nll

        got = (
            bigram_nll(docs_ds).to_pandas().set_index("doc_id").sort_index()
        )
        c2: Counter = Counter()
        vocab = set()
        docs = {}
        for d, t in zip(
            docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist()
        ):
            toks = exact_tokens(t)
            docs[d] = toks
            vocab.update(toks)
            c2.update(zip(toks[:-1], toks[1:]))
        c1: Counter = Counter()
        for (w1, _), c in c2.items():
            c1[w1] += c
        V = len(vocab)
        q = {
            bg: int(np.floor(100_000.0 * np.log((c1[bg[0]] + V) / (c + 1.0))))
            for bg, c in c2.items()
        }
        assert len(got) == len(docs)
        for d, toks in docs.items():
            bgs = list(zip(toks[:-1], toks[1:]))
            assert got.loc[d, "n_bigrams"] == len(bgs)
            assert got.loc[d, "nll_e5_sum"] == sum(q[bg] for bg in bgs)
        # short/empty docs present with zeros (dedicated tiny corpus — the
        # shared fixture has no <2-token docs)
        import ray.data as rd

        tiny = rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([1, 2, 3], pa.int64()),
                 "text": pa.array(["", "one", "two words here"], pa.string())}
            )
        )
        tg = bigram_nll(tiny).to_pandas().set_index("doc_id").sort_index()
        assert tg["n_bigrams"].tolist() == [0, 0, 2]
        assert tg.loc[1, "nll_e5_sum"] == 0 and tg.loc[2, "nll_e5_sum"] == 0


class TestNllBuckets:
    @staticmethod
    def _brute_tiles(docs, B):
        """Sequential recompute: mean NLL -> sort -> SQL ntile sizes."""
        from collections import Counter

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens

        tf = Counter()
        toks = {d: exact_tokens(t) for d, t in docs}
        for ts in toks.values():
            tf.update(ts)
        n = float(sum(tf.values()))
        q = {t: int(np.floor(100_000.0 * np.log(n / float(c)))) for t, c in tf.items()}
        means = {
            d: (sum(q[t] for t in ts) // len(ts)) if ts else 0
            for d, ts in toks.items()
        }
        order = sorted(means, key=lambda d: (means[d], d))
        size, rem = divmod(len(order), B)
        tiles, r = {}, 0
        for tile in range(1, B + 1):
            take = size + (1 if tile <= rem else 0)
            for d in order[r : r + take]:
                tiles[d] = tile
            r += take
        return means, tiles

    def test_tertiles_vs_bruteforce(self, ray_session, docs_ds, docs_tbl):
        from lmss_entity_extractor_ray.ops.lm_score import nll_buckets

        docs = list(
            zip(docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("text").to_pylist())
        )
        means, tiles = self._brute_tiles(docs, 3)
        got = nll_buckets(docs_ds, 3).to_pandas().set_index("doc_id")
        assert len(got) == len(docs)
        names = {1: "head", 2: "middle", 3: "tail"}
        for d in got.index:
            assert int(got.loc[d, "nll_mean_e5"]) == means[d]
            assert int(got.loc[d, "tile"]) == tiles[d], d
            assert got.loc[d, "bucket"] == names[tiles[d]]
        # thirds are ntile-sized
        sizes = got["tile"].value_counts()
        assert max(sizes) - min(sizes) <= 1

    def test_fewer_docs_than_buckets(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.lm_score import nll_buckets

        tbl = pa.table(
            {
                "doc_id": pa.array([5, 9], pa.int64()),
                "text": pa.array(["common common", "rare token here"], pa.string()),
            }
        )
        got = nll_buckets(rd.from_arrow(tbl), 5).to_pandas().set_index("doc_id")
        assert sorted(got["tile"].tolist()) == [1, 2]


class TestDecontamEdges:
    def test_empty_and_short_docs_always_clean(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.decontam import decontaminate

        train = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["", "   ", "two tokens", "alpha beta gamma delta"],
            }
        )
        bench = pa.table(
            {
                "doc_id": pa.array([99], pa.int64()),
                "text": ["alpha beta gamma something else entirely"],
            }
        )
        got = sorted(
            decontaminate(
                rd.from_arrow(train).repartition(2), rd.from_arrow(bench), shingle_k=3
            ).to_pandas()["doc_id"].tolist()
        )
        # doc 4 shares the 3-gram "alpha beta gamma" -> dropped; empty and
        # sub-k docs have no shingles -> trivially clean
        assert got == [1, 2, 3]

    def test_empty_benchmark_keeps_everything(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.decontam import decontaminate

        train = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": ["alpha beta gamma", "x y z"]}
        )
        bench = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        got = decontaminate(rd.from_arrow(train), rd.from_arrow(bench)).count()
        assert got == 2


class TestRepetitionFuzz:
    def test_repetition_matches_python_on_fuzzed_docs(self, ray_session):
        from collections import Counter

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens
        from lmss_entity_extractor_ray.ops.repetition import repetition_batch

        token = st.text(alphabet="abcXY0-_.é", min_size=0, max_size=4)
        doc = st.lists(token, min_size=0, max_size=12).map(" ".join)

        @settings(max_examples=40, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=8))
        def check(docs):
            ids = list(range(1, len(docs) + 1))
            out = repetition_batch(
                pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})
            ).to_pydict()

            def e5(x):
                return int(np.floor(x * 100000 + 0.5))

            for i, t in enumerate(docs):
                toks = exact_tokens(t)
                nt = len(toks)
                c = Counter(toks)
                bgs = [" ".join(toks[j : j + 2]) for j in range(nt - 1)]
                assert out["n_tokens"][i] == nt
                assert out["distinct_token_frac_e5"][i] == (
                    e5(len(c) / nt) if nt else 0
                )
                assert out["top_token_frac_e5"][i] == (
                    e5(max(c.values()) / nt) if nt else 0
                )
                assert out["dup_bigram_frac_e5"][i] == (
                    e5(1 - len(set(bgs)) / len(bgs)) if bgs else 0
                )

        check()


class TestCooccurrence:
    def test_cooccurrence_vs_bruteforce(self, ray_session):
        import itertools
        from collections import Counter

        import ray.data as rd

        from lmss_entity_extractor_ray.pipelines.kg import cooccurrence_edges

        # doc-aligned blocks (one doc's triples contiguous in one block) —
        # the documented input contract, same as the in-batch triple dedup
        rows = []
        for d in range(40):
            iris = [f"iri{(d + j) % 9}" for j in range((d % 4) + 1)]
            for iri in set(iris):
                rows.append((f"url{d}", iri))
        subj = pa.array([r[0] for r in rows], pa.string())
        obj = pa.array([r[1] for r in rows], pa.string())
        tbl = pa.table({"subj": subj, "obj": obj})
        got = cooccurrence_edges(rd.from_arrow(tbl)).to_pandas()
        got_map = {
            (a, b): n for a, b, n in zip(got["iri_a"], got["iri_b"], got["n_docs"])
        }
        per_doc: dict = {}
        for s, o in rows:
            per_doc.setdefault(s, set()).add(o)
        exp = Counter()
        for s, os_ in per_doc.items():
            for a, b in itertools.combinations(sorted(os_), 2):
                exp[(a, b)] += 1
        assert got_map == dict(exp)


class TestRound4FilteredMinhash:
    """Round-4: MinHash signs over the IDF-filtered shingle space; all-hot
    docs carry canonical fingerprints; the candidate-id broadcast is gone
    above the pair limit."""

    def _template_corpus(self, n=120, dup_pairs=3):
        import ray.data as rd

        boiler = ("terms of service privacy policy all rights reserved "
                  "subscribe to our newsletter follow us on social media")
        rows, ids = [], []
        for i in range(n):
            rows.append(f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d")
            ids.append(i)
        # exact near-dup pairs: doc n+j duplicates doc j's text exactly
        for j in range(dup_pairs):
            rows.append(rows[j])
            ids.append(n + j)
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": rows})
        return tbl, rd.from_arrow(tbl).repartition(4)

    def test_filtered_signing_collapses_candidates(self, ray_session):
        import numpy as np
        import ray

        from lmss_entity_extractor_ray.ops.dedup import (
            _hashed_shingle_rows,
            hot_shingle_set,
            minhash_candidate_pairs,
        )

        tbl, ds = self._template_corpus()
        raw_cands = minhash_candidate_pairs(ds).to_pandas()
        rows = ds.map_batches(
            lambda b: _hashed_shingle_rows(b, shingle_k=3),
            batch_format="pyarrow",
        )
        hot = hot_shingle_set(rows, 8, 20)
        assert hot is not None and len(hot) > 0
        hot_ref = ray.put(
            np.sort(hot.to_numpy(zero_copy_only=False).astype(np.int64))
        )
        filt_cands = minhash_candidate_pairs(ds, hot_ref=hot_ref).to_pandas()
        # raw banding bands template-mates; filtered banding only the dups
        assert len(filt_cands) < len(raw_cands) / 4
        got = set(zip(filt_cands["a"], filt_cands["b"]))
        for j in range(3):
            assert (j, 120 + j) in got

    def test_minhash_capped_identical_allhot_docs_pair(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import near_dup_pairs_minhash

        boiler = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [boiler] * 2 + [f"{boiler} tail{i}x tail{i}y tail{i}z" for i in range(30)]
        # docs 0,1: identical, ALL shingles hot once capped; 2..31 unique tails
        tbl = pa.table(
            {"doc_id": pa.array(range(len(rows)), pa.int64()), "text": rows}
        )
        ds = rd.from_arrow(tbl).repartition(3)
        got = near_dup_pairs_minhash(ds, threshold=0.9, max_shingle_freq=5).to_pandas()
        pairs = dict(((a, b), j) for a, b, j in
                     zip(got["a"], got["b"], got["jaccard"]))
        assert pairs.get((0, 1)) == 1.0  # identical all-hot docs keep J=1.0
        # different all-hot-prefix docs never pair via the fingerprint
        for (a, b) in pairs:
            assert (a, b) == (0, 1) or (a >= 2 and b >= 2)

    def test_ngram_capped_identical_allhot_docs_pair(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import ngram_jaccard_pairs

        boiler = "one two three four five six seven"
        rows = [boiler] * 2 + [f"{boiler} t{i}a t{i}b t{i}c" for i in range(30)]
        tbl = pa.table(
            {"doc_id": pa.array(range(len(rows)), pa.int64()), "text": rows}
        )
        ds = rd.from_arrow(tbl).repartition(3)
        got = ngram_jaccard_pairs(ds, threshold=0.9, max_shingle_freq=5).to_pandas()
        assert (0, 1) in set(zip(got["a"], got["b"]))
        sel = got[(got["a"] == 0) & (got["b"] == 1)]
        assert sel["jaccard_e5"].iloc[0] == 100_000

    def test_distributed_id_path_matches_broadcast_path(self, ray_session):
        """broadcast_pairs_limit=0 forces the left-semi join path for both
        the candidate-doc pruning and the pair verification — results must
        be identical to the broadcast path."""
        from lmss_entity_extractor_ray.ops.dedup import near_dup_pairs_minhash

        tbl, ds = self._template_corpus(n=60, dup_pairs=2)
        a = (near_dup_pairs_minhash(ds, threshold=0.7)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        b = (near_dup_pairs_minhash(ds, threshold=0.7, broadcast_pairs_limit=0)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        assert a.equals(b)
        assert {(0, 60), (1, 61)} <= set(zip(a["a"], a["b"]))


class TestRound4Advice:
    def test_top_tokens_kth_equal_ceiling_refused(self, ray_session):
        """k-th count EXACTLY equal to N/m: previously certified, now must
        raise (a tied non-candidate could displace it under the
        tie-break)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.heavy_hitters import top_tokens

        # block A: 'big' x5 + 3 fillers (local total 8, bar 2 -> 'big' is a
        # candidate); block B: 12 unique fillers.  N=20, m=4 -> ceiling 5;
        # the k-th candidate count is exactly 5 == N/m, which a tied
        # non-candidate could also reach -> must refuse.
        tbl_a = "big big big big big fa fb fc"
        tbl_b = " ".join(f"z{j}" for j in range(12))
        tbl = pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()), "text": [tbl_a, tbl_b]}
        )
        with pytest.raises(ValueError, match="strictly beat"):
            top_tokens(rd.from_arrow(tbl).repartition(2), k=1, m=4).to_pandas()

    def test_build_bloom_empty_small_side(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.bloom import (
            bloom_semi_filter,
            build_bloom,
        )

        empty = rd.from_arrow(
            pa.table({"k": pa.array([], pa.int64())})
        ).filter(lambda r: False)
        bloom = build_bloom(empty, "k", m_bits=1 << 10)
        big = rd.from_arrow(
            pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        )
        assert bloom_semi_filter(big, bloom, "k", m_bits=1 << 10).count() == 0

    def test_string_partition_deterministic_and_spread(self):
        import numpy as np

        from lmss_entity_extractor_ray.ops.partitioning import (
            string_hash64,
            string_partition,
        )

        vals = pa.array([f"key-{i}" for i in range(1000)] + ["", "dup", "dup"])
        p1 = string_partition(vals, 16)
        p2 = string_partition(vals, 16)
        assert np.array_equal(p1, p2)
        assert p1[-1] == p1[-2]  # same string, same partition
        # all partitions hit on 1000 distinct keys (no degenerate skew)
        assert len(set(p1.tolist())) == 16
        h = string_hash64(vals)
        assert h.dtype == np.uint64


# ---------------------------------------------------------------------------
# line-level dedup (C4 / RefinedWeb)
# ---------------------------------------------------------------------------

class TestLineDedup:
    @staticmethod
    def _oracle(docs, min_chars=1):
        """First-occurrence line dedup, brute force."""
        first = {}
        for d, t in sorted(docs):
            for i, line in enumerate(t.split("\n")):
                if len(line) >= min_chars and line not in first:
                    first[line] = (d, i)
        res = {}
        for d, t in docs:
            kept, rem = [], 0
            for i, line in enumerate(t.split("\n")):
                if len(line) < min_chars or first[line] == (d, i):
                    kept.append(line)
                else:
                    rem += 1
            res[d] = ("\n".join(kept), rem)
        return res

    def _check(self, docs, out):
        exp = self._oracle(docs)
        assert len(out) == len(docs)
        for d in out.index:
            assert out.loc[d, "text"] == exp[d][0], (d, out.loc[d, "text"], exp[d][0])
            assert out.loc[d, "n_removed"] == exp[d][1]

    def test_golden(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.line_dedup import line_dedup

        docs = [
            (0, "alpha\nbeta\ngamma"),
            (1, "beta\ndelta"),            # cross-doc dup
            (2, "alpha\nalpha\nx"),        # intra-doc dup + cross-doc dup
            (3, ""),                       # empty doc survives as one row
            (4, "\n\n"),                   # sub-min_chars lines never removed
            (5, "gamma\nbeta\nzeta"),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = line_dedup(rd.from_arrow(tbl), min_chars=1).to_pandas().set_index("doc_id")
        self._check(docs, out)

    def test_fuzz_vs_bruteforce_multiblock(self, ray_session):
        import random

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.line_dedup import line_dedup

        rng = random.Random(3)
        words = ["aa", "bb", "cc", "dd", "ee"]
        docs = [
            (
                i,
                "\n".join(
                    " ".join(rng.choices(words, k=rng.randrange(1, 4)))
                    for _ in range(rng.randrange(0, 6))
                ),
            )
            for i in range(200)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        # multi-block layout + small partition count: canonical choice must
        # be layout-independent
        out = (
            line_dedup(rd.from_arrow(tbl).repartition(7), min_chars=1, num_partitions=5)
            .to_pandas()
            .set_index("doc_id")
        )
        self._check(docs, out)

    def test_paragraph_mode(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.line_dedup import line_dedup

        docs = [
            (0, "para one here\n\nshared boilerplate\n\nunique tail"),
            (1, "shared boilerplate\n\nother paragraph"),
            (2, "line with\nnewline inside\n\nshared boilerplate"),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = (
            line_dedup(rd.from_arrow(tbl), min_chars=1, sep="\n\n")
            .to_pandas()
            .set_index("doc_id")
        )
        # first occurrence of "shared boilerplate" (doc 0) survives; the
        # single-\n inside doc 2's first paragraph is NOT a split point
        assert out.loc[0, "text"] == docs[0][1]
        assert out.loc[1, "text"] == "other paragraph"
        assert out.loc[1, "n_removed"] == 1
        assert out.loc[2, "text"] == "line with\nnewline inside"
        assert out.loc[2, "n_removed"] == 1

    def test_min_chars_gate(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.line_dedup import line_dedup

        docs = [(0, "xx\nlonger line"), (1, "xx\nlonger line")]
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = line_dedup(rd.from_arrow(tbl), min_chars=5).to_pandas().set_index("doc_id")
        # "xx" is below min_chars -> kept in both; "longer line" deduped
        assert out.loc[0, "text"] == "xx\nlonger line"
        assert out.loc[1, "text"] == "xx"
        assert out.loc[1, "n_removed"] == 1


# ---------------------------------------------------------------------------
# SemDeDup (semantic dedup)
# ---------------------------------------------------------------------------

class TestPackedCsvLists:
    def test_vs_bruteforce(self, ray_session):
        import random
        from collections import defaultdict

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.partitioning import packed_csv_lists

        rng = random.Random(11)
        ids = [rng.randrange(0, 40) for _ in range(500)]
        vals = [rng.randrange(0, 30) for _ in range(500)]
        tbl = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "pos": pa.array(vals, pa.int64())}
        )
        got = (
            packed_csv_lists(
                rd.from_arrow(tbl).repartition(7), 5, val_col="pos", out_col="v"
            )
            .to_pandas()
            .set_index("doc_id")["v"]
            .to_dict()
        )
        exp = defaultdict(set)
        for d, v in zip(ids, vals):
            exp[d].add(v)
        assert got == {
            d: ",".join(map(str, sorted(vs))) for d, vs in exp.items()
        }

    def test_empty(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.partitioning import packed_csv_lists

        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
        )
        assert packed_csv_lists(rd.from_arrow(tbl), 4, val_col="pos").count() == 0


class TestSemDeDup:
    def test_vs_bruteforce(self, ray_session, emb_ds, emb_tbl):
        """Dominate rule re-derived brute-force over the op's own clusters."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.semdedup import semdedup

        out = semdedup(emb_ds, n_clusters=4, tau=0.8).to_pandas().set_index("vec_id")
        ids = np.array(emb_tbl.column("vec_id").to_pylist())
        mat = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        clus = out["cluster_id"].reindex(ids).to_numpy()
        e5 = np.floor(unit @ unit.T * 100_000 + 0.5).astype(np.int64)
        for i, v in enumerate(ids):
            dominated = any(
                ids[j] < v and clus[j] == clus[i] and e5[i, j] >= 80_000
                for j in range(len(ids))
                if j != i
            )
            assert out.loc[v, "kept"] == (not dominated), v
        assert len(out) == len(ids)

    def test_chain_semantics(self, ray_session):
        """1-2 close, 2-3 close, 1-3 far: the any-lower-id rule drops BOTH 2
        and 3 (3 is dominated by the already-dropped 2) — order-free, unlike
        greedy sequential removal."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.semdedup import semdedup

        def v(theta):
            return [float(np.cos(theta)), float(np.sin(theta))] + [0.0] * 62

        # cos between consecutive ≈ cos(0.4) ≈ 0.921 >= 0.9; ends ≈ cos(0.8) ≈ 0.697 < 0.9
        tbl = pa.table(
            {
                "vec_id": pa.array([1, 2, 3], pa.int64()),
                "embedding": pa.array([v(0.0), v(0.4), v(0.8)],
                                      pa.list_(pa.float32())),
            }
        )
        out = (
            semdedup(rd.from_arrow(tbl), n_clusters=1, tau=0.9)
            .to_pandas()
            .set_index("vec_id")
        )
        assert bool(out.loc[1, "kept"]) is True
        assert bool(out.loc[2, "kept"]) is False
        assert bool(out.loc[3, "kept"]) is False

    def test_cross_cluster_never_compared(self, ray_session):
        """Identical vectors in different clusters both survive — the pair
        is only scored within a cluster (the SemDeDup contract)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.semdedup import semdedup

        # two tight opposite groups of 8 (enough points that k-means init
        # lands one centroid in each), exact duplicates within each group
        rng = np.random.RandomState(5)

        def grp(sign):
            base = np.zeros(64)
            base[0] = sign
            pts = base + 0.01 * rng.standard_normal((4, 64))
            return np.repeat(pts, 2, axis=0)  # each point duplicated

        mat = np.vstack([grp(1.0), grp(-1.0)])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(16), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
        out = (
            semdedup(rd.from_arrow(tbl), n_clusters=2, tau=0.999)
            .to_pandas()
            .set_index("vec_id")
            .sort_index()
        )
        # both groups produced clusters, and each exact-duplicate pair
        # collapsed to one survivor within its cluster
        assert out["cluster_id"].nunique() == 2
        assert int(out["kept"].sum()) == 8
        # first group's ids and second group's ids are in different clusters
        assert set(out.loc[:7, "cluster_id"]).isdisjoint(set(out.loc[8:, "cluster_id"]))


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

class TestUrlDedup:
    def test_canonicalization_goldens(self):
        from lmss_entity_extractor_ray.ops.url_ops import canonical_url

        cases = {
            "https://a.example/p/1?utm_source=x&utm_campaign=y": "https://a.example/p/1",
            "https://a.example/p/1#section": "https://a.example/p/1",
            "https://a.example/p/1/": "https://a.example/p/1",
            "https://a.example/p?id=3&utm_medium=m&y=2": "https://a.example/p?id=3&y=2",
            "https://a.example/p?utm_source=x&id=3": "https://a.example/p?id=3",
            "https://a.example/p?gclid=abc": "https://a.example/p",
            "https://a.example/p?fbclid=1&utm_a=2#f": "https://a.example/p",
            "https://a.example/CaseSensitive/Path": "https://a.example/CaseSensitive/Path",
        }
        got = canonical_url(pa.array(list(cases.keys()))).to_pylist()
        assert got == list(cases.values())

    def test_keep_latest_multiblock(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.url_ops import url_dedup

        rows = [
            ("https://a.example/page/1?utm_source=f", 100),
            ("https://a.example/page/1#x", 200),
            ("https://a.example/page/1/", 150),
            ("https://a.example/page/2", 100),
            # timestamp tie -> smallest raw url wins
            ("https://b.example/t#1", 70),
            ("https://b.example/t#0", 70),
        ]
        tbl = pa.table(
            {
                "url": pa.array([u for u, _ in rows]),
                "warc_ts": pa.array([t for _, t in rows], pa.int64()),
            }
        )
        out = (
            url_dedup(rd.from_arrow(tbl).repartition(4))
            .to_pandas()
            .set_index("canonical_url")
            .sort_index()
        )
        assert len(out) == 3
        assert out.loc["https://a.example/page/1", "url"] == "https://a.example/page/1#x"
        assert out.loc["https://a.example/page/1", "warc_ts"] == 200
        assert out.loc["https://a.example/page/1", "n_dups"] == 3
        assert out.loc["https://b.example/t", "url"] == "https://b.example/t#0"
        assert out.loc["https://a.example/page/2", "n_dups"] == 1


# ---------------------------------------------------------------------------
# Gopher gate + weighted domain mixing
# ---------------------------------------------------------------------------

class TestGopherGate:
    def test_rule_bits(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.gopher import gopher_gate

        docs = {
            0: ("the cat and dog went to that house with style today while "
                + " ".join(f"word{i}xy" for i in range(30))),  # passes (min_tokens=10)
            1: "",                                       # empty: bits 0,2,5,6
            2: "spam spam spam spam spam spam spam spam spam spam spam",  # top-token
            3: "### ### ... " + "the be to of and that have with more words here "
               * 3,                                      # symbol ratio
            4: "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16",  # non-alpha + stopwords
        }
        tbl = pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
        out = (
            gopher_gate(rd.from_arrow(tbl), min_tokens=10)
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[0, "keep"]) is True
        assert out.loc[1, "fail_mask"] & 0b1             # too short
        assert out.loc[1, "fail_mask"] & (1 << 6)        # no stopwords
        assert out.loc[2, "fail_mask"] & (1 << 7)        # top-token share
        assert out.loc[3, "fail_mask"] & (1 << 4)        # symbol ratio
        assert out.loc[4, "fail_mask"] & (1 << 5)        # alpha fraction
        assert out.loc[4, "fail_mask"] & (1 << 6)
        assert not bool(out.loc[1, "keep"])

    def test_mask_zero_iff_keep(self, ray_session, docs_ds):
        from lmss_entity_extractor_ray.ops.gopher import gopher_gate

        df = gopher_gate(docs_ds, min_tokens=5).to_pandas()
        assert ((df["fail_mask"] == 0) == df["keep"]).all()


class TestWeightedMix:
    def test_rates_and_determinism(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.sampling import weighted_mix

        n = 10_000
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "lang": pa.array(
                    [["en", "de", "fr", "xx"][i % 4] for i in range(n)], pa.string()
                ),
            }
        )
        rates = {"en": 0.5, "de": 1.0, "fr": 0.1}
        out = (
            weighted_mix(rd.from_arrow(tbl).repartition(5), rates, salt=7)
            .to_pandas()
        )
        sizes = out.groupby("lang").size()
        assert sizes["de"] == 2500                     # rate 1.0 keeps all
        assert sizes["xx"] == 2500                     # default rate 1.0
        assert abs(sizes["en"] - 1250) < 150           # ~0.5
        assert abs(sizes["fr"] - 250) < 80             # ~0.1
        # layout-independence
        out2 = weighted_mix(rd.from_arrow(tbl), rates, salt=7).to_pandas()
        assert sorted(out.doc_id) == sorted(out2.doc_id)

    def test_rate_zero_drops_group(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.sampling import weighted_mix

        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(100), pa.int64()),
                "lang": pa.array(["en"] * 50 + ["de"] * 50, pa.string()),
            }
        )
        out = weighted_mix(rd.from_arrow(tbl), {"en": 0.0}, salt=1).to_pandas()
        assert (out["lang"] == "de").all() and len(out) == 50


# ---------------------------------------------------------------------------
# duplicated-substring coverage (ExactSubstr-style)
# ---------------------------------------------------------------------------

class TestDupSpanStats:
    @staticmethod
    def _oracle(docs, k):
        from collections import Counter

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens

        grams = Counter()
        toks = {d: exact_tokens(t) for d, t in docs}
        for ts in toks.values():
            for p in range(max(0, len(ts) - k + 1)):
                grams[" ".join(ts[p : p + k])] += 1
        res = {}
        for d, ts in toks.items():
            cov = set()
            for p in range(max(0, len(ts) - k + 1)):
                if grams[" ".join(ts[p : p + k])] > 1:
                    cov.update(range(p, p + k))
            spans, prev = 0, None
            for t_ in sorted(cov):
                if prev is None or t_ != prev + 1:
                    spans += 1
                prev = t_
            res[d] = (len(ts), len(cov), spans)
        return res

    def _check(self, docs, out):
        exp = self._oracle(docs, self.K)
        assert len(out) == len(docs)
        for d in out.index:
            got = tuple(
                int(out.loc[d, c]) for c in ("n_tokens", "dup_tokens", "n_dup_spans")
            )
            assert got == exp[d], (d, got, exp[d])

    K = 3

    def test_golden(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.substr_dedup import dup_span_stats

        docs = [
            (0, "a b c d e f g h"),   # shares "c d e" with doc1
            (1, "x y c d e z w q"),
            (2, "p q r p q r p q"),   # internal repeats count
            (3, ""),
            (4, "one two"),           # shorter than k -> no grams
            (5, "a b c d e f g h"),   # full duplicate of doc0
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = (
            dup_span_stats(rd.from_arrow(tbl).repartition(3), k=3, num_partitions=4)
            .to_pandas()
            .set_index("doc_id")
        )
        self._check(docs, out)
        assert out.loc[5, "dup_frac_e5"] == 100_000  # fully covered

    def test_fuzz_vs_bruteforce(self, ray_session):
        import random

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.substr_dedup import dup_span_stats

        self.K = 4
        rng = random.Random(11)
        docs = [
            (i, " ".join(rng.choices(["aa", "bb", "cc", "dd"], k=rng.randrange(0, 20))))
            for i in range(150)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = (
            dup_span_stats(rd.from_arrow(tbl).repartition(6), k=4, num_partitions=5)
            .to_pandas()
            .set_index("doc_id")
        )
        self._check(docs, out)


class TestCutDupSpans:
    @staticmethod
    def _oracle(docs, k):
        from collections import Counter

        from lmss_entity_extractor_ray.ops.dedup import exact_tokens

        grams = Counter()
        toks = {d: exact_tokens(t) for d, t in docs}
        for ts in toks.values():
            for p in range(max(0, len(ts) - k + 1)):
                grams[" ".join(ts[p : p + k])] += 1
        res = {}
        for d, ts in toks.items():
            cov = set()
            for p in range(max(0, len(ts) - k + 1)):
                if grams[" ".join(ts[p : p + k])] > 1:
                    cov.update(range(p, p + k))
            kept = [t for i, t in enumerate(ts) if i not in cov]
            res[d] = (len(ts), len(kept), " ".join(kept))
        return res

    def _check(self, docs, out, k):
        exp = self._oracle(docs, k)
        assert len(out) == len(docs)
        for d in out.index:
            got = (
                int(out.loc[d, "n_tokens"]),
                int(out.loc[d, "kept_tokens"]),
                out.loc[d, "text_cut"],
            )
            assert got == exp[d], (d, got, exp[d])

    def test_golden(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.substr_dedup import cut_dup_spans

        docs = [
            (0, "a b c d e f g h"),   # shares "c d e" with doc1 -> both cut
            (1, "x y c d e z w q"),
            (2, "p q r p q r p q"),   # internal repeats cut everywhere
            (3, ""),
            (4, "one two"),           # shorter than k -> untouched
            (5, "a b c d e f g h"),   # full duplicate of doc0 -> emptied
            (6, "MiXeD   Case\ttokens"),  # normalization-only rebuild
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = (
            cut_dup_spans(rd.from_arrow(tbl).repartition(3), k=3, num_partitions=4)
            .to_pandas()
            .set_index("doc_id")
        )
        self._check(docs, out, 3)
        assert out.loc[5, "text_cut"] == ""  # fully duplicated doc emptied
        assert out.loc[6, "text_cut"] == "mixed case\ttokens".replace("\t", " ")

    def test_fuzz_vs_bruteforce(self, ray_session):
        import random

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.substr_dedup import cut_dup_spans

        rng = random.Random(13)
        docs = [
            (i, " ".join(rng.choices(["aa", "bb", "cc", "dd"], k=rng.randrange(0, 20))))
            for i in range(150)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
        out = (
            cut_dup_spans(rd.from_arrow(tbl).repartition(6), k=4, num_partitions=5)
            .to_pandas()
            .set_index("doc_id")
        )
        self._check(docs, out, 4)


class TestIncrementalDedup:
    def test_anti_join_semantics(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import exact_dedup_incremental

        known = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["seen before", "also seen"], pa.string()),
            }
        )
        new = pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": pa.array(
                    [
                        "Seen   BEFORE",       # same normalized fingerprint
                        "genuinely new",
                        "also seen",            # exact repeat of known
                        "genuinely new",        # intra-shard dup: BOTH kept
                    ],
                    pa.string(),
                ),
            }
        )
        out = (
            exact_dedup_incremental(rd.from_arrow(new), rd.from_arrow(known))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["doc_id"].tolist() == [11, 13]
        assert "fingerprint" in out.columns
