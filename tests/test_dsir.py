"""DSIR importance resampling: brute-force parity, bucketed mode, edges."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "is_target": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _brute_weights(rows):
    """Reference implementation straight from the definition."""
    from collections import Counter

    def grams(t):
        toks = [x for x in (t or "").lower().split() if x]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    cq, cp = Counter(), Counter()
    for _, t, tgt in rows:
        g = grams(t)
        cq.update(g)
        if tgt:
            cp.update(g)
    V = float(len(cq))
    Nq = float(sum(cq.values()))
    Np = float(sum(cp.values()))
    w5 = {
        g: math.floor(
            100_000.0
            * math.log(
                ((cp.get(g, 0) + 0.5) * (Nq + 0.5 * V))
                / ((Np + 0.5 * V) * (cq[g] + 0.5))
            )
        )
        for g in cq
    }
    return {d: sum(w5[g] for g in grams(t)) for d, t, _ in rows}


_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog", 1),
    (2, "the quick brown fox sleeps all day long", 1),
    (3, "zzz qqq vvv kkk www unrelated junk tokens here", 0),
    (4, "the quick brown cat jumps over the lazy dog", 0),
    (5, "", 0),
    (6, "quick brown", 0),
    (7, "numbers 1 2 3 4 5 6 7 8 9", 0),
]


class TestDSIR:
    def test_weights_match_bruteforce(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dsir import dsir_weights

        got = (
            dsir_weights(rd.from_arrow(_tbl(_ROWS)).repartition(3))
            .to_pandas()
            .set_index("doc_id")["logw_e5"]
            .to_dict()
        )
        assert got == _brute_weights(_ROWS)
        # target-like docs outrank the off-distribution one
        assert got[4] > got[3]
        assert got[5] == 0  # empty doc

    def test_select_topk_and_gumbel(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dsir import _gumbel_e5, dsir_select

        ds = rd.from_arrow(_tbl(_ROWS)).repartition(3)
        plain = dsir_select(ds, k=3)
        w = _brute_weights(_ROWS)
        exp = sorted(w, key=lambda d: (-w[d], d))[:3]
        assert plain.column("doc_id").to_pylist() == exp
        assert plain.column("score_e5").to_pylist() == plain.column("logw_e5").to_pylist()

        noisy = dsir_select(ds, k=3, gumbel_salt=99)
        ids = np.array([d for d, _, _ in _ROWS], dtype=np.int64)
        g = dict(zip(ids.tolist(), _gumbel_e5(ids, 99).tolist()))
        score = {d: w[d] + g[d] for d in w}
        exp_noisy = sorted(score, key=lambda d: (-score[d], d))[:3]
        assert noisy.column("doc_id").to_pylist() == exp_noisy
        assert noisy.column("score_e5").to_pylist() == [score[d] for d in exp_noisy]

    def test_bucketed_mode_same_shape(self, ray_session):
        """Hashed buckets coarsen the feature space but keep the estimator's
        shape: identical docs score identically, and with enough buckets the
        ranking matches exact mode on this tiny corpus."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dsir import dsir_weights

        ds = rd.from_arrow(_tbl(_ROWS))
        exact = (
            dsir_weights(ds).to_pandas().set_index("doc_id")["logw_e5"].to_dict()
        )
        bucketed = (
            dsir_weights(ds, num_buckets=1 << 20)
            .to_pandas()
            .set_index("doc_id")["logw_e5"]
            .to_dict()
        )
        # 2^20 buckets over ~60 grams: collisions vanishingly unlikely →
        # same weights (bucket identity doesn't change counts)
        assert bucketed == exact

    def test_no_target_rows_defined(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dsir import dsir_weights

        rows = [(d, t, 0) for d, t, _ in _ROWS]
        got = dsir_weights(rd.from_arrow(_tbl(rows))).to_pandas()
        # smoothing keeps everything finite; all-raw target ⇒ weights are
        # still defined (ln of smoothed ratios)
        assert len(got) == len(rows)
        assert np.isfinite(got["logw_e5"]).all()

    def test_empty_corpus(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dsir import dsir_select

        empty = _tbl([])
        out = dsir_select(rd.from_arrow(empty), k=5)
        assert out.num_rows == 0
        assert out.schema.names == ["doc_id", "logw_e5", "score_e5"]
