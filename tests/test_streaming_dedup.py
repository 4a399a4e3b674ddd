"""Streaming rolling-index near-dup: parity with the batch path + chain
semantics of the canonical-only index."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    """Planted near-dups, exact dups, short docs, empties, uniques —
    enough doc-id spread to span several ingest shards."""
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    for i in range(24):
        rows.append((i, f"{base} unique{i} filler{i} more{i} text{i}"))
    long = " ".join(f"tok{j}" for j in range(60))
    rows.append((100, long))
    rows.append((101, long + " extra"))
    rows.append((102, long.replace("tok5 ", "tok5x ")))
    dup = " ".join(f"dup{j}" for j in range(30))
    rows.append((200, dup))
    rows.append((201, dup))
    rows.append((30, ""))       # empties pair mutually at J=1
    rows.append((110, ""))
    rows.append((40, "two words"))   # < shingle_k tokens → single-hash shingle
    rows.append((120, "two words"))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _batch_fold(tbl: pa.Table, threshold: float) -> dict:
    """Expected per-doc first-duplicate from the batch pair set."""
    import ray.data as rd

    from lmss_entity_extractor_ray.ops.dedup import near_dup_pairs_minhash

    pairs = near_dup_pairs_minhash(
        rd.from_arrow(tbl), threshold=threshold
    ).to_pandas()
    fold: dict = {}
    for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"]):
        a, b = int(a), int(b)
        cur = fold.get(b)
        if cur is None or a < cur[0]:
            fold[b] = (a, int(np.floor(j * 100_000.0 + 0.5)))
    return fold


class TestStreamingNearDup:
    @pytest.mark.parametrize("shard_rows", [8, 1000])
    def test_parity_with_batch_fold(self, ray_session, shard_rows):
        """insert-all + exact shingle verification ≡ the batch pair set
        folded to per-doc first-duplicate — across shard splits (8 rows →
        many inter-shard lookups; 1000 → one all-intra shard)."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import streaming_near_dup

        tbl = _corpus()
        out = streaming_near_dup(
            rd.from_arrow(tbl).repartition(5),
            threshold=0.7,
            shard_rows=shard_rows,
            num_index_shards=3,
            store="shingles",
        ).to_pandas()

        assert len(out) == tbl.num_rows
        assert sorted(out["doc_id"]) == sorted(tbl.column("doc_id").to_pylist())
        got = {
            int(r.doc_id): (int(r.dup_of), int(r.sim_e5))
            for r in out.itertuples()
            if not np.isnan(r.dup_of)
        }
        assert got == _batch_fold(tbl, 0.7)
        # dup_of always strictly earlier
        assert all(j < d for d, (j, _) in got.items())

    def test_signature_mode_flags_exact_dups(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import streaming_near_dup

        dup = " ".join(f"w{j}" for j in range(40))
        other = " ".join(f"z{j}" for j in range(40))
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([dup, other, dup], pa.string()),
            }
        )
        out = (
            streaming_near_dup(
                rd.from_arrow(tbl), threshold=0.9, store="signature",
                num_index_shards=2,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert int(out.loc[3, "dup_of"]) == 1  # identical sigs → est J = 1.0
        assert int(out.loc[3, "sim_e5"]) == 100_000
        assert np.isnan(out.loc[1, "dup_of"]) and np.isnan(out.loc[2, "dup_of"])

    def test_canonical_chain_semantics(self, ray_session):
        """a~b, b~c, a!~c: insert-all marks both b and c dups; the
        canonical-only index drops b at the door so c stays canonical."""
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import streaming_near_dup

        w = [f"w{j}" for j in range(10)]
        a = " ".join(w)                                   # w0..w9
        b = " ".join(w[:8] + ["xa", "xb"])                # J(a,b)=8/12≈0.667
        c = " ".join(w[:6] + ["xa", "xb", "xc", "xd"])    # J(b,c)=8/12, J(a,c)=6/14≈0.43
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([a, b, c], pa.string()),
            }
        )
        kw = dict(
            threshold=0.6, shingle_k=1, store="shingles", num_index_shards=2,
            shard_rows=1,  # one doc per shard → pure rolling behavior
        )
        ds = rd.from_arrow(tbl)
        all_in = (
            streaming_near_dup(ds, insert_dups=True, **kw)
            .to_pandas().set_index("doc_id")
        )
        assert int(all_in.loc[2, "dup_of"]) == 1
        assert int(all_in.loc[3, "dup_of"]) == 2  # chained to the dup
        canon = (
            streaming_near_dup(ds, insert_dups=False, **kw)
            .to_pandas().set_index("doc_id")
        )
        assert int(canon.loc[2, "dup_of"]) == 1
        assert np.isnan(canon.loc[3, "dup_of"])   # b never entered the index

    def test_compaction_parity_and_trigger(self, ray_session):
        """A tiny compact_threshold forces repeated delta→array merges
        mid-stream; the output must be IDENTICAL to the uncompacted run
        (arrival order inside buckets is what the first-duplicate fold and
        the bucket_cap guard depend on), and the shard actors must report
        at least one compaction actually happened."""
        import ray
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import (
            _IndexShard,
            streaming_near_dup,
        )

        tbl = _corpus()
        kw = dict(
            threshold=0.7, shard_rows=6, num_index_shards=3, store="shingles"
        )
        ds = rd.from_arrow(tbl).repartition(5)
        plain = streaming_near_dup(ds, compact_threshold=0, **kw).to_pandas()
        compacted = streaming_near_dup(ds, compact_threshold=16, **kw).to_pandas()
        key = ["doc_id", "dup_of", "sim_e5"]
        assert (
            plain.sort_values("doc_id")[key].fillna(-1).values.tolist()
            == compacted.sort_values("doc_id")[key].fillna(-1).values.tolist()
        )

        # direct actor check: threshold crossings compact, lookups span both
        # layers, and per-bucket arrival order survives the merge
        shard = _IndexShard.remote("signature", 4)
        keys = np.array([7, 7, 9], dtype=np.int64)
        ids = np.array([1, 2, 3], dtype=np.int64)
        ray.get(shard.insert.remote((keys, ids)))          # 3 entries -> delta
        ray.get(shard.insert.remote((np.array([7], np.int64),
                                     np.array([4], np.int64))))  # 4th -> compact
        st = ray.get(shard.stats.remote())
        assert st["n_compactions"] == 1
        assert st["compacted_entries"] == 4 and st["delta_buckets"] == 0
        # post-compaction insert goes to the delta; query sees compacted
        # members FIRST (they are older), then delta members
        ray.get(shard.insert.remote((np.array([7], np.int64),
                                     np.array([9], np.int64))))
        news, olds = ray.get(
            shard.query.remote((np.array([7], np.int64),
                                np.array([10], np.int64)), 256)
        )
        assert olds.tolist() == [1, 2, 4, 9]
        # bucket_cap truncates the merged view in arrival order
        news, olds = ray.get(
            shard.query.remote((np.array([7], np.int64),
                                np.array([11], np.int64)), 3)
        )
        assert olds.tolist() == [1, 2, 4]

        # doc stores compact on the same trigger and serve from BOTH layers
        sig = ray.get(shard.stats.remote())  # before doc puts
        sigs = np.arange(8, dtype=np.uint64).reshape(2, 4)
        ray.get(shard.put_docs.remote(np.array([1, 2], np.int64), sigs, None, None))
        ray.get(shard.insert.remote((np.full(4, 5, np.int64),
                                     np.arange(20, 24, dtype=np.int64))))  # -> compacts
        st2 = ray.get(shard.stats.remote())
        assert st2["n_compactions"] == 2 and st2["compacted_docs"] == 2
        ray.get(shard.put_docs.remote(np.array([3], np.int64),
                                      np.full((1, 4), 9, np.uint64), None, None))
        got = ray.get(shard.get_docs.remote(np.array([1, 3, 2], np.int64)))
        assert got.tolist() == [[0, 1, 2, 3], [9, 9, 9, 9], [4, 5, 6, 7]]

        # shingle store: flat+offsets survive a two-round merge
        sh = _IndexShard.remote("shingles", 2)
        ray.get(sh.put_docs.remote(
            np.array([10, 11], np.int64), None,
            np.array([100, 101, 200], np.int64), np.array([0, 2, 3], np.int64)))
        ray.get(sh.insert.remote((np.array([1, 1], np.int64),
                                  np.array([10, 11], np.int64))))  # compacts round 1
        ray.get(sh.put_docs.remote(
            np.array([5], np.int64), None,
            np.array([50, 51], np.int64), np.array([0, 2], np.int64)))
        ray.get(sh.insert.remote((np.array([2, 2], np.int64),
                                  np.array([5, 5], np.int64))))    # compacts round 2 (unsorted-id merge)
        flat, offs = ray.get(sh.get_docs.remote(np.array([5, 10, 11], np.int64)))
        segs = [flat[offs[i]:offs[i + 1]].tolist() for i in range(3)]
        assert segs == [[50, 51], [100, 101], [200]]

    def test_rolling_index_continuation_and_checkpoint(self, ray_session, tmp_path):
        """The production rolling shape: two ingest ticks through ONE
        persistent RollingIndex must emit exactly what one uninterrupted
        run emits (tick 2 dedups against tick 1's inserts), and a
        save → load checkpoint between the ticks must change nothing —
        the restarted driver resumes without re-signing history."""
        import pandas as pd
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import (
            RollingIndex,
            streaming_near_dup,
        )

        tbl = _corpus()
        order = pa.compute.sort_indices(tbl.column("doc_id"))
        tbl = tbl.take(order)
        # cut INSIDE the planted dup groups (sorted ids: …,100,101 | 102,
        # 110(empty~30), 120("two words"~40), 200, 201) so tick 2 contains
        # docs whose first duplicate lives in tick 1 — true cross-tick dedup
        half = 28
        t1, t2 = tbl.slice(0, half), tbl.slice(half)
        kw = dict(threshold=0.7, shard_rows=8, store="shingles")

        full = streaming_near_dup(
            rd.from_arrow(tbl), num_index_shards=3, **kw
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)

        # tick 1 → checkpoint → load → tick 2
        idx = RollingIndex.create(num_shards=3, store="shingles",
                                  compact_threshold=32)
        out1 = streaming_near_dup(rd.from_arrow(t1), index=idx, **kw).to_pandas()
        idx.save(str(tmp_path / "ckpt"))
        idx2 = RollingIndex.load(str(tmp_path / "ckpt"))
        # the restored index starts fully compacted
        st = idx2.stats()
        assert all(s["delta_buckets"] == 0 for s in st)
        assert sum(s["compacted_docs"] for s in st) == half
        out2 = streaming_near_dup(rd.from_arrow(t2), index=idx2, **kw).to_pandas()

        both = (
            pd.concat([out1, out2]).sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(both, full)
        # cross-tick dups actually happened (planted pairs straddle the cut)
        assert out2["dup_of"].notna().any()

    def test_hot_filtered_parity_with_capped_batch(self, ray_session):
        """Streaming with an IDF hot-shingle set must equal the batch
        capped path folded to first-duplicate: signatures sign over the
        same filtered space, all-hot docs carry the same canonical
        fingerprint, and exact verification runs over the same filtered
        shingle sets.  (Raw-space streaming on template-heavy corpora
        floods candidates — 231 s vs ~15 s at the 200k smoke.)"""
        import functools

        import ray.data as rd

        from lmss_entity_extractor_ray.ops.dedup import (
            _hashed_shingle_rows,
            hot_shingle_set,
            near_dup_pairs_minhash,
        )
        from lmss_entity_extractor_ray.ops.streaming_dedup import streaming_near_dup

        boiler = ("terms of service privacy policy all rights reserved "
                  "subscribe to our newsletter now")
        rows = []
        for i in range(30):
            rows.append((i, f"{boiler} unique{i}a unique{i}b unique{i}c"))
        rows.append((100, f"{boiler} planted dup tail xyz"))
        rows.append((101, f"{boiler} planted dup tail xyz"))      # exact dup
        rows.append((200, boiler))                                # all-hot pair
        rows.append((201, boiler))
        tbl = pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
        ds = rd.from_arrow(tbl)
        cap = 8

        pairs = near_dup_pairs_minhash(
            ds, threshold=0.5, max_shingle_freq=cap
        ).to_pandas()
        fold: dict = {}
        for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"]):
            a, b = int(a), int(b)
            cur = fold.get(b)
            if cur is None or a < cur[0]:
                fold[b] = (a, int(np.floor(j * 100_000.0 + 0.5)))
        assert fold, "corpus must contain planted dups"
        assert 201 in fold  # the all-hot pair still pairs at J=1.0

        hot = hot_shingle_set(
            ds.map_batches(
                functools.partial(_hashed_shingle_rows, shingle_k=3),
                batch_format="pyarrow",
            ),
            4,
            cap,
        )
        assert hot is not None and len(hot) > 0
        hot_arr = np.sort(hot.to_numpy(zero_copy_only=False).astype(np.int64))

        out = streaming_near_dup(
            ds, threshold=0.5, store="shingles", shard_rows=8,
            num_index_shards=3, hot_shingles=hot_arr,
        ).to_pandas()
        got = {
            int(r.doc_id): (int(r.dup_of), int(r.sim_e5))
            for r in out.itertuples()
            if not np.isnan(r.dup_of)
        }
        assert got == fold

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from lmss_entity_extractor_ray.ops.streaming_dedup import streaming_near_dup

        tbl = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        out = streaming_near_dup(rd.from_arrow(tbl))
        assert out.count() == 0
        assert set(out.schema().names) == {"doc_id", "dup_of", "sim_e5"}
