"""Checkpointed, resumable KG pipeline runs (SURVEY.md §4.2-4.3, §7.1 M5-M6).

The corpus arrives as many parquet files (Common-Crawl segments).  Files are
grouped into ``num_shards`` shards — the checkpoint/resume unit.  Each shard
runs as one streaming Dataset execution and lands in its own partition
directory ``out_dir/shard=K/`` via write-to-temp + atomic rename; a manifest
line (JSONL, one per completed shard: row counters + wall time + lineage) is
appended only after the rename.  A rerun reads the manifest and skips
finished shards, so a killed run resumes without double-emitting
(SURVEY.md §7.4.7).

At 100 TB the same layout holds: shards are segment groups, the manifest
lives on shared storage, and each shard execution is itself fully streaming
with backpressure — sharding bounds re-work on failure, not memory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Optional, Sequence

import pyarrow.parquet as pq

import ray.data as rd

from ..config import EngineConfig, DEFAULT_CONFIG
from ..ontology.artifacts import OntologyArtifacts
from .kg import triples_dataset


def _shard_files(paths: Sequence[str], num_shards: int) -> List[List[str]]:
    shards: List[List[str]] = [[] for _ in range(min(num_shards, len(paths)))]
    for i, p in enumerate(sorted(paths)):
        shards[i % len(shards)].append(p)
    return shards


def _completed_shards(manifest_path: str) -> Dict[int, dict]:
    done = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["shard"]] = rec
    return done


def _parquet_rows(paths: Sequence[str]) -> int:
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def run_kg_pipeline(
    corpus_paths: Sequence[str],
    artifacts: OntologyArtifacts,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    num_shards: Optional[int] = None,
    fail_after_shards: Optional[int] = None,
) -> Dict:
    """Run (or resume) the full corpus→triples pipeline.

    ``fail_after_shards`` injects a crash after N newly-completed shards —
    used by the kill/resume test (SURVEY.md §5.2.4)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    completed = _completed_shards(manifest_path) if resume else {}
    if not resume and os.path.exists(manifest_path):
        os.remove(manifest_path)

    shards = _shard_files(corpus_paths, num_shards or cfg.run.num_shards)
    newly_done = 0
    for shard_id, files in enumerate(shards):
        if shard_id in completed:
            # Resume safety: shard ids are only meaningful for the exact
            # (corpus_paths, num_shards) they were computed from.  A rerun
            # with different inputs would silently skip/double-process files
            # if we trusted the id alone — skip ONLY on an exact file-list
            # match, and fail loudly otherwise.
            if completed[shard_id].get("input_files") == files:
                continue
            raise ValueError(
                f"resume mismatch for shard {shard_id}: manifest records "
                f"{completed[shard_id].get('input_files')} but the current "
                f"run shards to {files}; rerun with resume=False or the "
                "original corpus_paths/num_shards"
            )
        t0 = time.perf_counter()
        final_dir = os.path.join(out_dir, f"shard={shard_id}")
        tmp_dir = os.path.join(out_dir, f".tmp-shard-{shard_id}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)

        corpus_ds = rd.read_parquet(files, columns=["url", "html", "text"])
        triples = triples_dataset(corpus_ds, artifacts, cfg)
        triples.write_parquet(tmp_dir)
        os.rename(tmp_dir, final_dir)

        out_files = [
            os.path.join(final_dir, f)
            for f in os.listdir(final_dir)
            if f.endswith(".parquet")
        ]
        # per-shard branch histogram via the salted three-stage aggregate
        # (Zipf-hot branch keys; SURVEY.md §4.3) — counters in the manifest
        # give every shard lineage + the per-class stats of reference G3/G5
        from .kg import branch_histogram

        hist_tbl = branch_histogram(
            rd.read_parquet(out_files), buckets=cfg.run.salt_buckets
        ).to_pandas() if out_files else None
        record = {
            "shard": shard_id,
            "input_files": files,
            "docs_in": _parquet_rows(files),
            "triples_out": _parquet_rows(out_files),
            "branch_counts": (
                dict(zip(hist_tbl["branch"], hist_tbl["n"].astype(int)))
                if hist_tbl is not None
                else {}
            ),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        with open(manifest_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        completed[shard_id] = record
        newly_done += 1
        if fail_after_shards is not None and newly_done >= fail_after_shards:
            raise RuntimeError(f"injected failure after {newly_done} shards")

    return {
        "out_dir": out_dir,
        "shards": len(shards),
        "docs_in": sum(r["docs_in"] for r in completed.values()),
        "triples_out": sum(r["triples_out"] for r in completed.values()),
    }


def read_triples(out_dir: str) -> rd.Dataset:
    """Dataset over a completed run's partitioned triple output."""
    files = sorted(
        os.path.join(out_dir, d, f)
        for d in os.listdir(out_dir)
        if d.startswith("shard=")
        for f in os.listdir(os.path.join(out_dir, d))
        if f.endswith(".parquet")
    )
    return rd.read_parquet(files)
