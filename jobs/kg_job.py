"""Cluster job entrypoint for the KG pipeline (the north rule's
``ray job submit`` path):

    ray job submit --working-dir . -- \\
        python jobs/kg_job.py --owl LMSS.owl \\
        --corpus 's3://bucket/crawl/*.parquet' --out s3://bucket/triples \\
        --shards 4096

On a cluster, ``ray.init(address="auto")`` attaches to the running Ray; the
sandbox falls back to local mode.  Shards are the resume unit: a re-submitted
job skips shards already recorded in the output manifest, so a preempted
10^12-document run loses at most one shard of work per worker.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--owl", required=True)
    ap.add_argument("--corpus", required=True, help="glob of corpus parquet files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False)  # on a cluster
        except Exception:
            ray.init(address="local", include_dashboard=False)  # sandbox

    from lmss_entity_extractor_ray.ontology.artifacts import build_or_load
    from lmss_entity_extractor_ray.pipelines.runner import run_kg_pipeline

    art = build_or_load(args.owl)
    files = sorted(glob.glob(args.corpus))
    if files and all(f.endswith((".warc", ".warc.gz")) for f in files):
        # Common-Crawl-native input: convert WARC shards to the corpus
        # parquet shape once (same resume unit), then run as usual
        import os

        from lmss_entity_extractor_ray.sources.warc import read_warc

        conv = os.path.join(args.out, "_warc_corpus")
        if not glob.glob(os.path.join(conv, "*.parquet")):
            read_warc(files).write_parquet(conv)
        files = sorted(glob.glob(os.path.join(conv, "*.parquet")))
    summary = run_kg_pipeline(
        files, art, args.out, num_shards=args.shards, resume=not args.no_resume
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
