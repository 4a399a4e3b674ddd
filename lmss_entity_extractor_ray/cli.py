"""CLI surface — the engine's counterpart of the reference's run_* scripts
(app/run_parser.py, app/run_extraction.py, app/run_classifier.py,
app/run_search.py) plus the corpus-scale KG job the reference never had.

    python -m lmss_entity_extractor_ray.cli build-ontology --owl F [--out D]
    python -m lmss_entity_extractor_ray.cli extract --owl F --text-file T [--out J]
    python -m lmss_entity_extractor_ray.cli classify --owl F --mentions J [--threshold 0.3]
    python -m lmss_entity_extractor_ray.cli search --owl F --query Q [--branches IRI ...]
    python -m lmss_entity_extractor_ray.cli kg-run --owl F --corpus GLOB --out D [--shards N]

Only ``kg-run`` touches Ray (guarded ``ray.init`` — the driver contract
forbids init inside library code; a CLI owns its session).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from collections import Counter


def _artifacts(owl: str, cache: str = "/tmp/lmss_artifacts"):
    from .ontology.artifacts import build_or_load

    return build_or_load(owl, cache_root=cache)


def cmd_build_ontology(args) -> int:
    from .ontology.artifacts import build_artifacts, save_artifacts

    art = build_artifacts(args.owl)
    out = save_artifacts(art, args.out)
    print(json.dumps({"out": out, **art.stats()}, indent=2))
    return 0


def cmd_extract(args) -> int:
    """Text file → mention JSON + stats (mirrors run_extraction.py:35-46)."""
    from .extraction.extractor import DocumentExtractor

    art = _artifacts(args.owl)
    text = open(args.text_file, encoding="utf-8").read()
    de = DocumentExtractor(art.gazetteer_surface_forms())
    mentions = de.extract(text)
    records = [
        {k: m[k] for k in ("text", "start", "end", "type", "source", "context", "confidence")}
        for m in mentions
    ]
    stats = {
        "total_entities": len(records),
        "entity_types": dict(Counter(r["type"] for r in records)),
    }
    payload = {"entities": records, "stats": stats}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
    print(json.dumps(stats, indent=2))
    return 0


def cmd_classify(args) -> int:
    """Mention JSON → classified matches (mirrors run_classifier.py, default
    threshold 0.3 like the CLI variant, app/run_classifier.py:33-39)."""
    from .config import LinkerConfig
    from .functions.embedding import embed_text
    from .linking.core import LinkerCore

    art = _artifacts(args.owl)
    core = LinkerCore(art, LinkerConfig(similarity_threshold=args.threshold))
    with open(args.mentions) as f:
        data = json.load(f)
    entities = data["entities"] if isinstance(data, dict) else data
    matched = []
    for ent in entities:
        rec = core.classify({**ent, "vector": embed_text(ent["text"])})
        if rec is not None:
            matched.append(rec)
    payload = {"matches": matched, "matched": len(matched), "total": len(entities)}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
    print(json.dumps({"matched": len(matched), "total": len(entities)}, indent=2))
    return 0


def cmd_search(args) -> int:
    from .search import OntologySearch

    art = _artifacts(args.owl)
    results = OntologySearch(art).search(args.query, selected_branches=args.branches or None)
    print(json.dumps(results, indent=2))
    return 0


def cmd_kg_run(args) -> int:
    files = sorted(glob.glob(args.corpus))
    if not files:
        print(f"no corpus files match {args.corpus!r}", file=sys.stderr)
        return 2

    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        started = True
    from .pipelines.runner import run_kg_pipeline

    art = _artifacts(args.owl)
    summary = run_kg_pipeline(
        files, art, args.out, num_shards=args.shards, resume=not args.no_resume
    )
    if started:  # never tear down a session we didn't create
        ray.shutdown()
    print(json.dumps(summary, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lmss-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-ontology")
    b.add_argument("--owl", required=True)
    b.add_argument("--out", default="/tmp/lmss_artifacts/manual")
    b.set_defaults(fn=cmd_build_ontology)

    e = sub.add_parser("extract")
    e.add_argument("--owl", required=True)
    e.add_argument("--text-file", required=True)
    e.add_argument("--out")
    e.set_defaults(fn=cmd_extract)

    c = sub.add_parser("classify")
    c.add_argument("--owl", required=True)
    c.add_argument("--mentions", required=True)
    c.add_argument("--threshold", type=float, default=0.3)
    c.add_argument("--out")
    c.set_defaults(fn=cmd_classify)

    s = sub.add_parser("search")
    s.add_argument("--owl", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--branches", nargs="*")
    s.set_defaults(fn=cmd_search)

    k = sub.add_parser("kg-run")
    k.add_argument("--owl", required=True)
    k.add_argument("--corpus", required=True, help="glob of corpus parquet files")
    k.add_argument("--out", required=True)
    k.add_argument("--shards", type=int, default=8)
    k.add_argument("--no-resume", action="store_true")
    k.set_defaults(fn=cmd_kg_run)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
