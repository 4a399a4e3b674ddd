"""N-Triples export of the triples table — the engine's counterpart of the
reference's Turtle graph writer (``save_graph``, app/lmss_parser.py:166-169;
SURVEY.md §2.1 S9).  An N-Triples line is a pure projection of a triple row,
so the exporter is a vectorized ``map_batches`` + text write — no shuffle.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")


def ntriples_lines(batch: pa.Table) -> pa.Table:
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    lines = [f"<{_escape(s)}> <{_escape(p)}> <{_escape(o)}> ." for s, p, o in zip(subs, preds, objs)]
    return pa.table({"text": pa.array(lines, pa.string())})


def write_ntriples(triples_ds: rd.Dataset, out_dir: str) -> int:
    """Stream the triples Dataset to sharded .nt files: one writer task per
    block, file named by content sha (idempotent re-runs overwrite the same
    bytes).  Returns the number of lines written."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        lines = ntriples_lines(batch).column("text").to_pylist()
        content = "\n".join(lines) + "\n" if lines else ""
        name = hashlib.sha1(content.encode("utf-8")).hexdigest()[:16]
        if content:
            with open(os.path.join(out_dir, f"part-{name}.nt"), "w") as f:
                f.write(content)
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    counts = triples_ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return int(sum(b["n"][0].as_py() for b in counts.iter_batches(batch_format="pyarrow")))


def to_ntriples_table(triples: pa.Table) -> pa.Table:
    return ntriples_lines(triples)
