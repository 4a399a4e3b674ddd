"""Batched model scoring as an actor-pool stage — the quality-classifier
shape of a training-data pipeline (fasttext-style doc scorers, reward
models): weights load ONCE per actor in ``__init__``, each ``__call__``
scores a whole Arrow batch vectorized.

The bundled model is a deterministic LINEAR scorer over the engine's
quality features (ops/text_ops.quality_scores): logit
``z = w · features + b``, decision ``keep = z > 0`` (≡ sigmoid(z) > 0.5 —
the sigmoid is monotone, so thresholding the logit gives the identical
decision without transcendental functions, keeping the arithmetic
bit-reproducible between numpy and the DuckDB oracle).  The emitted
``logit_e5`` is floor(z·1e5 + 0.5): every term is an IEEE-double product
of an integer feature and a dyadic-rational weight evaluated in the same
order on both sides, so the driver's SQL oracle matches exactly.

A real model swaps ``LinearQualityModel`` for a class whose ``__init__``
loads the weights file and whose ``__call__`` runs batched inference —
the Ray plumbing (actor pool via ``map_batches(Cls, concurrency=N)``)
is identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .arrow_np import col_np
from .text_ops import quality_scores

# dyadic-rational weights (exactly representable doubles) over the
# quality_scores feature columns, in this order
FEATURES = (
    "len_chars",
    "n_tokens",
    "punct_count",
    "avg_token_chars_e5",
    "stopword_ratio_e5",
)
WEIGHTS = (0.00390625, 0.03125, -0.25, 0.0000152587890625, -0.000030517578125)
BIAS = -10.0


class LinearQualityModel:
    """Actor-pool scoring stage: (quality feature columns) → (doc_id,
    logit_e5, keep).  Weights are 'loaded' once per actor."""

    def __init__(self, weights=WEIGHTS, bias=BIAS):
        self.w = np.asarray(weights, dtype=np.float64)
        self.b = float(bias)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = np.full(n, self.b, dtype=np.float64)
        # fixed evaluation order: z = b + w0*f0 + w1*f1 + ... (matches the
        # SQL expression term-for-term for bit-identical doubles)
        for w, name in zip(self.w, FEATURES):
            z = z + w * col_np(batch, name, np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logit_e5": pa.array(
                    np.floor(z * 100_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
                "keep": pa.array((z > 0).astype(np.int32), pa.int32()),
            }
        )


def model_scores(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    """documents(doc_id, text) → (doc_id, logit_e5, keep) through the
    feature stage + the scoring actor pool."""
    return quality_scores(ds).map_batches(
        LinearQualityModel,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
