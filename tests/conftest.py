"""Session-scoped Ray + shared ontology/corpus fixtures.

Ray is initialised ONCE per pytest session (never per test/module);
library code under test must never call ray.init itself.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def artifacts(tmp_path_factory):
    from lmss_entity_extractor_ray.ontology.artifacts import build_artifacts
    from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl

    owl = write_fixture_owl(str(tmp_path_factory.mktemp("owl") / "fixture.owl"))
    return build_artifacts(owl)


@pytest.fixture(scope="session")
def phrase_bank(artifacts):
    from lmss_entity_extractor_ray.pipelines.corpus import make_phrase_bank

    return make_phrase_bank(artifacts)


@pytest.fixture(scope="session")
def small_corpus(artifacts, phrase_bank):
    """200-row deterministic corpus table (FIXTURES.md sf_tiny)."""
    from lmss_entity_extractor_ray.pipelines.corpus import corpus_table

    return corpus_table(200, seed=42, bank=phrase_bank)


@pytest.fixture(scope="session")
def corpus_files(tmp_path_factory, phrase_bank):
    from lmss_entity_extractor_ray.pipelines.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    return write_corpus(out, 200, seed=42, bank=phrase_bank, rows_per_file=25)
