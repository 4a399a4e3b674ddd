import sys
import time

sys.path.insert(0, "/root/repo")
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from lmss_entity_extractor_ray.ontology.artifacts import build_artifacts
from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl
from lmss_entity_extractor_ray.pipelines.corpus import make_phrase_bank, write_corpus
from lmss_entity_extractor_ray.pipelines.kg import (
    broadcast_artifacts,
    mentions_dataset,
    read_corpus,
    triples_dataset,
)

owl = write_fixture_owl("/tmp/fixture.owl")
art = build_artifacts(owl)
bank = make_phrase_bank(art)
files = write_corpus("/tmp/corpus200", 200, seed=42, bank=bank, rows_per_file=25)

t0 = time.perf_counter()
forms_ref, _ = broadcast_artifacts(art)
m = mentions_dataset(read_corpus(files), forms_ref)
print("mentions", m.count(), "wall", round(time.perf_counter() - t0, 2), flush=True)

t0 = time.perf_counter()
ds = triples_dataset(read_corpus(files), art, global_dedup=False)
df = ds.to_pandas()
print("triples-nodedup", len(df), "wall", round(time.perf_counter() - t0, 2), flush=True)

t0 = time.perf_counter()
ds = triples_dataset(read_corpus(files), art, global_dedup=True)
df = ds.to_pandas()
print("triples-dedup", len(df), "wall", round(time.perf_counter() - t0, 2), flush=True)
ray.shutdown()
