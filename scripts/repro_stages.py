import sys
import time

sys.path.insert(0, "/root/repo")

from lmss_entity_extractor_ray.config import DEFAULT_CONFIG
from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor
from lmss_entity_extractor_ray.ontology.artifacts import build_artifacts
from lmss_entity_extractor_ray.ontology.fixture import write_fixture_owl
from lmss_entity_extractor_ray.pipelines.corpus import corpus_table, make_phrase_bank, write_corpus

owl = write_fixture_owl("/tmp/fixture.owl")
art = build_artifacts(owl)
bank = make_phrase_bank(art)

# pure-python extraction speed over the 200 docs
tbl = corpus_table(200, seed=42, bank=bank)
ext = DocumentExtractor(art.gazetteer_surface_forms(), DEFAULT_CONFIG.extractor)
t0 = time.perf_counter()
n_mentions = 0
for t in tbl.column("text").to_pylist():
    n_mentions += len(ext.extract(t or ""))
print("pure-python mentions", n_mentions, "wall", round(time.perf_counter() - t0, 2), flush=True)

import ray

ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from lmss_entity_extractor_ray.pipelines.kg import read_corpus
from lmss_entity_extractor_ray.stages.mention_extractor import MentionExtractor
from lmss_entity_extractor_ray.stages.text_extract import extract_text_batch

files = write_corpus("/tmp/corpus200", 200, seed=42, bank=bank, rows_per_file=25)

t0 = time.perf_counter()
n = (
    read_corpus(files)
    .map_batches(extract_text_batch, batch_format="pyarrow", batch_size=128, zero_copy_batch=True)
    .count()
)
print("text stage rows", n, "wall", round(time.perf_counter() - t0, 2), flush=True)

forms = art.gazetteer_surface_forms()
forms_ref = ray.put(forms)

t0 = time.perf_counter()
ds = (
    read_corpus(files)
    .map_batches(extract_text_batch, batch_format="pyarrow", batch_size=128, zero_copy_batch=True)
    .map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"surface_forms": forms_ref, "cfg": DEFAULT_CONFIG.extractor},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=1,
        num_cpus=1,
    )
)
print("single-actor mentions", ds.count(), "wall", round(time.perf_counter() - t0, 2), flush=True)

t0 = time.perf_counter()
ds = (
    read_corpus(files)
    .map_batches(extract_text_batch, batch_format="pyarrow", batch_size=128, zero_copy_batch=True)
    .map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"surface_forms": forms_ref, "cfg": DEFAULT_CONFIG.extractor},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(2, 8),
        num_cpus=1,
    )
)
print("pool(2,8) mentions", ds.count(), "wall", round(time.perf_counter() - t0, 2), flush=True)
ray.shutdown()
