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
from lmss_entity_extractor_ray.pipelines.kg import read_corpus
from lmss_entity_extractor_ray.stages.text_extract import extract_text_batch
from lmss_entity_extractor_ray.stages.mention_extractor import MentionExtractor

print("t0", flush=True)
owl = write_fixture_owl("/tmp/fixture.owl")
art = build_artifacts(owl)
bank = make_phrase_bank(art)
print("artifacts built", len(art.iris), "bank", len(bank), flush=True)
files = write_corpus("/tmp/corpus200", 200, seed=42, bank=bank, rows_per_file=25)
print("corpus written", len(files), flush=True)

# local (no ray) extraction over the corpus to time the pure-python path
import pyarrow.parquet as pq
from lmss_entity_extractor_ray.extraction.extractor import DocumentExtractor

forms = art.gazetteer_surface_forms()
t0 = time.perf_counter()
de = DocumentExtractor(forms)
nm = 0
for p in files:
    tbl = pq.read_table(p)
    for t in tbl.column("text").to_pylist():
        nm += len(de.extract(t or ""))
print("local extract mentions", nm, "wall", round(time.perf_counter() - t0, 2), flush=True)

t0 = time.perf_counter()
ds = read_corpus(files)
ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=128, zero_copy_batch=True)
print("text rows", ds.count(), "wall", round(time.perf_counter() - t0, 2), flush=True)

t0 = time.perf_counter()
forms_ref = ray.put(forms)
ds2 = ds.map_batches(
    MentionExtractor,
    fn_constructor_kwargs={"surface_forms": forms_ref},
    batch_format="pyarrow",
    batch_size=128,
    concurrency=(1, 2),
    num_cpus=1,
)
print("mentions", ds2.count(), "wall", round(time.perf_counter() - t0, 2), flush=True)
ray.shutdown()
print("done", flush=True)
