"""lmss_entity_extractor_ray — a Ray-Data-native knowledge-graph construction engine.

Brand-new engine (not a port) with the query/data-processing capabilities of
``JustlyAI/lmss_entity_extractor`` (reference snapshot at /root/reference):
stream a Parquet corpus of web pages ``(url, warc_ts, html, text, lang)`` as a
``ray.data.Dataset``, extract text byte-identically per url, generate mention
candidates (gazetteer Aho-Corasick + rule chunkers + tf keywords), merge spans
with the reference's precedence rules, link mentions to LMSS ontology classes
(embedding cosine + token-set-ratio fuzzy, fast-path semantics preserved), and
materialize deduplicated ``(subj=url, pred, obj=IRI)`` triples as partitioned
Parquet with per-partition manifests.

Design blueprint: /root/repo/SURVEY.md.  IMPORTANT: this module must never call
``ray.init()`` — the driver owns the Ray session.
"""

__version__ = "0.1.0"
