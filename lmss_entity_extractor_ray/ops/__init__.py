"""Large-scale training-data operators (beyond the reference's own surface).

The reference (JustlyAI/lmss_entity_extractor) processes one document per
request; a 100 TB corpus pipeline additionally needs dedup, similarity
search, text analysis and multimodal plumbing.  Every op here is a lazy
Ray Data transform: vectorized ``map_batches`` for the narrow per-row work,
``groupby``-based shuffles only where semantics demand co-location, small
sides broadcast via ``ray.put``.
"""
