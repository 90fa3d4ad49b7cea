"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the large-scale data-curation layer built alongside
the CDC engine. All hot paths are built-in column expressions; Python appears
only in Arrow-batched pandas UDFs where Spark lacks the primitive."""
