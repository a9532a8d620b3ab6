"""Training-data pipeline operators over document corpora.

Scale-first building blocks a 100 TB pretraining-data pipeline needs on top
of the search engine: deduplication (exact, MinHash+LSH, SimHash), embedding
similarity search, text analysis (language id, quality, token counts,
fingerprints), and multimodal binary-column plumbing.

Every operator here is expressed with JVM column expressions (or Arrow
UDFs where genuinely needed) and is cross-checkable against ANSI SQL — the
hash primitives are md5-based specifically so an independent engine computes
bit-identical results (see ``lucene_spark.pipeline.hashes``).
"""

# submodules: dedup, similarity, textstats, multimodal, hashes
# (imported explicitly by callers; no eager imports to keep startup light)
