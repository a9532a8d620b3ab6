"""lucene_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch, Spark-first re-expression of the indexing/search core of the
reference engine (Apache Lucene, surveyed in SURVEY.md): vectorized tokenize →
invert → per-partition segments (delta/varint + FOR compressed postings with
per-block impact metadata) → sort-merge segment merge with head-term salting →
BM25 (k1=1.2, b=0.75) top-k with block-max pruning.

Nothing here is a translation of the reference's Java execution engine; the
physical strategy is DataFrame/Catalyst (hash aggregation, broadcast joins,
TakeOrderedAndProject) with numpy/Arrow UDFs only for the block codec.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
