"""deduper_ray — a Ray-Data-native data-processing / dedup engine.

A from-scratch re-expression of the capabilities of bmiller1009/deduper
(reference at /root/reference, v0.0.41) on top of ray.data.Dataset:

- exact dedup with first-occurrence-wins semantics, seen-hash incremental
  mode, target/dupes/hashes outputs and a DedupeReport
  (reference: Deduper.kt:76-310)
- near-duplicate detection and clustering: shingling, MinHash signatures,
  LSH banding, SimHash / Jaccard verification, union-find clustering
  (the north-rule extension; the reference has none of these)
- text analysis, ANN similarity search, windowed aggregates, joins,
  multimodal column plumbing.

Everything is expressed Ray-Data-first: map_batches over zero-copy Arrow,
actor pools for stateful stages, groupby for the (few, explicit) shuffles.
"""

from deduper_ray.config import DedupeConfig, NearDupConfig
from deduper_ray.report import DedupeReport

__version__ = "0.1.0"

__all__ = ["DedupeConfig", "NearDupConfig", "DedupeReport", "__version__"]
