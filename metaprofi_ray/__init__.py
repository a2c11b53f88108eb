"""metaprofi_ray — a Ray-Data-native distributed sketch / approximate-
aggregation engine with the query and data-processing capabilities of
kalininalab/metaprofi (reference at /root/reference, studied not copied).

Core: Bloom-filter bank index over pre-tokenized sequence tables
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``,
built as per-batch partial sketches merged by ``groupby(source, shard_id)``
— plus HLL / count-min / t-digest / KLL sibling sketches, exact/theta
containment queries, append updates, per-partition checkpoints, and a suite
of training-data operators (dedup, ANN, text stats) on generic tables.
"""

from .config import SketchConfig  # noqa: F401

__version__ = "0.1.0"
