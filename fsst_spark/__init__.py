"""fsst_spark — a PySpark-native per-column lightweight-compression engine.

Codecs: FSST (Fast Static Symbol Tables), dictionary, RLE,
frame-of-reference, bit-packing — with a stats-driven auto-selector.
All encode/decode runs as vectorized Arrow/numpy kernels inside
``mapInArrow`` tasks; Spark provides scan, partitioning (with explicit
skew salting), and the checkpointable manifest that makes encode jobs
resumable per partition.
"""

from .env import tune_malloc

tune_malloc()

__version__ = "0.1.0"
