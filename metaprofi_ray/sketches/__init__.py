"""Mergeable sketch kernels (pure NumPy — no Ray dependency).

Bloom bank (the reference's core structure), plus HLL / CMS / t-digest / KLL
mandated by BASELINE.json north_rule.  Every kernel exposes update / merge /
serialize so the Ray layer can run them as partial-per-batch + groupby-merge
UDAFs (SURVEY.md §2.4 A1).
"""

from . import bloom, cms, hashing, hll  # noqa: F401
from .kll import KLL  # noqa: F401
from .tdigest import TDigest  # noqa: F401
