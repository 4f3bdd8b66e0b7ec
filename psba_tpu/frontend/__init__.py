"""SfM front-end: jitted feature detection, matching, two-view geometry.

The reference has no front-end (problems arrive as text files); this
package implements the BASELINE.json north-star requirement that "upstream
feature detect+match and pose-graph stages feed the BA core as jitted JAX
pipelines": Harris corners + patch descriptors (features.py), mutual
nearest-neighbor matching with ratio test (matching.py), normalized
8-point essential-matrix estimation with cheirality-checked decomposition
and DLT triangulation (twoview.py), and an incremental pipeline that
chains pairwise poses into a BAProblem (pipeline.py).
"""

from psba_tpu.frontend.features import detect_and_describe, harris_corners
from psba_tpu.frontend.matching import match_descriptors
from psba_tpu.frontend.twoview import (
    decompose_essential,
    essential_8pt,
    triangulate,
)
from psba_tpu.frontend.pipeline import build_problem_from_tracks, two_view_problem

__all__ = [
    "harris_corners",
    "detect_and_describe",
    "match_descriptors",
    "essential_8pt",
    "decompose_essential",
    "triangulate",
    "two_view_problem",
    "build_problem_from_tracks",
]
