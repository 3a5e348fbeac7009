"""Example ``--geodesics`` builder for evaluate.py — the plug point for the
official SMPL geodesic GPS metric.

Exact GPS/GPSm needs the SMPL geodesic tables (``Pdist_matrix.pkl`` /
``SMPL_SUBDIV_TRANSFORM.mat`` — external data upstream DensePose downloads
at evaluation time; neither this repo nor the reference ships them, see
evaluate.py's warning banner). This module documents the exact callable
contract with a tiny SYNTHETIC surface metric so the path is exercised in
tests (tests/test_evaluation.py); to use the real metric, copy this file and
replace ``_surface_distance`` with lookups into your copy of the SMPL
tables (dp_I/dp_U/dp_V -> subdivided-vertex index -> Pdist_matrix entry).

    python evaluate.py <model> <ann.json> <imgs> \
        --geodesics tools/geodesics_example.py::build

Contract: ``build()`` returns ``geodist(i1, u1, v1, i2, u2, v2) -> d`` where
all six inputs are broadcastable numpy arrays (part ids 0..24, background 0;
UV in [0, 1]) and ``d`` is elementwise surface distance in mesh units
(charts span ~1 unit; GPS = exp(-d^2 / (2 * 0.255^2)) per point).
"""

import numpy as np

# synthetic cross-part base distance per unit of part-index difference —
# stands in for the geodesic cost of crossing chart boundaries
_CROSS_PART_SCALE = 0.2
# distance assigned when either point is background (no surface location)
_BACKGROUND_DIST = 3.0


def _surface_distance(i1, u1, v1, i2, u2, v2):
    i1, i2 = np.asarray(i1), np.asarray(i2)
    du = np.asarray(u1) - np.asarray(u2)
    dv = np.asarray(v1) - np.asarray(v2)
    d = _CROSS_PART_SCALE * np.abs(i1 - i2) + np.hypot(du, dv)
    return np.where((i1 > 0) & (i2 > 0), d, _BACKGROUND_DIST)


def build():
    """The synthetic example metric (see module docstring)."""
    return _surface_distance


def build_zero():
    """A degenerate 'every point is the same surface point' metric — useful
    as a probe that the plugged callable is actually consumed (GPS must
    saturate at 100 for any detection overlapping any GT)."""
    return lambda i1, u1, v1, i2, u2, v2: np.zeros(np.shape(np.asarray(i1)))
