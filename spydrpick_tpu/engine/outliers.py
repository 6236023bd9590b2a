"""Outlier / extreme-outlier thresholds from per-position max MI.

Reference semantics (``maxvaltracker`` mi.hpp:244-290 +
``get_MI_network`` SpydrPick.hpp:148-158):

  * each position tracks the max MI over its pairs with genome distance
    > ld-threshold (mi.hpp:423-427, 447-451); positions that never see
    such a pair keep the accumulator's lowest value (we use -inf, which
    sorts identically);
  * quartile<Q> sorts the n_loci maxima ascending and returns
    ``vals[n_loci / 4 * Q]`` — integer division, an *indexing* quartile,
    not an interpolated one (mi.hpp:267-281);
  * outlier threshold  = Q3 + 1.5 * (Q3 - Q1),
    extreme threshold  = Q3 + 3.0 * (Q3 - Q1)   (Tukey fences,
    SpydrPick.hpp:151-152).
"""

from __future__ import annotations

import numpy as np


def quartile(colmax: np.ndarray, q: int) -> float:
    vals = np.sort(colmax)
    return float(vals[len(vals) // 4 * q])


def outlier_thresholds(colmax: np.ndarray) -> tuple[float, float]:
    q1 = quartile(colmax, 1)
    q3 = quartile(colmax, 3)
    iqr = q3 - q1
    return q3 + 1.5 * iqr, q3 + 3.0 * iqr
