"""Outlier / extreme-outlier thresholds from per-position max MI.

Reference semantics (``maxvaltracker`` mi.hpp:244-290 +
``get_MI_network`` SpydrPick.hpp:148-158):

  * each position tracks the max MI over its pairs with genome distance
    > ld-threshold (mi.hpp:423-427, 447-451); positions that never see
    such a pair keep the accumulator's lowest value.  The reference's
    boost ``acc::max`` yields ``lowest()`` (-1.8e308 for double) from
    an empty accumulator — NOT -inf.  The sweep accumulates with -inf
    (sorts identically), but the quartiles must map it back to
    ``lowest()``: with more than 3/4 of positions empty the reference
    computes Q3 = Q1 = lowest() -> IQR = 0 -> threshold = lowest(),
    flagging EVERY stored edge as outlier, whereas -inf would give
    IQR = NaN and flag none (with only Q1 empty, both give +inf/
    overflow and agree: no outliers);
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
    vals = np.sort(np.where(np.isneginf(colmax),
                            np.finfo(np.float64).min, colmax))
    return float(vals[len(vals) // 4 * q])


def outlier_thresholds(colmax: np.ndarray) -> tuple[float, float]:
    q1 = quartile(colmax, 1)
    q3 = quartile(colmax, 3)
    iqr = q3 - q1
    return q3 + 1.5 * iqr, q3 + 3.0 * iqr
