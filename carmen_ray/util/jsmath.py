"""JavaScript-compatible float helpers.

Carmen's ranking math runs on JS doubles with JS rounding rules
(Math.round rounds half toward +Infinity; Math.fround clamps to float32 —
/root/reference/lib/text-processing/termops.js:969). Python's round()
does banker's rounding, so every place the reference rounds we go
through these helpers to stay bit-exact.
"""

from __future__ import annotations

import math

import numpy as np


def js_round(x: float) -> float:
    """JS Math.round: half-up toward +Infinity (Math.round(-1.5) === -1)."""
    if math.isnan(x):
        return math.nan
    return math.floor(x + 0.5)


def fround(x: float) -> float:
    """JS Math.fround: round-trip through IEEE float32."""
    return float(np.float32(x))


def round_to(num: float, places: int) -> float:
    """Port of /root/reference/lib/util/round-to.js:10-13 (JS semantics)."""
    mult = 10.0 ** places
    return js_round(num * mult) / mult
