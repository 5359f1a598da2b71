"""Doc-standardization helpers beyond parse_docs_batch: the ITP/cluster
outlier clamp (A7, /root/reference/lib/indexer/indexdocs.js:549-601)."""

from __future__ import annotations

import math


def percentile(arr: list[float], p: float) -> float:
    """indexdocs.js:588-601 — linear-interpolated percentile of a sorted
    numeric array."""
    if not arr:
        return 0.0
    if p <= 0:
        return arr[0]
    if p >= 1:
        return arr[-1]
    index = (len(arr) - 1) * p
    lower = math.floor(index)
    upper = lower + 1
    weight = index % 1
    if upper >= len(arr):
        return arr[lower]
    return arr[lower] * (1 - weight) + arr[upper] * weight


def non_outlier_bounds(addressnumber: list[list | None]):
    """indexdocs.js:549-579 — percentile fences over a cluster's numbers.

    → (lower_limit, lower_bound, upper_limit, upper_bound, n_outliers)
    """
    error_pct = 0.1
    target_pct = 0.5
    for member in addressnumber:
        if member is None:
            continue
        nums = []
        for n in member:
            try:
                nums.append(int(str(n).strip().split()[0]) if str(n).strip() else None)
            except ValueError:
                digits = "".join(c for c in str(n) if c.isdigit())
                nums.append(int(digits) if digits else None)
        sorted_arr = sorted(v for v in nums if v is not None)
        if not sorted_arr:
            continue
        lower_p = math.floor(percentile(sorted_arr, error_pct))
        upper_p = math.floor(percentile(sorted_arr, 1.0 - error_pct))
        delta = (upper_p - lower_p) / (1.0 - 2.0 * error_pct)
        lower_limit = lower_p - delta * (target_pct + error_pct)
        upper_limit = upper_p + delta * (target_pct + error_pct)
        lower_bound = next((v for v in sorted_arr if v >= lower_limit), None)
        upper_bound = next((v for v in reversed(sorted_arr) if v <= upper_limit), None)
        n_outliers = sum(1 for v in sorted_arr if v < lower_limit or v > upper_limit)
        return lower_limit, lower_bound, upper_limit, upper_bound, n_outliers
    return None, None, None, None, 0


def clamp_range(from_n: int, to_n: int, bounds) -> tuple[int, int]:
    """Clamp an ITP range to the non-outlier bounds when they exist."""
    lower_limit, lower_bound, upper_limit, upper_bound, n_out = bounds
    if n_out == 0 or lower_bound is None:
        return from_n, to_n
    lo, hi = min(from_n, to_n), max(from_n, to_n)
    lo = max(lo, lower_bound)
    hi = min(hi, upper_bound)
    if from_n <= to_n:
        return lo, hi
    return hi, lo
