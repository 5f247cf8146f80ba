"""Pure-Python reimplementation of the reference's feature formulas —
the unit-test oracle (SURVEY.md §5.2). Mirrors, with citations:

- Common.cs:14-27   CalculateSlope
- Common.cs:29-60   CalculateAutocorrelation
- MovingAverage.cs:35-48  CalculateDistance (+ NaN/Inf guards :41-45,58-61)
- Price.cs:24-38    location values
- NinjaTrader EMA semantics (seed first value, alpha = 2/(span+1))
"""

from __future__ import annotations

import math

TOL = 1e-6


def _invalid(x: float) -> bool:
    return x is None or math.isnan(x) or math.isinf(x)


def ema(xs: list[float], span: int) -> list[float]:
    alpha = 2.0 / (span + 1.0)
    out = []
    acc = None
    for x in xs:
        acc = x if acc is None else acc + alpha * (x - acc)
        out.append(acc)
    return out


def slope(xs: list[float], tolerance: float = TOL) -> float:
    if len(xs) < 2:
        return 0.0
    first, last = xs[0], xs[-1]
    if abs(first) < tolerance:
        return 0.0
    return (last - first) / first * 100.0


def autocorr(xs: list[float], lag: int = 1) -> float:
    n = len(xs)
    if n <= lag:
        return 0.0
    m = sum_fold(xs) / n
    den = sum_fold([(x - m) * (x - m) for x in xs])
    if abs(den) < TOL:
        return 0.0
    num = sum_fold([(xs[i] - m) * (xs[i - lag] - m) for i in range(lag, n)])
    return num / den


def sum_fold(xs: list[float]) -> float:
    acc = 0.0
    for x in xs:
        acc = acc + x
    return acc


def distance(close: float, ma: float) -> float:
    if _invalid(close) or _invalid(ma):
        return 0.0
    if abs(ma) < TOL:
        return 0.0
    return (close - ma) / ma * 100.0


def location_value(anchor: float, high: float, low: float) -> float:
    rng = high - low
    if abs(rng) < TOL:
        return 0.0
    return (2.0 * anchor - high - low) / rng
