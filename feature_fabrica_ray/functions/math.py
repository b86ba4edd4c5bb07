"""Numeric transforms (reference: feature_fabrica/transform/math.py) as
pyarrow.compute kernels — zero-copy per batch, no Python loops.

Self-fitting z-score / min-max / k-bins are global two-phase aggregates
here (partial Welford/t-digest per block -> merge -> broadcast), NOT
per-batch fits — see SURVEY.md §2.3 for why this deliberately diverges
from the reference's batched behavior (math.py:158-167,194-207,223)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import ColumnRef, Transformation, TransformationError, as_arrow, as_numpy

__all__ = ["ScaleFeature", "LogTransform", "ExpTransform", "SqrtTransform",
           "PowerTransform", "ABSTransform", "ClipTransform", "DivideTransform",
           "ZScoreTransform", "MinMaxTransform", "KBinsDiscretize",
           "RoundTransform", "FloorTransform", "CeilTransform",
           "TruncTransform", "SignTransform",
           "SinTransform", "CosTransform", "TanTransform", "Atan2Transform",
           "SumReduce", "SubtractReduce", "MultiplyReduce", "DivideReduce"]


def _f64(data):
    """Promote integer/other arrow arrays to float64 for float-valued kernels
    (matches numpy's float promotion in the reference)."""
    arr = as_arrow(data)
    if pa.types.is_floating(arr.type):
        return arr
    return arr.cast(pa.float64())


class ScaleFeature(Transformation):
    """x * factor (reference: transform/math.py:94-103); factor may be a
    scalar or another feature (broadcast column)."""

    _name_ = "scale"
    _ref_params_ = ("factor",)

    def __init__(self, factor):
        self.factor = factor

    def execute(self, data):
        return pc.multiply(_f64(data), self._scalar_or_col(self.factor))

    def _scalar_or_col(self, v):
        v = self._val(v)
        return _f64(v) if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(v))


class LogTransform(Transformation):
    """Natural log (reference: transform/math.py:106-110)."""

    _name_ = "log"

    def execute(self, data):
        return pc.ln(_f64(data))


class ExpTransform(Transformation):
    """e**x (reference: transform/math.py:113-117)."""

    _name_ = "exp"

    def execute(self, data):
        return pc.exp(_f64(data))


class SqrtTransform(Transformation):
    """sqrt(x) (reference: transform/math.py:120-124)."""

    _name_ = "sqrt"

    def execute(self, data):
        return pc.sqrt(_f64(data))


class PowerTransform(Transformation):
    """x ** power (reference: transform/math.py:127-136)."""

    _name_ = "pow"
    _ref_params_ = ("power",)

    def __init__(self, power):
        self.power = power

    def execute(self, data):
        p = self._val(self.power)
        p = _f64(p) if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(p))
        return pc.power(_f64(data), p)


class ABSTransform(Transformation):
    """|x| (reference: transform/math.py:138-142)."""

    _name_ = "abs"

    def execute(self, data):
        return pc.abs(as_arrow(data))


class ClipTransform(Transformation):
    """clip(x, min, max); bounds may be scalars or features
    (reference: transform/math.py:169-179)."""

    _name_ = "clip"
    _ref_params_ = ("min", "max")

    def __init__(self, min=None, max=None):
        self.min = min
        self.max = max

    def execute(self, data):
        out = _f64(data)
        if self.min is not None:
            mn = self._val(self.min)
            mn = _f64(mn) if isinstance(mn, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(mn))
            out = pc.max_element_wise(out, mn)
        if self.max is not None:
            mx = self._val(self.max)
            mx = _f64(mx) if isinstance(mx, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(mx))
            out = pc.min_element_wise(out, mx)
        return out


class DivideTransform(Transformation):
    """numerator/x or x/denominator — exactly one side bound at init
    (reference: transform/math.py:61-91, init check at math.py:70-72)."""

    _name_ = "divide"
    _ref_params_ = ("numerator", "denominator")

    def __init__(self, numerator=None, denominator=None):
        if (numerator is None) == (denominator is None):
            raise TransformationError(
                "divide: exactly one of numerator/denominator must be given")
        self.numerator = numerator
        self.denominator = denominator

    def execute(self, data):
        x = _f64(data)
        if self.numerator is not None:
            num = self._val(self.numerator)
            num = _f64(num) if isinstance(num, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(num))
            return pc.divide(num, x)
        den = self._val(self.denominator)
        den = _f64(den) if isinstance(den, (pa.Array, pa.ChunkedArray)) else pa.scalar(float(den))
        return pc.divide(x, den)


# ---------------------------------------------------------------------------
# self-fitting two-phase ops
# ---------------------------------------------------------------------------

class ZScoreTransform(Transformation):
    """(x - mean)/std. With mean/std given: stateless (reference:
    math.py:144-157). Without: a GLOBAL two-phase aggregate — the planner
    streams a Welford pass over the chain input and broadcasts the merged
    moments (divergence from per-batch reference noted in module docstring);
    std is population std, matching numpy/SQL stddev_pop."""

    _name_ = "z_score"

    def __init__(self, mean=None, std_dev=None):
        self.mean = mean
        self.std_dev = std_dev

    def fit_request(self):
        return None if self.mean is not None else "moments"

    def set_fitted(self, moments):
        self.mean = moments.mean
        self.std_dev = moments.std

    def execute(self, data):
        if self.mean is None:
            raise TransformationError("z_score not fitted (planner must run fit pass)")
        return pc.divide(pc.subtract(_f64(data), pa.scalar(float(self.mean))),
                         pa.scalar(float(self.std_dev)))


class MinMaxTransform(Transformation):
    """(x - min)/(max - min); same global-fit duality
    (reference: math.py:182-207)."""

    _name_ = "min_max"

    def __init__(self, min=None, max=None):
        self.min = min
        self.max = max

    def fit_request(self):
        return None if self.min is not None else "moments"

    def set_fitted(self, moments):
        self.min = moments.min
        self.max = moments.max

    def execute(self, data):
        if self.min is None:
            raise TransformationError("min_max not fitted")
        lo, hi = float(self.min), float(self.max)
        return pc.divide(pc.subtract(_f64(data), pa.scalar(lo)), pa.scalar(hi - lo))


class MaxAbsTransform(Transformation):
    """x / max(|x|) — sklearn MaxAbsScaler (keeps sign and sparsity, output
    in [-1, 1]). Same global Welford/min-max fit pass as z_score/min_max;
    with ``max_abs`` given: stateless."""

    _name_ = "max_abs"

    def __init__(self, max_abs=None):
        self.max_abs = max_abs

    def fit_request(self):
        return None if self.max_abs is not None else "moments"

    def set_fitted(self, moments):
        self.max_abs = max(abs(moments.min), abs(moments.max))

    def execute(self, data):
        if self.max_abs is None:
            raise TransformationError("max_abs not fitted (planner must run fit pass)")
        if self.max_abs == 0:
            raise TransformationError("max_abs: all-zero column")
        return pc.divide(_f64(data), pa.scalar(float(self.max_abs)))


class ImputeTransform(Transformation):
    """Fill nulls in a numeric column: with ``value`` given, a stateless
    constant fill; with ``strategy='mean'`` (default) or ``'median'``, a
    GLOBAL two-phase fit like z_score/min_max — the planner streams one
    Welford (mean) or quantile (median) pass over the chain input and
    broadcasts the fitted fill value (extension beyond the reference's
    transform set; cf. /root/reference/feature_fabrica/transform/math.py
    for its fitted-scaler duals). The median fit is EXACT by default
    (value-count histogram, ``state/vhist.py`` — SQL-median-identical);
    ``exact=False`` switches to the t-digest scale path for unbounded
    value domains. Output is float64."""

    _name_ = "impute"

    def __init__(self, strategy: str = "mean", value=None, exact=True):
        if strategy not in ("mean", "median", "constant"):
            raise TransformationError(
                f"impute strategy must be mean|median|constant, got {strategy!r}")
        if strategy == "constant" and value is None:
            raise TransformationError("impute(strategy='constant') needs value=")
        self.strategy = strategy
        self.value = value
        self.exact = bool(exact)

    def fit_request(self):
        if self.value is not None or self.strategy == "constant":
            return None
        if self.strategy == "mean":
            return "moments"
        return "quantiles_exact" if self.exact else "quantiles"

    def set_fitted(self, state):
        self.value = state.mean if self.strategy == "mean" \
            else state.quantile(0.5)

    def execute(self, data):
        if self.value is None:
            raise TransformationError("impute not fitted (planner must run fit pass)")
        return pc.fill_null(_f64(data), pa.scalar(float(self.value)))


class WinsorizeTransform(Transformation):
    """Clip x into its fitted global [quantile(lower), quantile(upper)] —
    outlier winsorization (an extension of the reference's fitted-scaler
    family; cf. /root/reference/feature_fabrica/transform/math.py:144-207
    for the two-phase-fit shape it reuses). With ``lo``/``hi`` given:
    stateless clip. ``exact=True`` (default) fits an exact mergeable
    value-count histogram (``state/vhist.py``) — right for bounded value
    domains and oracle-identical to SQL ``quantile_cont``; ``exact=False``
    fits a t-digest for unbounded/continuous domains where the exact
    histogram would exceed its cap. Nulls stay null."""

    _name_ = "winsorize"

    def __init__(self, lower=0.01, upper=0.99, lo=None, hi=None, exact=True):
        if not 0.0 <= float(lower) < float(upper) <= 1.0:
            raise TransformationError(
                f"winsorize needs 0 <= lower < upper <= 1, got {lower}/{upper}")
        self.lower = float(lower)
        self.upper = float(upper)
        self.lo = lo
        self.hi = hi
        self.exact = bool(exact)

    def fit_request(self):
        if self.lo is not None and self.hi is not None:
            return None
        return "quantiles_exact" if self.exact else "quantiles"

    def set_fitted(self, state):
        self.lo = state.quantile(self.lower)
        self.hi = state.quantile(self.upper)

    def execute(self, data):
        if self.lo is None or self.hi is None:
            raise TransformationError("winsorize not fitted (planner must run fit pass)")
        x = pc.max_element_wise(_f64(data), pa.scalar(float(self.lo)),
                                skip_nulls=False)
        return pc.min_element_wise(x, pa.scalar(float(self.hi)),
                                   skip_nulls=False)


class RobustScaleTransform(Transformation):
    """(x - median) / IQR — sklearn RobustScaler semantics, outlier-robust
    dual of z_score. Same global two-phase fit and exact/t-digest duality
    as winsorize; with ``center``/``scale`` given: stateless."""

    _name_ = "robust_scale"

    def __init__(self, center=None, scale=None, exact=True):
        self.center = center
        self.scale = scale
        self.exact = bool(exact)

    def fit_request(self):
        if self.center is not None and self.scale is not None:
            return None
        return "quantiles_exact" if self.exact else "quantiles"

    def set_fitted(self, state):
        self.center = state.quantile(0.5)
        iqr = state.quantile(0.75) - state.quantile(0.25)
        if iqr == 0:
            raise TransformationError("robust_scale: fitted IQR is zero")
        self.scale = iqr

    def execute(self, data):
        if self.center is None or self.scale is None:
            raise TransformationError("robust_scale not fitted (planner must run fit pass)")
        return pc.divide(pc.subtract(_f64(data), pa.scalar(float(self.center))),
                         pa.scalar(float(self.scale)))


class PercentRankTransform(Transformation):
    """Empirical-CDF rank transform (sklearn QuantileTransformer's uniform
    output, SQL ``percent_rank()``): x -> count(values < x) / (N - 1) over
    the GLOBALLY fitted distribution, ties sharing their group's first
    rank. Unlike the scalar-fitted scalers, the broadcast state is the
    value histogram itself (like encoder vocabularies — capped, KB-to-MB
    sized). ``exact=False`` uses the t-digest CDF approximation for
    unbounded value domains. Nulls stay null."""

    _name_ = "percent_rank"

    def __init__(self, exact=True):
        self.state = None
        self.exact = bool(exact)

    def fit_request(self):
        return "quantiles_exact" if self.exact else "quantiles"

    def set_fitted(self, state):
        self.state = state

    def execute(self, data):
        if self.state is None:
            raise TransformationError(
                "percent_rank not fitted (planner must run fit pass)")
        x = _f64(data).to_numpy(zero_copy_only=False)
        nulls = np.isnan(x)
        safe = np.where(nulls, 0.0, x)
        pr = (self.state.percent_rank_of(safe)
              if hasattr(self.state, "percent_rank_of")
              else self.state.cdf(safe))
        return pa.array(pr, pa.float64(), mask=nulls)


class KBinsDiscretize(Transformation):
    """Ordinal k-bins discretization (reference: math.py:209-227, sklearn
    KBinsDiscretizer semantics). strategy='uniform' bins on [min,max];
    'quantile' bins on fitted global quantiles — EXACT by default (value-
    count histogram fit, SQL-quantile_cont-identical edges), t-digest via
    ``exact=False`` for unbounded domains. Edges come from a global fit
    pass; the rightmost bin is closed (x == max -> last bin), matching
    sklearn. Output int32 bin ids."""

    _name_ = "kbins_discretize"

    def __init__(self, n_bins: int = 5, strategy: str = "uniform", edges=None,
                 exact=True):
        if strategy not in ("uniform", "quantile"):
            raise TransformationError(f"kbins strategy {strategy!r} not supported")
        self.n_bins = int(n_bins)
        self.strategy = strategy
        self.edges = list(edges) if edges is not None else None
        self.exact = bool(exact)

    def fit_request(self):
        if self.edges is not None:
            return None
        if self.strategy == "uniform":
            return "moments"
        return "quantiles_exact" if self.exact else "quantiles"

    def set_fitted(self, fitted):
        if self.strategy == "uniform":
            self.edges = list(np.linspace(fitted.min, fitted.max, self.n_bins + 1))
        else:
            qs = np.linspace(0, 1, self.n_bins + 1)
            self.edges = [fitted.quantile(q) for q in qs]

    def execute(self, data):
        if self.edges is None:
            raise TransformationError("kbins not fitted")
        x = as_numpy(_f64(data)).astype(np.float64)
        edges = np.asarray(self.edges, dtype=np.float64)
        bins = np.searchsorted(edges[1:-1], x, side="right").astype(np.int32)
        return pa.array(bins, pa.int32())


class RoundTransform(Transformation):
    """round(x, ndigits) with SQL semantics: ties round HALF AWAY FROM
    ZERO (DuckDB/ANSI round; pyarrow round_mode 'half_towards_infinity'),
    not banker's rounding — pc.round's default half_to_even is overridden.
    Extends the reference's math family (transform/math.py has no
    rounding ops)."""

    _name_ = "round"

    def __init__(self, ndigits: int = 0):
        self.ndigits = int(ndigits)

    def execute(self, data):
        return pc.round(_f64(data), ndigits=self.ndigits,
                        round_mode="half_towards_infinity")


class FloorTransform(Transformation):
    """floor(x) — largest integer-valued float <= x."""

    _name_ = "floor"

    def execute(self, data):
        return pc.floor(_f64(data))


class CeilTransform(Transformation):
    """ceil(x) — smallest integer-valued float >= x."""

    _name_ = "ceil"

    def execute(self, data):
        return pc.ceil(_f64(data))


class TruncTransform(Transformation):
    """trunc(x) — round toward zero (SQL trunc)."""

    _name_ = "trunc"

    def execute(self, data):
        return pc.trunc(_f64(data))


class SignTransform(Transformation):
    """sign(x) in {-1, 0, 1} as float64 (SQL sign; NaN propagates)."""

    _name_ = "sign"

    def execute(self, data):
        return pc.sign(_f64(data))


class SinTransform(Transformation):
    """sin(x), radians — with ``cos`` the cyclical-feature encoder
    (hour-of-day/day-of-week -> a point on the unit circle, so hour 23
    sits next to hour 0 — the standard periodic encoding the reference's
    math family lacks). SQL parity: sin()."""

    _name_ = "sin"

    def execute(self, data):
        return pc.sin(_f64(data))


class CosTransform(Transformation):
    """cos(x), radians (see ``sin`` — the cyclical encoder pair)."""

    _name_ = "cos"

    def execute(self, data):
        return pc.cos(_f64(data))


class TanTransform(Transformation):
    """tan(x), radians. SQL parity: tan()."""

    _name_ = "tan"

    def execute(self, data):
        return pc.tan(_f64(data))


class Atan2Transform(Transformation):
    """atan2(y, x) — recovers the phase angle from a (sin, cos)
    cyclical pair; ``y``/``x`` may be feature references or scalars
    (exactly one side may also be the chained input). SQL parity:
    atan2(y, x)."""

    _name_ = "atan2"
    _ref_params_ = ("y", "x")

    def __init__(self, y=None, x=None):
        if y is None and x is None:
            raise TransformationError("atan2 needs y= and/or x=")
        self.y, self.x = y, x

    def _coerce(self, v):
        v = self._val(v)
        return _f64(v) if isinstance(v, (pa.Array, pa.ChunkedArray)) \
            else pa.scalar(float(v))

    def execute(self, data):
        y = _f64(data) if self.y is None else self._coerce(self.y)
        x = _f64(data) if self.x is None else self._coerce(self.x)
        return pc.atan2(y, x)


# ---------------------------------------------------------------------------
# N-ary elementwise reduces across columns (bound to infix + - * / in the
# expression language; reference: transform/math.py:13-59)
# ---------------------------------------------------------------------------

class _BaseReduce(Transformation):
    _ref_params_ = ("iterable",)
    _kernel = None

    def __init__(self, iterable):
        self.iterable = list(iterable)

    def execute(self):
        vals = []
        for v in self.iterable:
            v = self._val(v)
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                vals.append(_f64(v))
            elif isinstance(v, Transformation):
                raise TransformationError("nested transformation operand not flattened")
            else:
                vals.append(pa.scalar(float(v)))
        out = vals[0]
        for v in vals[1:]:
            out = self._kernel(out, v)
        return out


class SumReduce(_BaseReduce):
    _name_ = "sum_reduce"
    _kernel = staticmethod(pc.add)


class SubtractReduce(_BaseReduce):
    _name_ = "subtract_reduce"
    _kernel = staticmethod(pc.subtract)


class MultiplyReduce(_BaseReduce):
    _name_ = "multiply_reduce"
    _kernel = staticmethod(pc.multiply)


class DivideReduce(_BaseReduce):
    _name_ = "divide_reduce"
    _kernel = staticmethod(pc.divide)
