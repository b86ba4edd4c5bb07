"""Generic transforms: dtype cast and cross-feature import
(reference: feature_fabrica/transform/generic.py, importer.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import (ColumnRef, Transformation, TransformationError, arrow_type_from_name,
                   as_arrow)

__all__ = ["AsType", "FeatureImporter", "CoalesceReduce", "LeastReduce",
           "GreatestReduce"]


class _ElementwiseNaryBase(Transformation):
    """N-ary elementwise SQL-function family over bound operands or a
    tuple input ``(a, b).fn()`` — same operand plumbing as concat
    (strings.py::ConcatenateReduce)."""

    _ref_params_ = ("iterable",)
    _kernel = None

    def __init__(self, iterable=None):
        self.iterable = list(iterable) if iterable is not None else None

    def execute(self, data=None):
        if self.iterable is not None:
            vals = [as_arrow(self._val(v)) for v in self.iterable]
        elif isinstance(data, (list, tuple)):
            vals = [as_arrow(v) for v in data]
        else:
            raise TransformationError(f"{self._name_}: no operands bound")
        if len(vals) < 2:
            raise TransformationError(f"{self._name_}: needs >= 2 operands")
        return self._kernel(*vals)


class CoalesceReduce(_ElementwiseNaryBase):
    """SQL ``coalesce(a, b, ...)``: first non-null per row."""

    _name_ = "coalesce"
    _kernel = staticmethod(pc.coalesce)


class LeastReduce(_ElementwiseNaryBase):
    """SQL ``least(a, b, ...)``: per-row minimum, nulls skipped
    (all-null row -> null — DuckDB parity)."""

    _name_ = "least"
    _kernel = staticmethod(pc.min_element_wise)


class GreatestReduce(_ElementwiseNaryBase):
    """SQL ``greatest(a, b, ...)``: per-row maximum, nulls skipped
    (all-null row -> null — DuckDB parity)."""

    _name_ = "greatest"
    _kernel = staticmethod(pc.max_element_wise)


class AsType(Transformation):
    """Explicit cast to a numpy-named dtype, validated at construction
    (reference: transform/generic.py:7-17)."""

    _name_ = "astype"

    def __init__(self, dtype: str):
        self.dtype = dtype
        self._pa_type = arrow_type_from_name(dtype)  # validates eagerly

    def execute(self, data):
        return pc.cast(as_arrow(data), self._pa_type, safe=False)


class FeatureImporter(Transformation):
    """Nullary import of 1..N dependency columns, optionally at an
    intermediate stage ``feat:stage`` (reference: transform/importer.py:16-77).

    With one feature it returns that column (a zero-copy batch lookup —
    the reference's np stacking with dtype promotion collapses to Arrow
    columns living side by side). With several it returns the list of
    columns for a downstream N-ary op (e.g. concat)."""

    _name_ = "import"
    _ref_params_ = ("features",)

    def __init__(self, feature: str | None = None, features=None, stage: str | None = None):
        if feature is not None and features is not None:
            raise TransformationError("import: give feature or features, not both")
        names = [feature] if feature is not None else list(features or [])
        if not names:
            raise TransformationError("import: no features given")
        if stage:
            names = [f"{n}:{stage}" for n in names]
        self.features = names

    def compile(self, feature_names: set[str]) -> None:
        self.features = [ColumnRef(n) if isinstance(n, str) else n for n in self.features]

    def execute(self):
        vals = [self._val(f) for f in self.features]
        return vals[0] if len(vals) == 1 else vals
