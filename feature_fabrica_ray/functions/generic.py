"""Generic transforms: dtype cast and cross-feature import
(reference: feature_fabrica/transform/generic.py, importer.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import (ColumnRef, Transformation, TransformationError, arrow_type_from_name,
                   as_arrow)

__all__ = ["AsType", "FeatureImporter"]


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
