"""Transformation base: vectorized column -> column operators over Arrow.

Semantics mirror the reference's ``Transformation`` contract (reference:
feature_fabrica/transform/base.py:23-126): an operator either consumes the
chain's running value (``expects_data`` — ``execute(data)``) or is nullary
(inputs bound at compile time, e.g. FeatureImporter). Compile rewrites
string parameters that name other features into ``ColumnRef``s (the
reference's PromiseValue wiring, base.py:54-62) — at batch time a ColumnRef
is just a zero-copy column lookup in the Arrow batch context.

Unlike the reference (NumPy, in-process), execution here happens inside
``ray.data.Dataset.map_batches(batch_format="pyarrow")``; operators receive
and return ``pyarrow.Array``/numpy and must be pure w.r.t. the batch so Ray
can retry tasks idempotently.

Self-fitting operators (z-score/min-max/kbins/encoders without explicit
parameters) additionally implement ``fit_request()``/``set_fitted()`` and
are resolved by the planner as global two-phase aggregates — a deliberate,
documented divergence from the reference's per-batch refitting
(reference: feature_fabrica/transform/math.py:158-167,223; SURVEY.md §2.3).
"""

from __future__ import annotations

import inspect
from typing import Any

import numpy as np
import pyarrow as pa

from . import registry

__all__ = ["Transformation", "ColumnRef", "BatchCtx", "as_numpy", "as_arrow",
           "arrow_type_from_name", "TransformationError"]


class TransformationError(RuntimeError):
    pass


def arrow_type_from_name(name: str) -> pa.DataType:
    """Map a spec dtype name (numpy-style, per the reference's
    FeatureSpec.data_type) to an Arrow type."""
    if name in ("str", "str_", "unicode", "string", "object"):
        return pa.string()
    if name in ("bytes", "binary"):
        return pa.binary()
    if name.startswith("datetime64"):
        unit = name[len("datetime64["):-1] if "[" in name else "us"
        return pa.timestamp(unit)
    if name.startswith("timedelta64"):
        unit = name[len("timedelta64["):-1] if "[" in name else "us"
        return pa.duration(unit)
    try:
        return pa.from_numpy_dtype(np.dtype(name))
    except (TypeError, ValueError) as e:
        raise TransformationError(f"unknown dtype name {name!r}") from e


def as_numpy(x):
    """Arrow -> numpy (zero-copy when possible; strings become object)."""
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if isinstance(x, pa.Array):
        return x.to_numpy(zero_copy_only=False)
    return np.asarray(x)


def as_arrow(x, ty: pa.DataType | None = None):
    """numpy / list / Arrow -> pa.Array (2-D numpy -> FixedSizeList)."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x if ty is None else x.cast(ty)
    arr = np.asarray(x) if not isinstance(x, (list, tuple)) else x
    if isinstance(arr, np.ndarray) and arr.ndim == 2:
        flat = pa.array(arr.reshape(-1))
        return pa.FixedSizeListArray.from_arrays(flat, arr.shape[1])
    return pa.array(arr, type=ty)


class BatchCtx:
    """Per-batch name -> Arrow column context (raw inputs + computed
    features + published ``feat:stage`` intermediates)."""

    __slots__ = ("cols", "num_rows")

    def __init__(self, batch: pa.Table):
        self.cols: dict[str, Any] = {name: batch.column(i)
                                     for i, name in enumerate(batch.column_names)}
        self.num_rows = batch.num_rows

    def get(self, name: str):
        try:
            return self.cols[name]
        except KeyError:
            raise TransformationError(
                f"column/feature {name!r} not available; have {sorted(self.cols)}") from None

    def put(self, name: str, value) -> None:
        self.cols[name] = as_arrow(value)

    def to_table(self, names: list[str] | None = None) -> pa.Table:
        names = names if names is not None else list(self.cols)
        return pa.table({n: as_arrow(self.cols[n]) for n in names})


class ColumnRef:
    """Compile-time reference to another feature (optionally one of its
    intermediate stages, ``feat:stage``) — the Ray analogue of the
    reference's PromiseValue (features.py:32-87): resolution is a column
    lookup, not a lazily-executed object."""

    __slots__ = ("feature", "stage")

    def __init__(self, spec: str):
        self.feature, _, stage = spec.partition(":")
        self.stage = stage or None

    @property
    def key(self) -> str:
        return f"{self.feature}:{self.stage}" if self.stage else self.feature

    def resolve(self, ctx: BatchCtx):
        return ctx.get(self.key)

    def __repr__(self):
        return f"ColumnRef({self.key})"


class Transformation:
    """Base vectorized operator. Subclass, set ``_name_``, define
    ``execute(self, data)`` (or nullary ``execute(self)``) — auto-registered
    for YAML/expression use, same extension contract as the reference
    (transform/base.py:31-33, README.md:95-115)."""

    _name_: str | None = None
    # names of constructor params that may reference other features
    _ref_params_: tuple[str, ...] = ()

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if cls.__dict__.get("_name_"):
            registry.register(cls._name_, cls)

    # -- compile ----------------------------------------------------------
    def compile(self, feature_names: set[str]) -> None:
        """Rewrite string params naming features into ColumnRefs (the
        reference's promise wiring, base.py:54-62)."""
        for attr in self._ref_params_:
            v = getattr(self, attr, None)
            if isinstance(v, str) and _is_feature_ref(v, feature_names):
                setattr(self, attr, ColumnRef(v))
            elif isinstance(v, (list, tuple)):
                setattr(self, attr, [
                    ColumnRef(it) if isinstance(it, str) and _is_feature_ref(it, feature_names)
                    else it for it in v])

    @property
    def expects_data(self) -> bool:
        sig = inspect.signature(self.execute)
        n = len([p for p in sig.parameters.values()
                 if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)])
        if n > 1:
            raise TransformationError(
                f"{type(self).__name__}.execute must take 0 or 1 data args, has {n}")
        return n == 1

    def references(self) -> list[ColumnRef]:
        out = []
        for attr in self._ref_params_:
            v = getattr(self, attr, None)
            if isinstance(v, ColumnRef):
                out.append(v)
            elif isinstance(v, (list, tuple)):
                out.extend(x for x in v if isinstance(x, ColumnRef))
        return out

    # -- two-phase fit hooks (overridden by self-fitting ops) -------------
    def fit_request(self) -> str | None:
        """None, or one of {"moments", "distinct", "quantiles"} — global
        aggregate of this op's input the planner must provide before
        execution."""
        return None

    def set_fitted(self, fitted: Any) -> None:  # pragma: no cover
        raise NotImplementedError

    # -- execute ----------------------------------------------------------
    def __call__(self, data, ctx: BatchCtx):
        self._ctx = ctx
        try:
            return self.execute(data) if self.expects_data else self.execute()
        finally:
            self._ctx = None

    def _val(self, v):
        """Resolve a (possibly ColumnRef) parameter to a batch value."""
        if isinstance(v, ColumnRef):
            return v.resolve(self._ctx)
        return v

    def execute(self, data):  # pragma: no cover
        raise NotImplementedError


def _is_feature_ref(s: str, feature_names: set[str]) -> bool:
    return s in feature_names or s.partition(":")[0] in feature_names
