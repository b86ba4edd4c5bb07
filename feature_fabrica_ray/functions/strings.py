"""String transforms and categorical encoders (reference:
feature_fabrica/transform/string.py) over Arrow string kernels.

Encoders with explicit ``categories`` are stateless per-batch maps
(sorted categories, deterministic — reference string.py:78,103,127,151).
Without categories they are global two-phase: the planner collects the
globally-sorted distinct values of the input (a groupby-style aggregate of
per-block distincts) and broadcasts them — equivalent to fitting on the
whole dataset, invariant to partitioning (the reference fits per batch,
see SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Transformation, TransformationError, as_arrow, as_numpy

__all__ = ["ToLower", "ToUpper", "Strip", "Split", "ConcatenateReduce",
           "OneHotEncode", "LabelEncode", "OrdinalEncode", "BinaryEncode"]


class ToLower(Transformation):
    """lowercase (reference: transform/string.py:13-17)."""

    _name_ = "lower"

    def execute(self, data):
        return pc.utf8_lower(as_arrow(data))


class ToUpper(Transformation):
    """uppercase (reference: transform/string.py:20-24)."""

    _name_ = "upper"

    def execute(self, data):
        return pc.utf8_upper(as_arrow(data))


class Strip(Transformation):
    """strip chars (default whitespace) from both ends
    (reference: transform/string.py:48-56)."""

    _name_ = "strip"

    def __init__(self, chars: str | None = None):
        self.chars = chars

    def execute(self, data):
        arr = as_arrow(data)
        if self.chars is None:
            return pc.utf8_trim_whitespace(arr)
        return pc.utf8_trim(arr, self.chars)


class Split(Transformation):
    """split on a delimiter -> list<string> column
    (reference: transform/string.py:59-67; object-array of lists there,
    a proper Arrow list type here)."""

    _name_ = "split"

    def __init__(self, delimiter: str = " "):
        self.delimiter = delimiter

    def execute(self, data):
        return pc.split_pattern(as_arrow(data), self.delimiter)


class ConcatenateReduce(Transformation):
    """Elementwise string concatenation across N columns
    (reference: transform/string.py:26-46, reduce(np.char.add));
    nullary form with bound operands, or unary over a list column."""

    _name_ = "concat"
    _ref_params_ = ("iterable",)

    def __init__(self, iterable=None, axis: int = 0):
        self.iterable = list(iterable) if iterable is not None else None
        self.axis = axis  # kept for reference-API parity; elementwise either way

    def execute(self, data=None):
        if self.iterable is not None:
            vals = [as_arrow(self._val(v)) for v in self.iterable]
        elif isinstance(data, (list, tuple)):
            vals = [as_arrow(v) for v in data]  # tuple input: (a, b).concat()
        else:
            raise TransformationError("concat: no operands bound")
        return pc.binary_join_element_wise(*vals, "")


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

class _CategoricalBase(Transformation):
    def __init__(self, categories=None, handle_unknown: str = "error"):
        self.categories = sorted(categories) if categories is not None else None
        if handle_unknown not in ("error", "ignore", "use_encoded_value"):
            raise TransformationError(f"handle_unknown={handle_unknown!r} invalid")
        self.handle_unknown = handle_unknown

    def fit_request(self):
        return None if self.categories is not None else "distinct"

    def set_fitted(self, distinct_values):
        self.categories = sorted(v for v in distinct_values if v is not None)

    def _codes(self, data) -> np.ndarray:
        """int codes into sorted categories; unknown -> -1 (then handled
        per policy). Vectorized via searchsorted on the sorted vocab."""
        if self.categories is None:
            raise TransformationError(f"{self._name_} not fitted")
        vals = as_numpy(as_arrow(data)).astype(object)
        cats = np.array(self.categories, dtype=object)
        idx = np.searchsorted(cats, vals)
        idx_clip = np.clip(idx, 0, len(cats) - 1)
        known = cats[idx_clip] == vals
        codes = np.where(known, idx_clip, -1).astype(np.int64)
        if self.handle_unknown == "error" and (codes < 0).any():
            bad = sorted({v for v in vals[codes < 0]})[:5]
            raise TransformationError(f"unknown categories {bad} (handle_unknown='error')")
        return codes


class OneHotEncode(_CategoricalBase):
    """dense one-hot int32 matrix -> fixed_size_list<int32>[k]
    (reference: transform/string.py:70-93; handle_unknown='ignore' yields
    an all-zeros row, matching sklearn)."""

    _name_ = "one_hot"

    def execute(self, data):
        codes = self._codes(data)
        k = len(self.categories)
        out = np.zeros((codes.size, k), dtype=np.int32)
        valid = codes >= 0
        out[np.nonzero(valid)[0], codes[valid]] = 1
        return pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1), pa.int32()), k)


class LabelEncode(_CategoricalBase):
    """int32 codes into the sorted vocabulary
    (reference: transform/string.py:96-116)."""

    _name_ = "label_encode"

    def execute(self, data):
        return pa.array(self._codes(data).astype(np.int32), pa.int32())


class OrdinalEncode(_CategoricalBase):
    """sklearn OrdinalEncoder semantics — same sorted-vocab codes; unknowns
    become -1 with handle_unknown='use_encoded_value'
    (reference: transform/string.py:119-140)."""

    _name_ = "ordinal_encode"

    def execute(self, data):
        return pa.array(self._codes(data).astype(np.int32), pa.int32())


class BinaryEncode(_CategoricalBase):
    """bit-encode the category index into ceil(log2 k) int32 columns ->
    fixed_size_list<int32> (reference: transform/string.py:143-191)."""

    _name_ = "binary_encode"

    def execute(self, data):
        codes = self._codes(data)
        k = max(len(self.categories), 2)
        nbits = int(np.ceil(np.log2(k)))
        shifted = (codes[:, None] >> np.arange(nbits - 1, -1, -1)[None, :]) & 1
        shifted[codes < 0] = 0
        return pa.FixedSizeListArray.from_arrays(
            pa.array(shifted.reshape(-1).astype(np.int32), pa.int32()), nbits)
