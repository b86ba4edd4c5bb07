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
           "OneHotEncode", "LabelEncode", "OrdinalEncode", "BinaryEncode",
           "RegexExtract", "RegexReplace", "RegexMatch", "Substring",
           "Replace", "PadLeft", "PadRight", "StrLen", "Contains",
           "StartsWith", "EndsWith", "SplitPart", "Reverse", "Repeat",
           "HashBucket"]


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
# regex / substring family (beyond the reference's five string ops; SQL
# parity documented per class so every one is DuckDB-oracle-checkable)
# ---------------------------------------------------------------------------

def _name_groups(pattern: str) -> str:
    """Rewrite unnamed capture groups ``(`` to named ``(?P<g1>`` etc. so
    pyarrow's ``extract_regex`` (which only addresses NAMED groups) can
    serve integer group indexes. Skips escaped parens, char classes and
    ``(?...)`` extension groups."""
    out, gid, in_class, esc = [], 0, False, False
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if esc:
            out.append(ch); esc = False
        elif ch == "\\":
            out.append(ch); esc = True
        elif in_class:
            out.append(ch)
            if ch == "]":
                in_class = False
        elif ch == "[":
            out.append(ch); in_class = True
        elif ch == "(" and (i + 1 >= n or pattern[i + 1] != "?"):
            gid += 1
            out.append(f"(?P<g{gid}>")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


class RegexExtract(Transformation):
    """Extract a regex group (RE2 syntax): ``group=0`` is the whole
    match, ``group=N`` the Nth capture group, or a named group. No
    match -> '' (DuckDB ``regexp_extract`` parity)."""

    _name_ = "regex_extract"

    def __init__(self, pattern: str, group: int | str = 0):
        if isinstance(group, int) and group == 0:
            self.pattern = f"(?P<g0>{pattern})"
            self.field = "g0"
        elif isinstance(group, int):
            if group < 0:
                raise TransformationError(f"group must be >= 0, got {group}")
            self.pattern = _name_groups(pattern)
            self.field = f"g{group}"
        else:
            self.pattern = pattern
            self.field = group

    def execute(self, data):
        arr = as_arrow(data)
        struct = pc.extract_regex(arr, self.pattern)
        if self.field not in [f.name for f in struct.type]:
            raise TransformationError(
                f"regex_extract: no group {self.field!r} in pattern")
        filled = pc.fill_null(pc.struct_field(struct, self.field), "")
        # no match -> '' (DuckDB parity) but NULL input stays NULL
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pc.if_else(pc.is_valid(arr), filled,
                          pa.nulls(len(arr), pa.string()))


class RegexReplace(Transformation):
    """Replace regex matches (RE2; ``\\1`` backrefs). ``all=True``
    replaces every occurrence (DuckDB ``regexp_replace(..., 'g')``),
    ``all=False`` only the first (DuckDB default)."""

    _name_ = "regex_replace"

    def __init__(self, pattern: str, replacement: str = "", all: bool = True):
        self.pattern = pattern
        self.replacement = replacement
        self.max = -1 if all else 1

    def execute(self, data):
        return pc.replace_substring_regex(
            as_arrow(data), self.pattern, self.replacement,
            max_replacements=self.max)


class RegexMatch(Transformation):
    """True where the regex matches anywhere in the string (DuckDB
    ``regexp_matches`` parity)."""

    _name_ = "regex_match"

    def __init__(self, pattern: str):
        self.pattern = pattern

    def execute(self, data):
        return pc.match_substring_regex(as_arrow(data), self.pattern)


class Substring(Transformation):
    """1-based SQL ``substr(s, start[, length])``; ``length`` omitted
    takes the rest of the string (codepoint semantics)."""

    _name_ = "substr"

    def __init__(self, start: int = 1, length: int | None = None):
        if start < 1:
            raise TransformationError(
                f"substr: start is 1-based, got {start}")
        if length is not None and length < 0:
            raise TransformationError(
                f"substr: length must be >= 0, got {length}")
        self.start = start
        self.length = length

    def execute(self, data):
        stop = None if self.length is None else self.start - 1 + self.length
        return pc.utf8_slice_codeunits(as_arrow(data), self.start - 1, stop)


class Replace(Transformation):
    """Literal substring replacement of EVERY occurrence (SQL
    ``replace(s, old, new)`` parity)."""

    _name_ = "replace"

    def __init__(self, old: str, new: str = ""):
        if not old:
            raise TransformationError("replace: old must be non-empty")
        self.old = old
        self.new = new

    def execute(self, data):
        return pc.replace_substring(as_arrow(data), self.old, self.new)


class _PadBase(Transformation):
    _side_ = ""

    def __init__(self, width: int, fill: str = " "):
        if width < 0:
            raise TransformationError(f"pad: width must be >= 0, got {width}")
        if len(fill) != 1:
            raise TransformationError("pad: fill must be a single character")
        self.width = width
        self.fill = fill

    def execute(self, data):
        arr = as_arrow(data)
        pad = (pc.utf8_lpad if self._side_ == "l" else pc.utf8_rpad)(
            arr, self.width, self.fill)
        # SQL lpad/rpad TRUNCATE to width when the input is longer;
        # Arrow's pad kernels never truncate, so slice to width after.
        return pc.utf8_slice_codeunits(pad, 0, self.width)


class PadLeft(_PadBase):
    """SQL ``lpad(s, width, fill)`` incl. its truncate-to-width rule."""

    _name_ = "lpad"
    _side_ = "l"


class PadRight(_PadBase):
    """SQL ``rpad(s, width, fill)`` incl. its truncate-to-width rule."""

    _name_ = "rpad"
    _side_ = "r"


class SplitPart(Transformation):
    """SQL ``split_part(s, sep, n)``: the 1-based nth field after
    splitting on the literal separator; out-of-range -> '' (DuckDB
    parity). One split + one list-slice + one join kernel."""

    _name_ = "split_part"

    def __init__(self, sep: str, n: int):
        if not sep:
            raise TransformationError("split_part: sep must be non-empty")
        if n < 1:
            raise TransformationError(f"split_part: n is 1-based, got {n}")
        self.sep = sep
        self.n = n

    def execute(self, data):
        parts = pc.split_pattern(as_arrow(data), self.sep)
        sliced = pc.list_slice(parts, self.n - 1, self.n)
        return pc.binary_join(sliced, "")


class Reverse(Transformation):
    """Codepoint reversal (SQL ``reverse`` on ASCII/BMP text)."""

    _name_ = "reverse"

    def execute(self, data):
        return pc.utf8_reverse(as_arrow(data))


class Repeat(Transformation):
    """SQL ``repeat(s, n)``; n = 0 gives ''."""

    _name_ = "repeat"

    def __init__(self, n: int):
        if n < 0:
            raise TransformationError(f"repeat: n must be >= 0, got {n}")
        self.n = n

    def execute(self, data):
        return pc.binary_repeat(as_arrow(data), self.n)


class StrLen(Transformation):
    """Codepoint length (DuckDB ``length()`` chars, not bytes)."""

    _name_ = "str_len"

    def execute(self, data):
        return pc.cast(pc.utf8_length(as_arrow(data)), pa.int64())


class Contains(Transformation):
    """True where the literal substring occurs (SQL ``contains``)."""

    _name_ = "contains"

    def __init__(self, sub: str):
        self.sub = sub

    def execute(self, data):
        return pc.match_substring(as_arrow(data), self.sub)


class StartsWith(Transformation):
    """True where the string starts with the literal prefix."""

    _name_ = "starts_with"

    def __init__(self, prefix: str):
        self.prefix = prefix

    def execute(self, data):
        return pc.starts_with(as_arrow(data), self.prefix)


class EndsWith(Transformation):
    """True where the string ends with the literal suffix."""

    _name_ = "ends_with"

    def __init__(self, suffix: str):
        self.suffix = suffix

    def execute(self, data):
        return pc.ends_with(as_arrow(data), self.suffix)


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


class HashBucket(Transformation):
    """Hashing-trick categorical encoder (sklearn FeatureHasher /
    HashingVectorizer idea): ``bucket = hash(value) % n_buckets`` as
    int32, NULL in -> NULL out. The fit-free encoder for
    high-cardinality categoricals whose vocabulary would not fit a
    broadcast (label_encode's scale escape): no fit pass, no state, no
    shuffle — a pure stateless map with deterministic collisions.

    ``method="hash64"`` (default) is the vectorized scale path;
    ``method="md5"`` buckets on ``int(md5_hex(str(v))[:8], 16)`` so the
    assignment is replicable in ANSI SQL:
    ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UBIGINT % n``.
    """

    _name_ = "hash_bucket"

    def __init__(self, n_buckets: int, method: str = "hash64",
                 seed: int = 0):
        if int(n_buckets) < 1:
            raise TransformationError(
                f"hash_bucket: n_buckets must be >= 1, got {n_buckets}")
        if method not in ("hash64", "md5"):
            raise TransformationError(
                f"hash_bucket: unknown method {method!r}")
        self.n_buckets = int(n_buckets)
        self.method = method
        self.seed = int(seed)

    def execute(self, data):
        arr = as_arrow(data)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if self.method == "md5":
            from ..pipelines.sampling import md5_hex_column

            hexes = md5_hex_column(arr)
            vals = [None if h is None else int(h[:8], 16) % self.n_buckets
                    for h in hexes.to_pylist()]
            return pa.array(vals, pa.int32())
        from ..state import hash64

        b = (hash64(arr, seed=self.seed)
             % np.uint64(self.n_buckets)).astype(np.int32)
        return pc.if_else(pc.is_valid(arr), pa.array(b, pa.int32()),
                          pa.nulls(len(arr), pa.int32()))
