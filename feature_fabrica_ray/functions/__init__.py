"""Vectorized transformation library (full operator parity with the
reference's transform/ package, re-expressed as Arrow kernels —
SURVEY.md §2.2-2.5)."""

from . import registry
from .aggregate import GROUP_REDUCTIONS, GroupByReduce
from .base import (BatchCtx, ColumnRef, Transformation, TransformationError,
                   arrow_type_from_name, as_arrow, as_numpy)
from .datetime import (DateTimeAdd, DateTimeDifference, DateTimeExtract,
                       DateTimeSubtract, DateTimeTrunc, ExtractDayofWeek)
from .generic import (AsType, CoalesceReduce, FeatureImporter,
                      GreatestReduce, LeastReduce)
from .math import (ABSTransform, CeilTransform, ClipTransform, DivideReduce,
                   DivideTransform,
                   ExpTransform, FloorTransform, ImputeTransform,
                   KBinsDiscretize, LogTransform,
                   MaxAbsTransform, MinMaxTransform, MultiplyReduce,
                   PercentRankTransform,
                   PowerTransform, RobustScaleTransform, RoundTransform,
                   ScaleFeature, SignTransform, SqrtTransform,
                   SubtractReduce, SumReduce, TruncTransform,
                   WinsorizeTransform, ZScoreTransform)
from .strings import (BinaryEncode, ConcatenateReduce, Contains, EndsWith,
                      HashBucket,
                      Repeat, Reverse, SplitPart,
                      LabelEncode, OneHotEncode, OrdinalEncode, PadLeft,
                      PadRight, RegexExtract, RegexMatch, RegexReplace,
                      Replace, Split, StartsWith, Strip, StrLen, Substring,
                      ToLower, ToUpper)

__all__ = [
    "registry", "Transformation", "TransformationError", "ColumnRef", "BatchCtx",
    "arrow_type_from_name", "as_arrow", "as_numpy",
    "ScaleFeature", "LogTransform", "ExpTransform", "SqrtTransform",
    "PowerTransform", "ABSTransform", "ClipTransform", "DivideTransform",
    "ZScoreTransform", "MinMaxTransform", "KBinsDiscretize",
    "ImputeTransform", "WinsorizeTransform", "RobustScaleTransform",
    "PercentRankTransform", "MaxAbsTransform",
    "SumReduce", "SubtractReduce", "MultiplyReduce", "DivideReduce",
    "ToLower", "ToUpper", "Strip", "Split", "ConcatenateReduce",
    "OneHotEncode", "LabelEncode", "OrdinalEncode", "BinaryEncode",
    "RegexExtract", "RegexReplace", "RegexMatch", "Substring", "Replace",
    "PadLeft", "PadRight", "StrLen", "Contains", "StartsWith", "EndsWith",
    "SplitPart", "Reverse", "Repeat",
    "DateTimeDifference", "DateTimeAdd", "DateTimeSubtract", "DateTimeExtract",
    "ExtractDayofWeek", "DateTimeTrunc", "AsType", "FeatureImporter",
    "CoalesceReduce", "LeastReduce", "GreatestReduce",
    "GroupByReduce", "GROUP_REDUCTIONS",
]
