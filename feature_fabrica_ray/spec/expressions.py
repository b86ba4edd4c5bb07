"""The spec-side expression mini-language.

Re-implements the semantics of the reference's infix expression front end
(reference: feature_fabrica/_internal/instantiate/expressions/
fefa_expressions.py:16-239, token pattern at expressions/utils.py:19,
operator table at expressions/utils.py:8-14) as a plain
tokenizer -> shunting-yard -> AST compiler. Supported forms:

    (feature_a + 2 * feature_b) / 2        infix ops over features/numbers
    ().upper().lower().one_hot(categories=['a','b'])   chain on own input
    (feature_e:upper, feature_e:lower).concat()        tuple -> N-ary op
    ().group_reduce(key_feature='k', agg='mean')       window aggregate

``()`` means "the feature's own raw input column"; ``feat:stage``
references another feature's intermediate stage output; function kwargs are
Python literals (ast.literal_eval) with bare identifiers accepted as
strings; positional args are rejected (reference: fefa_expressions.py:95-119).

The AST is PURE COMPILE-TIME (driver-side): evaluation happens later inside
``map_batches`` via Node.eval over Arrow batch contexts — the expression
language never executes per row (SURVEY.md §2.8)."""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import registry
from ..functions.base import BatchCtx, Transformation, as_arrow

__all__ = ["parse_expression", "Node", "Lit", "Ref", "SelfData", "Tup", "Call",
           "Infix", "ExpressionError", "is_expression"]


class ExpressionError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Node:
    def eval(self, data, ctx: BatchCtx):  # pragma: no cover
        raise NotImplementedError

    def walk(self):
        yield self

    def refs(self) -> list[str]:
        out = []
        for n in self.walk():
            if isinstance(n, Ref):
                out.append(n.name)
        return out


@dataclass
class Lit(Node):
    value: float

    def eval(self, data, ctx):
        return self.value


@dataclass
class Ref(Node):
    name: str          # feature name
    stage: str | None  # intermediate stage, from `feat:stage`

    @property
    def key(self) -> str:
        return f"{self.name}:{self.stage}" if self.stage else self.name

    def eval(self, data, ctx):
        return ctx.get(self.key)


@dataclass
class SelfData(Node):
    def eval(self, data, ctx):
        if data is None:
            raise ExpressionError("() used but the feature has no raw input column")
        return data


@dataclass
class Tup(Node):
    items: list[Node]

    def eval(self, data, ctx):
        return [it.eval(data, ctx) for it in self.items]

    def walk(self):
        yield self
        for it in self.items:
            yield from it.walk()


@dataclass
class Call(Node):
    """A transformation application. The Transformation instance is built
    ONCE at parse time (driver) and shipped inside the map_batches closure;
    per-batch work is only its vectorized execute."""

    fn_name: str
    kwargs: dict[str, Any]
    recv: Node | None
    transform: Transformation = field(default=None, repr=False)
    publish_as: str | None = None  # set by the planner when `feat:stage` is referenced

    def __post_init__(self):
        if self.transform is None:
            cls = registry.get(self.fn_name)
            self.transform = cls(**self.kwargs)

    def eval(self, data, ctx):
        inp = self.recv.eval(data, ctx) if self.recv is not None else None
        t = self.transform
        if t.expects_data:
            out = t(inp, ctx)
        else:
            out = t(None, ctx)
        if self.publish_as:
            ctx.put(self.publish_as, out)
        return out

    def walk(self):
        yield self
        if self.recv is not None:
            yield from self.recv.walk()


_PC_OPS = {"+": pc.add, "-": pc.subtract, "*": pc.multiply, "/": pc.divide}


def _num(x):
    """Promote ints to float64 arrays like numpy arithmetic in the reference.
    Scalar-only subexpressions yield pa.Scalar — unwrap before re-wrapping
    so nested constant folds ((2 + 2) + a) keep composing."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x.cast(pa.float64()) if not pa.types.is_floating(x.type) else x
    if isinstance(x, pa.Scalar):
        x = x.as_py()
    return pa.scalar(float(x))


@dataclass
class Infix(Node):
    op: str
    left: Node
    right: Node

    def eval(self, data, ctx):
        return _PC_OPS[self.op](_num(self.left.eval(data, ctx)),
                                _num(self.right.eval(data, ctx)))

    def walk(self):
        yield self
        yield from self.left.walk()
        yield from self.right.walk()


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<num>\d+(?:\.\d+)?)
  | (?P<call>\.[A-Za-z_]\w*\()
  | (?P<ident>[A-Za-z_]\w*(?::[A-Za-z_]\w*)?)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<op>[+\-*/,])
  | (?P<ws>\s+)
""", re.X)


def _tokenize(text: str):
    """Yield (kind, value) tokens; `.fn(` triggers a balanced-paren scan to
    capture the raw kwargs string (kwargs may contain nested brackets and
    quoted strings)."""
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ExpressionError(f"invalid token at {text[i:i+20]!r} in {text!r}")
        kind = m.lastgroup
        i = m.end()
        if kind == "ws":
            continue
        if kind == "call":
            fn = m.group("call")[1:-1]
            stack, start = ["("], i
            in_str: str | None = None
            closer = {")": "(", "]": "[", "}": "{"}
            while i < len(text) and stack:
                c = text[i]
                if in_str:
                    if c == in_str and text[i - 1] != "\\":
                        in_str = None
                elif c in "'\"":
                    in_str = c
                elif c in "([{":
                    stack.append(c)
                elif c in ")]}":
                    if not stack or stack.pop() != closer[c]:
                        raise ExpressionError(
                            f"mismatched bracket {c!r} in call args of {text!r}")
                i += 1
            if stack:
                raise ExpressionError(f"unbalanced call parens in {text!r}")
            yield ("call", (fn, text[start:i - 1]))
        else:
            yield (kind, m.group())


def _parse_kwargs(raw: str) -> dict[str, Any]:
    """k=v pairs; values are Python literals, bare identifiers become
    strings. Positional args rejected (reference: fefa_expressions.py:95-119)."""
    raw = raw.strip()
    if not raw:
        return {}
    parts, depth, cur, in_str = [], 0, "", None
    for c in raw:
        if in_str:
            cur += c
            if c == in_str:
                in_str = None
            continue
        if c in "'\"":
            in_str = c
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if c == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += c
    if cur.strip():
        parts.append(cur)
    out: dict[str, Any] = {}
    for p in parts:
        if "=" not in p:
            raise ExpressionError(f"positional args not allowed: {p!r}")
        k, _, v = p.partition("=")
        k, v = k.strip(), v.strip()
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            if re.fullmatch(r"[A-Za-z_]\w*(?::[A-Za-z_]\w*)?", v):
                out[k] = v  # bare identifier -> string
            else:
                raise ExpressionError(f"cannot parse kwarg value {v!r}")
    return out


# ---------------------------------------------------------------------------
# shunting-yard parser
# ---------------------------------------------------------------------------

_PRECEDENCE = {",": 1, "+": 2, "-": 2, "*": 3, "/": 3}


def parse_expression(text: str) -> Node:
    output: list[Node] = []
    ops: list[str] = []

    def apply(op: str):
        if len(output) < 2:
            raise ExpressionError(f"operator {op!r} missing operands in {text!r}")
        r, l = output.pop(), output.pop()
        if op == ",":
            if isinstance(l, Tup):
                l.items.append(r)
                output.append(l)
            else:
                output.append(Tup([l, r]))
        else:
            output.append(Infix(op, l, r))

    tokens = list(_tokenize(text))
    prev_kind = None
    for idx, (kind, val) in enumerate(tokens):
        if kind == "num":
            output.append(Lit(float(val)))
        elif kind == "ident":
            name, _, stage = val.partition(":")
            output.append(Ref(name, stage or None))
        elif kind == "lparen":
            # `()` -> the feature's own input (reference: fefa_expressions.py:162-165)
            if idx + 1 < len(tokens) and tokens[idx + 1][0] == "rparen":
                ops.append("(EMPTY")
            else:
                ops.append("(")
        elif kind == "rparen":
            if ops and ops[-1] == "(EMPTY":
                ops.pop()
                output.append(SelfData())
                continue
            while ops and ops[-1] != "(":
                apply(ops.pop())
            if not ops:
                raise ExpressionError(f"unbalanced parens in {text!r}")
            ops.pop()
        elif kind == "op":
            while ops and ops[-1] not in ("(", "(EMPTY") \
                    and _PRECEDENCE.get(ops[-1], 0) >= _PRECEDENCE[val]:
                apply(ops.pop())
            ops.append(val)
        elif kind == "call":
            fn, rawkw = val
            if not output:
                raise ExpressionError(f".{fn}() has no receiver in {text!r}")
            recv = output.pop()
            output.append(Call(fn, _parse_kwargs(rawkw), recv))
        prev_kind = kind
    _ = prev_kind
    while ops:
        op = ops.pop()
        if op in ("(", "(EMPTY"):
            raise ExpressionError(f"unbalanced parens in {text!r}")
        apply(op)
    if len(output) != 1:
        raise ExpressionError(f"malformed expression {text!r}")
    return output[0]


_EXPR_HINT = re.compile(r"[()+\-*/,]|\.\w+\(")


def is_expression(target: str) -> bool:
    """Heuristic mirror of the reference's _resolve_target hook
    (_internal/instantiate/_instantiate.py:136-156): a _target_ string that
    contains expression syntax is parsed as an expression, otherwise it is
    a registry name / dotted class path."""
    return bool(_EXPR_HINT.search(target))
