"""Property-based tests for the infix expression parser: randomly
generated arithmetic expressions over columns must evaluate identically
to direct numpy evaluation (precedence, associativity, parentheses),
mirroring the reference's shunting-yard semantics
(fefa_expressions.py:65-93)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feature_fabrica_ray.functions.base import BatchCtx, as_numpy
from feature_fabrica_ray.spec.expressions import (ExpressionError,
                                                  parse_expression)

A = np.array([3.0, -7.5, 11.0, 0.25], dtype=np.float64)
B = np.array([2.0, 4.0, -1.5, 8.0], dtype=np.float64)


def _expr(depth: int):
    """Random (text, numpy-value) expression pairs."""
    leaf = st.sampled_from([("a", A), ("b", B),
                            ("2", 2.0), ("5", 5.0), ("0.5", 0.5)])
    if depth == 0:
        return leaf
    sub = _expr(depth - 1)
    ops = {"+": np.add, "-": np.subtract, "*": np.multiply, "/": np.divide}

    def combine(parts):
        (lt, lv), op, (rt, rv) = parts
        with np.errstate(all="ignore"):
            return (f"({lt} {op} {rt})", ops[op](lv, rv))

    return st.one_of(leaf, st.tuples(sub, st.sampled_from("+-*/"), sub)
                     .map(combine))


@settings(max_examples=120, deadline=None)
@given(_expr(3))
def test_random_expression_matches_numpy(pair):
    text, expected = pair
    expected = np.broadcast_to(np.asarray(expected, dtype=np.float64), A.shape)
    if not np.isfinite(expected).all():
        return  # division blew up -> comparison undefined either way
    tree = parse_expression(text if any(c in text for c in "+-*/(")
                            else f"({text})")
    ctx = BatchCtx(pa.table({"a": A, "b": B}))
    got = tree.eval(None, ctx)
    if isinstance(got, pa.Scalar):  # fully-constant expression folds
        got = got.as_py()
    else:
        got = as_numpy(got)
    got = np.broadcast_to(np.asarray(got, dtype=np.float64), A.shape)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@pytest.mark.parametrize("bad", [
    "(a +", "a + * b", "((a)", "a ; b", ").lower()", "(a).unknown_fn()",
])
def test_malformed_expressions_rejected(bad):
    from feature_fabrica_ray.functions.base import TransformationError

    with pytest.raises((ExpressionError, TransformationError, KeyError,
                        ValueError)):
        tree = parse_expression(bad)
        ctx = BatchCtx(pa.table({"a": A, "b": B}))
        tree.eval(None, ctx)


def test_precedence_golden():
    ctx = BatchCtx(pa.table({"a": A, "b": B}))
    got = as_numpy(parse_expression("a + b * 2").eval(None, ctx))
    np.testing.assert_allclose(got, A + B * 2)
    got = as_numpy(parse_expression("(a + b) * 2").eval(None, ctx))
    np.testing.assert_allclose(got, (A + B) * 2)
