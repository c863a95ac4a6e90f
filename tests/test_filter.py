"""Filter DSL: grammar, precedence, vectorized evaluation, undefined vars."""

import numpy as np
import pytest

from dextractor_tpu.ingest.filter import parse_filter, FilterError, DEFAULT_FILTER


def test_default_filter():
    f = parse_filter(DEFAULT_FILTER)
    mask = f.evaluate({"ln": np.array([499, 500, 900]),
                       "rq": np.array([800, 700, 760])})
    np.testing.assert_array_equal(mask, [False, False, True])


def test_precedence_and_over_or():
    # a || b && c  parses as  a || (b && c)
    f = parse_filter("zm==1 || zm==2 && ln>10")
    mask = f.evaluate({"zm": np.array([1, 2, 2, 3]),
                       "ln": np.array([0, 20, 5, 20])})
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_parens():
    f = parse_filter("(zm==1 || zm==2) && ln>10")
    mask = f.evaluate({"zm": np.array([1, 2, 2, 3]),
                       "ln": np.array([20, 20, 5, 20])})
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_all_comparisons():
    f = parse_filter("ln<5 || ln<=6 || ln>100 || ln>=90 || ln!=50 || ln==42")
    mask = f.evaluate({"ln": np.array([50, 42, 95])})
    np.testing.assert_array_equal(mask, [False, True, True])


def test_undefined_vars_are_minus_one():
    # bax records have no barcodes: bc1 == -1 (expr.c:377-384)
    f = parse_filter("bc1==0")
    assert not f.evaluate({"ln": np.array([100])})[0]
    f = parse_filter("bc1<0")
    assert f.evaluate({"ln": np.array([100])})[0]


def test_syntax_errors():
    with pytest.raises(FilterError, match="Unrecognized token"):
        parse_filter("xy>=5")
    with pytest.raises(FilterError, match="Expecting comparison operator"):
        parse_filter("ln 5")
    with pytest.raises(FilterError, match="Expecting closing paren"):
        parse_filter("(ln>5")
    with pytest.raises(FilterError, match="Unrecognized token"):
        parse_filter("ln>5 & rq>6")


def test_int_int_comparison():
    f = parse_filter("1==1 && ln>0")
    np.testing.assert_array_equal(
        f.evaluate({"ln": np.array([1, 0])}), [True, False])
