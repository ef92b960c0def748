"""Self-tests for the conftest comparator — the repo's core oracle.

The group-wise float fallback (`_float_rows_match_groupwise`) exists
because rows tied on every discrete column can legitimately swap order
between engines when a float's 6-dp rounding flips on a 1-ulp
difference (fuzz v8[3] at sf1). ADVICE r9 (medium) pointed out that the
first cut compared each float column as an independent sorted multiset
within tied groups, which would PASS a genuine engine bug that permutes
float values BETWEEN tied rows (each column's multiset unchanged, joint
rows wrong). The fallback now compares whole float row-tuples; these
tests pin both directions:

- a legitimate whole-row swap inside a tied group still passes;
- a cross-row per-column permutation (the bug class v8 was built to
  catch) now FAILS;
- near-tolerance rows that swap under a raw-value sort are matched
  greedily and pass;
- mismatched group membership or sizes fail.
"""

from __future__ import annotations

import pandas as pd
import pytest

from .conftest import assert_frames_match


class _Rel:
    """Duck-typed DuckDB-relation stand-in (mirrors driver_sim._PandasRel)."""

    def __init__(self, df: pd.DataFrame):
        self._df = df

    def df(self) -> pd.DataFrame:
        return self._df


class _Fake:
    """Duck-typed Spark-DataFrame stand-in: only .toPandas() is used."""

    def __init__(self, df: pd.DataFrame):
        self._df = df

    def toPandas(self) -> pd.DataFrame:
        return self._df


def _check(sp: pd.DataFrame, du: pd.DataFrame, name: str) -> None:
    assert_frames_match(_Fake(sp), _Rel(du), name)


def test_exact_match_passes():
    df = pd.DataFrame({"k": ["a", "b"], "x": [1.5, 2.5], "y": [3.5, 4.5]})
    _check(df, df.copy(), "exact")


def test_whole_row_swap_within_tied_group_passes():
    # Both rows tied on the discrete column; the engines emit the same
    # SET of (x, y) row-tuples in different orders — legitimate (the
    # normalized sort cannot order them by a discrete key).
    sp = pd.DataFrame({"k": ["a", "a"], "x": [1.0, 2.0], "y": [10.0, 20.0]})
    du = pd.DataFrame({"k": ["a", "a"], "x": [2.0, 1.0], "y": [20.0, 10.0]})
    _check(sp, du, "row-swap")


def test_cross_row_column_permutation_fails():
    # THE ADVICE r9 bug class: per-column multisets match ({1,2} for x,
    # {10,20} for y) but the joint rows differ — (1,20)/(2,10) vs
    # (1,10)/(2,20). A per-column fallback passed this; the joint
    # comparator must not.
    sp = pd.DataFrame({"k": ["a", "a"], "x": [1.0, 2.0], "y": [20.0, 10.0]})
    du = pd.DataFrame({"k": ["a", "a"], "x": [1.0, 2.0], "y": [10.0, 20.0]})
    with pytest.raises(AssertionError):
        _check(sp, du, "cross-row-perm")


def test_ulp_rounding_flip_realigns():
    # The original motivating shape: a 1-ulp difference straddling the
    # 6-dp rounding boundary flips the rounded value, misaligning the
    # positional sort; the group-wise fallback with tolerance passes it.
    a = 0.1234565  # rounds to 0.123456 or 0.123457 depending on ulp
    sp = pd.DataFrame({"k": ["g", "g"], "x": [a, 0.9], "y": [1.0, 2.0]})
    du = pd.DataFrame({"k": ["g", "g"],
                       "x": [a + 1e-9, 0.9], "y": [1.0, 2.0]})
    _check(sp, du, "ulp-flip")


def test_near_tolerance_rows_swap_greedy_match_passes():
    # Two rows whose float values differ by < tolerance from EACH OTHER:
    # a raw-value lexicographic sort can order them differently on the
    # two sides, so the cheap sorted pass misaligns and the greedy
    # whole-tuple matcher must rescue it.
    sp = pd.DataFrame({"k": ["g", "g"],
                       "x": [1.0000000, 1.0000001],
                       "y": [5.0000001, 5.0000000]})
    du = pd.DataFrame({"k": ["g", "g"],
                       "x": [1.0000001, 1.0000000],
                       "y": [5.0000000, 5.0000001]})
    _check(sp, du, "near-tol-swap")


def test_value_mismatch_still_fails():
    sp = pd.DataFrame({"k": ["a", "b"], "x": [1.0, 2.0]})
    du = pd.DataFrame({"k": ["a", "b"], "x": [1.0, 2.5]})
    with pytest.raises(AssertionError):
        _check(sp, du, "plain-mismatch")


def test_group_size_mismatch_fails():
    # Same global multiset of x values, but distributed across discrete
    # groups differently — group sizes disagree, must fail.
    sp = pd.DataFrame({"k": ["a", "a", "b"], "x": [1.0, 2.0, 3.0]})
    du = pd.DataFrame({"k": ["a", "b", "b"], "x": [1.0, 2.0, 3.0]})
    with pytest.raises(AssertionError):
        _check(sp, du, "group-size")


def test_all_float_frame_joint_rows():
    # No discrete columns at all (the fuzz-v8 nullable-rollup shape
    # after float widening): the whole frame is one tied group; joint
    # row-tuples must still be compared, not per-column multisets.
    sp = pd.DataFrame({"x": [1.0, 2.0], "y": [20.0, 10.0]})
    du = pd.DataFrame({"x": [1.0, 2.0], "y": [10.0, 20.0]})
    with pytest.raises(AssertionError):
        _check(sp, du, "all-float-perm")
    ok = pd.DataFrame({"x": [2.0, 1.0], "y": [10.0, 20.0]})
    _check(sp, ok, "all-float-rowswap")


def test_greedy_starvation_shape_passes_with_exact_matching():
    # THE ADVICE r10 bug class: Spark row a1=(1.0, 5.000001) is within
    # tolerance of BOTH oracle rows; a2=(1.000001, 5.0) only of
    # b1=(1.0, 5.0). The cheap lexsorted pass misaligns (a2 pairs
    # positionally with b2=(1.000001, 5.000002), y off by 2e-6), and a
    # greedy scan lets a1 consume b1 — the row a2 needed — reporting a
    # false failure. The exact augmenting-path matcher must find the
    # perfect matching a1-b2 / a2-b1.
    sp = pd.DataFrame({"x": [1.0, 1.000001], "y": [5.000001, 5.0]})
    du = pd.DataFrame({"x": [1.0, 1.000001], "y": [5.0, 5.000002]})
    _check(sp, du, "greedy-starvation")


def test_no_perfect_matching_still_fails():
    # Two Spark rows both within tolerance of the SAME single oracle
    # row (and of nothing else): exact matching must NOT double-consume
    # it — no perfect matching exists, so the comparator must fail.
    sp = pd.DataFrame({"x": [1.0, 1.000001], "y": [5.0, 5.000001]})
    du = pd.DataFrame({"x": [1.0, 9.0], "y": [5.0, 9.0]})
    with pytest.raises(AssertionError):
        _check(sp, du, "no-perfect-matching")


def test_nan_pairs_match_within_group():
    sp = pd.DataFrame({"k": ["a", "a"], "x": [float("nan"), 1.0],
                       "y": [1.0, 2.0]})
    du = pd.DataFrame({"k": ["a", "a"], "x": [1.0, float("nan")],
                       "y": [2.0, 1.0]})
    _check(sp, du, "nan-pair")
