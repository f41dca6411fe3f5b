"""Property test: ops.cutoff.get_min_btw_modes vs a verbatim scalar port
of the reference (src/garlic-kde.cpp:142-234).  The mode finder's exact
idiosyncrasies determine every downstream output byte, so the vectorized
implementation must match the scalar one bit-for-bit on adversarial
densities (plateaus, ties, monotone stretches)."""

from __future__ import annotations

import numpy as np
import pytest

from garlic_tpu.ops import cutoff as cutoff_ops

_DBL_MIN = 2.2250738585072014e-308
_DBL_MAX = 1.7976931348623157e+308


def _get_arg_max(y, off, n):
    m = _DBL_MIN
    arg = -1
    for i in range(n):
        if m < y[off + i]:
            m = y[off + i]
            arg = i
    return arg


def _get_arg_min(y, off, n):
    m = _DBL_MAX
    arg = -1
    for i in range(n):
        if m > y[off + i]:
            m = y[off + i]
            arg = i
    return arg


def min_btw_modes_scalar(x, y, wsize):
    """Verbatim port of get_min_btw_modes (src/garlic-kde.cpp:142-234)."""
    size = len(x)
    winsize = 20
    n = size - winsize
    uniq_maxes = [0.0] * n
    uniq_counts = [0.0] * n
    index = 0
    for i in range(n):
        arg = _get_arg_max(y, i, winsize)
        maxes = y[max(arg + i, 0)]  # arg==-1 clamped (UB in the original)
        if i == 1:
            uniq_maxes[1] = maxes
            uniq_counts[1] += 1
        elif uniq_maxes[index] == maxes:
            uniq_counts[index] += 1
        else:
            index += 1
            uniq_maxes[index] = maxes
            uniq_counts[index] += 1
    max_count = int(uniq_counts[0])
    second_max_count = 0
    for i in range(1, n):
        if max_count <= uniq_counts[i]:
            second_max_count = max_count
            max_count = int(uniq_counts[i])
        elif second_max_count <= uniq_counts[i]:
            second_max_count = int(uniq_counts[i])
    values = [uniq_maxes[i] for i in range(n)
              if uniq_counts[i] == max_count
              or uniq_counts[i] == second_max_count]
    first_max = -1.0
    second_max = -1.0
    for v in values:
        if first_max <= v:
            second_max = first_max
            first_max = v
        elif second_max <= v:
            second_max = v
    left = right = -1
    for i in range(size):
        if y[i] == first_max:
            left = i
        if y[i] == second_max:
            right = i
    if right < left:
        left, right = right, left
    min_index = _get_arg_min(y, left, right - left + 1) + left
    if abs(x[min_index] / wsize) < 1:
        return float(x[min_index])
    return 0.0


def _density(seed):
    rng = np.random.default_rng(seed)
    x = np.linspace(-3, 3, 512)
    kind = seed % 4
    if kind == 0:  # clean bimodal
        y = (np.exp(-0.5 * (x + rng.uniform(1, 2)) ** 2 / 0.2)
             + rng.uniform(0.4, 1.0)
             * np.exp(-0.5 * (x - rng.uniform(1, 2)) ** 2 / 0.3))
    elif kind == 1:  # quantized (forces exact ties/plateaus)
        y = np.round(np.abs(np.sin(x * rng.uniform(1, 3))) * 20) / 20
    elif kind == 2:  # noisy trimodal
        y = sum(rng.uniform(0.2, 1) *
                np.exp(-0.5 * (x - m) ** 2 / rng.uniform(0.05, 0.3))
                for m in rng.uniform(-2.5, 2.5, 3))
        y = np.round(y * 1000) / 1000
    else:  # monotone + plateau tail
        y = np.minimum(np.arange(512) / 400.0, 0.8)
    return x, y


@pytest.mark.parametrize("seed", range(24))
def test_matches_scalar_port(seed):
    x, y = _density(seed)
    try:
        expect = min_btw_modes_scalar(list(x), list(y), 60)
    except Exception:
        with pytest.raises(Exception):
            cutoff_ops.get_min_btw_modes(x, y, 60)
        return
    got = cutoff_ops.get_min_btw_modes(x, y, 60)
    assert got == expect, (seed, got, expect)
