"""Golden-image regression tests (SURVEY §4 item 2).

Goldens are small CPU renders stored in tests/golden/*.npy, regenerated via
/tmp-style scripts when semantics intentionally change. Tolerances allow
XLA-version float drift but catch real regressions."""
import os

import numpy as np
import pytest

from raytracing_tpu.models import assignments as A

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "assign01": lambda: A.assign01(48, 36),
    "assign02": lambda: A.assign02(48, 36),
    "assign04": lambda: A.assign04(48, 36),
    "assign07": lambda: A.assign07(48, 36),
    "assign09": lambda: A.assign09(48, 36, 4),
    "assign10": lambda: A.assign10(48, 36, passes=4, bounces=2),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {path}")
    fn, args, cfg = CASES[name]()
    img = np.array(fn(*args))
    ref = np.load(path)
    assert img.shape == ref.shape
    # pixel-level closeness + aggregate stability
    assert np.abs(img - ref).max() < 2e-2
    assert abs(img.mean() - ref.mean()) < 1e-3


def test_grid_equals_brute_golden():
    # assign04 (brute) and assign07 (grid) must agree exactly
    a = np.load(os.path.join(GOLDEN, "assign04.npy"))
    b = np.load(os.path.join(GOLDEN, "assign07.npy"))
    np.testing.assert_allclose(a, b, atol=1e-5)
