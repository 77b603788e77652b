import numpy as np

from fgn_tpu.ops.anchors import anchor_inside_flags, generate_anchors


def test_anchor_count_and_layout():
    a = generate_anchors(4, 5, stride=16)
    assert a.shape == (4 * 5 * 15, 4)


def test_base_anchor_values():
    # location (0, 0), ratio 1.0 (index 1), scale 2 (index 0) → 32x32 box
    a = np.asarray(generate_anchors(2, 2, stride=16))
    idx = 1 * 5 + 0  # ratio-major, scale-minor
    assert np.allclose(a[idx], [-16, -16, 16, 16])
    # ratio 0.5 → wider than tall: w = 16*2/sqrt(0.5), h = 16*2*sqrt(0.5)
    w = 32.0 / np.sqrt(0.5)
    h = 32.0 * np.sqrt(0.5)
    assert np.allclose(a[0], [-w / 2, -h / 2, w / 2, h / 2], atol=1e-4)


def test_grid_shift():
    a = np.asarray(generate_anchors(2, 3, stride=16))
    # anchor k at location (y=1, x=2) = base anchor k + (32, 16)
    base = a[:15]
    loc = a[(1 * 3 + 2) * 15 : (1 * 3 + 2) * 15 + 15]
    assert np.allclose(loc - base, [[32, 16, 32, 16]] * 15)


def test_inside_flags():
    a = generate_anchors(4, 4, stride=16)
    flags = np.asarray(anchor_inside_flags(a, 64, 64, allowed_border=0))
    # the smallest centered anchors at interior locations are inside
    assert flags.sum() > 0
    # a 512-wide anchor can never fit in a 64px image
    big = np.asarray(a)[:, 2] - np.asarray(a)[:, 0] > 64
    assert not np.any(flags & big)
    assert np.all(np.asarray(anchor_inside_flags(a, 64, 64, allowed_border=-1)))
