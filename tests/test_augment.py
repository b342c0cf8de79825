"""Augmentation operator tests — reference-semantics parity (S7-S10, R8)."""

from __future__ import annotations

import numpy as np
import pytest

from piper_spark.sources.augment import (
    AugmentationType,
    apply_augmentations,
    flip,
    gaussian_noise,
    random_erase,
    rotate15,
)


def _img(h=8, w=8):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_flip_deterministic_and_involutive_shape():
    img = _img()
    a = flip(img, seed=42, key="k1")
    b = flip(img, seed=42, key="k1")
    np.testing.assert_array_equal(a, b)  # same seed+key → same flip
    assert a.shape == img.shape
    # different keys eventually differ (deterministic variety, not constant)
    outs = {flip(img, seed=42, key=f"k{i}").tobytes() for i in range(8)}
    assert len(outs) > 1


def test_rotate15_geometry():
    img = _img(16, 16)
    out = rotate15(img)
    assert out.shape == img.shape
    # 0° rotation is identity for both interpolations
    np.testing.assert_array_equal(rotate15(img, 0.0), img)
    np.testing.assert_array_equal(rotate15(img, 0.0, method="nearest"), img)
    # 15° then content preserved near center pixel-wise count-ish: corners dark
    assert out.dtype == np.uint8


def test_rotate_bilinear_interpolates_between_pixels():
    # 90° rotation maps to exact grid points → bilinear == nearest;
    # 45° lands between pixels → bilinear must blend (differ from NN)
    img = _img(16, 16)
    np.testing.assert_array_equal(
        rotate15(img, 90.0), rotate15(img, 90.0, method="nearest")
    )
    assert (rotate15(img, 45.0) != rotate15(img, 45.0, method="nearest")).any()
    # blending on a two-tone gradient produces intermediate values
    two = np.zeros((9, 9, 1), dtype=np.uint8)
    two[:, 5:] = 200
    mid = rotate15(two, 45.0)
    assert ((mid > 0) & (mid < 200)).any()
    with pytest.raises(ValueError):
        rotate15(img, 15.0, method="bicubic")


def test_rotate_bilinear_beats_nearest_on_smooth_gradient():
    """Bilinear reproduces a linear ramp exactly (a plane is its own
    bilinear interpolant), while nearest quantizes to the half-pixel —
    so against the analytic rotated ground truth, bilinear's max error
    in the interior must be strictly smaller (round-2 verdict item 4)."""
    h = w = 33
    yy, xx = np.mgrid[0:h, 0:w]
    img = (xx * 6).astype(np.uint8)[:, :, None]  # smooth linear ramp in x
    deg = 15.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = np.deg2rad(deg)
    # ground truth: value at dst (x,y) = ramp evaluated at source coords
    xs = np.cos(th) * (xx - cx) + np.sin(th) * (yy - cy) + cx
    truth = xs * 6.0
    bil = rotate15(img, deg)[:, :, 0].astype(np.float64)
    near = rotate15(img, deg, method="nearest")[:, :, 0].astype(np.float64)
    # interior only: border pixels mix with the black fill
    c = 8
    sl = np.s_[c:-c, c:-c]
    err_b = np.abs(bil[sl] - truth[sl]).max()
    err_n = np.abs(near[sl] - truth[sl]).max()
    assert err_b < err_n
    assert err_b <= 0.5 + 1e-9  # exact up to u8 rounding


def test_gaussian_noise_probability_and_seed():
    img = np.zeros((4, 4, 3), dtype=np.float32)
    a = gaussian_noise(img, seed=1, key="x")
    b = gaussian_noise(img, seed=1, key="x")
    np.testing.assert_array_equal(a, b)
    applied = sum(
        gaussian_noise(img, seed=1, key=f"k{i}").any() for i in range(40)
    )
    assert 5 < applied < 35  # p=0.5-ish


def test_random_erase_rectangle_mean_fill():
    img = np.full((10, 10, 3), 200, dtype=np.uint8)
    out = random_erase(img, p=1.0, seed=3, key="e")
    # erased region filled with the (uniform) mean → still 200 everywhere
    np.testing.assert_array_equal(out, img)
    img2 = _img(12, 12)
    out2 = random_erase(img2, p=1.0, seed=3, key="e")
    assert (out2 != img2).any() and out2.shape == img2.shape


def test_apply_augmentations_typed_dispatch():
    img = _img()
    out = apply_augmentations(img, ["FLIP", "COLOR_JITTER"], key="d1")
    assert out.shape == img.shape
    out2 = apply_augmentations(
        img, [AugmentationType.FLIP, AugmentationType.COLOR_JITTER], key="d1"
    )
    np.testing.assert_array_equal(out, out2)


def test_apply_augmentations_rejects_unknown():
    # the reference silently no-ops on bad input (S10 bug); we raise
    with pytest.raises(ValueError):
        apply_augmentations(_img(), ["SHARPEN"])
