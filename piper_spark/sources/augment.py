"""Image augmentation operators — the reference's augmentation surface
re-expressed as explicit, deterministic, vectorized numpy transforms.

Mirrors (and deliberately FIXES) the reference:

- typed dispatch on `AugmentationType` (reference: utils/models.py:4-7).
  The reference's Spark job passes the whole list where one value is
  expected, so its `match` falls through and augmentation is a NO-OP
  (data_augment.py:12-25,112,132 — SURVEY.md §2A S10). Here unknown
  augmentation values raise instead of silently doing nothing.
- FLIP (data_augment.py:15-16): the reference seeds `random` with a
  constant 42 per call → the flip code is in fact deterministic; we
  make the determinism explicit: the flip axis derives from a seed+key
  hash, not hidden module state.
- ROTATE (data_augment.py:17-20): fixed 15° about the center, pure-numpy
  BILINEAR inverse warp matching cv2.warpAffine's INTER_LINEAR default
  (black BORDER_CONSTANT fill); a "nearest" variant is kept for
  exact-copy tests. Property-tested: on smooth gradients bilinear must
  reduce interpolation error vs nearest (tests/test_augment.py).
- COLOR_JITTER (data_augment.py:21-22): contrast ×1.2, brightness +10,
  clamped to u8 — implemented in multimodal.color_jitter.
- gaussian noise / random erasing (reference train path,
  augmentation.rs:114-184): seeded-RNG ports of the Burn defaults.

These run inside Arrow-batched pandas UDFs at scale (one
`apply_augmentations` call per image payload in a `mapInPandas` body);
at 100 TB augmentation is embarrassingly parallel and the only cost
that matters is keeping the JVM↔Python crossing columnar.
"""

from __future__ import annotations

import enum
import zlib

import numpy as np

from piper_spark.sources.multimodal import color_jitter


class AugmentationType(str, enum.Enum):
    """Mirror of the reference's typed enum (utils/models.py:4-7)."""

    FLIP = "FLIP"
    ROTATE = "ROTATE"
    COLOR_JITTER = "COLOR_JITTER"


def _seed_for(seed: int, key: str) -> np.random.Generator:
    """Deterministic per-item RNG: global seed × item key (no hidden state)."""
    return np.random.default_rng((seed, zlib.crc32(key.encode())))


def flip(
    img: np.ndarray, seed: int = 42, key: str = "", code: int | None = None
) -> np.ndarray:
    """Deterministic flip: axis code in {-1, 0, 1} like cv2.flip
    (both / vertical / horizontal), chosen by the seeded RNG — or
    passed explicitly (`img_augment`'s oracle key derives it from
    doc_id so DuckDB can mirror the choice arithmetically; the seeded
    path stays the production default, reference data_augment.py:15-16)."""
    if code is None:
        code = int(_seed_for(seed, key).integers(-1, 2))
    if code == 0:
        return img[::-1, :, :]
    if code == 1:
        return img[:, ::-1, :]
    return img[::-1, ::-1, :]


def rotate90(img: np.ndarray, k: int = 1) -> np.ndarray:
    """Exact 90° rotation(s), counter-clockwise — the integer-exact
    subgroup of S8's rotation (reference data_augment.py:17-20 rotates
    15° with float interpolation — kept as `rotate15`, property-
    tested; 90° multiples are pure index permutations, which is what
    lets `img_augment` carry a byte-exact cross-engine oracle)."""
    return np.rot90(img, k, axes=(0, 1)).copy()


def rotate15(
    img: np.ndarray, degrees: float = 15.0, method: str = "bilinear"
) -> np.ndarray:
    """Rotate about the image center (reference: fixed 15°), inverse
    mapping, out-of-frame pixels black — same geometry as
    cv2.getRotationMatrix2D + warpAffine. Default interpolation is
    bilinear like cv2's INTER_LINEAR default (data_augment.py:17-20 and
    the Burn train-path rotate, augmentation.rs:99-105); "nearest"
    keeps the exact-copy variant for tests."""
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = np.deg2rad(degrees)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse rotation: destination → source
    xs = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    ys = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    out = np.zeros_like(img)
    if method == "nearest":
        xsr = np.rint(xs).astype(np.int64)
        ysr = np.rint(ys).astype(np.int64)
        valid = (xsr >= 0) & (xsr < w) & (ysr >= 0) & (ysr < h)
        out[yy[valid], xx[valid]] = img[ysr[valid], xsr[valid]]
        return out
    if method != "bilinear":
        raise ValueError(f"unknown interpolation {method!r}")
    # Bilinear: weight the 4 surrounding source pixels; contributions
    # outside the frame are zero (cv2 BORDER_CONSTANT black).
    x0, y0 = np.floor(xs).astype(np.int64), np.floor(ys).astype(np.int64)
    fx, fy = xs - x0, ys - y0
    acc = np.zeros((h, w, img.shape[2]), dtype=np.float64)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = np.where(valid, wx * wy, 0.0)
            xi_c, yi_c = np.clip(xi, 0, w - 1), np.clip(yi, 0, h - 1)
            acc += wgt[..., None] * img[yi_c, xi_c].astype(np.float64)
    if img.dtype == np.uint8:
        return np.clip(np.round(acc), 0, 255).astype(np.uint8)
    return acc.astype(img.dtype)


def gaussian_noise(
    img: np.ndarray, std: float = 0.01, p: float = 0.5, seed: int = 42, key: str = ""
) -> np.ndarray:
    """Additive gaussian noise on [0,1] floats with probability p
    (reference defaults: augmentation.rs:63-79, noise_std 0.01)."""
    rng = _seed_for(seed, key)
    if rng.random() >= p:
        return img
    return img + rng.normal(0.0, std, img.shape).astype(img.dtype)


def random_erase(
    img: np.ndarray,
    p: float = 0.5,
    area_range: tuple[float, float] = (0.02, 0.4),
    aspect_range: tuple[float, float] = (0.3, 3.3),
    seed: int = 42,
    key: str = "",
) -> np.ndarray:
    """Random-erasing (reference augmentation.rs:131-184): blank a
    random rectangle with the image mean, probability p."""
    rng = _seed_for(seed, key)
    if rng.random() >= p:
        return img
    h, w = img.shape[:2]
    area = h * w * rng.uniform(*area_range)
    aspect = rng.uniform(*aspect_range)
    eh = min(h, max(1, int(round(np.sqrt(area * aspect)))))
    ew = min(w, max(1, int(round(np.sqrt(area / aspect)))))
    y0 = int(rng.integers(0, h - eh + 1))
    x0 = int(rng.integers(0, w - ew + 1))
    out = img.copy()
    out[y0 : y0 + eh, x0 : x0 + ew] = img.mean(dtype=np.float64)
    return out


def apply_augmentations(
    img: np.ndarray,
    augmentations: list[AugmentationType | str],
    seed: int = 42,
    key: str = "",
) -> np.ndarray:
    """Apply augmentations in order with explicit typed dispatch.

    Unlike the reference (which silently no-ops on unrecognized input —
    the S10 bug), an unknown augmentation raises.
    """
    out = img
    for aug in augmentations:
        aug = AugmentationType(aug)
        if aug is AugmentationType.FLIP:
            out = flip(out, seed=seed, key=key)
        elif aug is AugmentationType.ROTATE:
            out = rotate15(out)
        elif aug is AugmentationType.COLOR_JITTER:
            out = color_jitter(out)
        else:  # pragma: no cover — enum is exhaustive
            raise ValueError(f"unhandled augmentation {aug!r}")
    return out
