"""Binary descriptors: BRIEF-style 256-bit intensity-pair comparisons.

TPU-native replacement for the reference's OpenCV C++ BRIEF/ORB descriptor
boundary (SURVEY.md C6: "oriented-BRIEF-style 256-bit binary descriptor via
gather of smoothed-intensity pairs"). The sampling pattern is a fixed random
set of point pairs in a patch (same idea as BRIEF's learned/ random pattern),
generated deterministically at import time, and the per-keypoint sampling is
ONE big gather over the smoothed panorama -- K x 256 x 2 samples fused by XLA.

Orientation steering is intentionally omitted: panoramas are gravity/axis
aligned by construction (the rig's mirror axis fixes "up"), so in-plane
rotation between frames is bounded by roll, which is small for the MAV
platform [P2]. This matches how the reference uses upright features on
panoramas [P1].

Bits are packed 32-per-uint32 into DESC_WORDS words for the Hamming matcher.
Columns wrap (azimuth); rows clamp.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sosvo.frontend.detect import Keypoints, gaussian_smooth

NBITS = 256
WORDS = NBITS // 32


def _make_pattern(patch: int = 24, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Fixed random BRIEF pattern: two (NBITS, 2) float offsets, Gaussian-
    distributed within the patch (sigma = patch/5, BRIEF-G II)."""
    rng = np.random.default_rng(seed)
    sigma = patch / 5.0
    a = np.clip(rng.normal(0.0, sigma, (NBITS, 2)), -patch / 2 + 1, patch / 2 - 1)
    b = np.clip(rng.normal(0.0, sigma, (NBITS, 2)), -patch / 2 + 1, patch / 2 - 1)
    return a.astype(np.float32), b.astype(np.float32)


_PAT_A, _PAT_B = _make_pattern()


def describe(pano: jnp.ndarray, kps: Keypoints, smoothed: jnp.ndarray | None = None) -> jnp.ndarray:
    """(K, WORDS) uint32 packed descriptors at the keypoints.

    Args:
      pano: (H, W) panorama (used only if `smoothed` is None).
      kps: fixed-size keypoints (rows/cols may be subpixel; samples round).
      smoothed: optionally the pre-smoothed panorama (reuse the detector's).
    """
    img = gaussian_smooth(pano) if smoothed is None else smoothed
    h, w = img.shape
    pa = jnp.asarray(_PAT_A)  # (NBITS, 2) as (drow, dcol)
    pb = jnp.asarray(_PAT_B)

    def sample(offsets):
        r = jnp.round(kps.rows[:, None] + offsets[None, :, 0]).astype(jnp.int32)
        c = jnp.round(kps.cols[:, None] + offsets[None, :, 1]).astype(jnp.int32)
        r = jnp.clip(r, 0, h - 1)
        c = jnp.mod(c, w)  # azimuth wrap
        return img[r, c]  # (K, NBITS)

    bits = (sample(pa) < sample(pb)).astype(jnp.uint32)  # (K, NBITS)
    k = bits.shape[0]
    grouped = bits.reshape(k, WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(grouped << shifts, axis=-1, dtype=jnp.uint32)
