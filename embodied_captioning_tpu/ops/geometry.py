"""Camera geometry on device: depth back-projection to world frame.

TPU-native reformulation of the reference's per-mask ragged projection
(ref: experimenting_env/utils/projection_utils.py:254-309, _project_batch_masks
and _outlier_removal): instead of gathering the masked pixels into a variable-
length point list, we compute world coordinates for the *full* pixel grid once
per frame and carry boolean validity masks. Downstream consumers (voxel
scatter) use the masks, so shapes stay static and XLA can fuse everything.

Conventions (identical to the reference / habitat):
- camera looks down -Z, +X right, +Y up (OpenGL)
- fx = W/2 / tan(hfov/2), fy = H/2 / tan(hfov/2), xc = (W-1)/2, yc = (H-1)/2
- world = T_world_cam @ [x, y, z, 1]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def intrinsics_from_hfov(height: int, width: int, hfov_deg: float
                         ) -> Tuple[float, float, float, float]:
    t = float(np.tan(np.deg2rad(hfov_deg) / 2.0))
    fx = width / 2.0 / t
    fy = height / 2.0 / t
    xc = (width - 1.0) / 2.0
    yc = (height - 1.0) / 2.0
    return fx, fy, xc, yc


def backproject_depth(depth: jnp.ndarray, pose: jnp.ndarray, hfov_deg: float,
                      min_depth: float = 0.5, max_depth: float = 15.0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a depth image into world-frame points.

    Args:
      depth: [H, W] float32 meters.
      pose:  [4, 4] T_world_cam.
      hfov_deg: horizontal field of view.
      min_depth/max_depth: validity clamps (ref: _project_batch_masks uses
        ``mask[depth <= min] = False; mask[depth >= max] = False``).

    Returns:
      points: [H, W, 3] world coordinates (garbage where invalid).
      valid:  [H, W] bool depth-range validity.
    """
    h, w = depth.shape
    fx, fy, xc, yc = intrinsics_from_hfov(h, w, hfov_deg)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d = depth.astype(jnp.float32)
    x_cam = (xs - xc) / fx * d
    y_cam = -(ys - yc) / fy * d
    z_cam = -d
    pts_cam = jnp.stack([x_cam, y_cam, z_cam], axis=-1)  # [H, W, 3]
    R = pose[:3, :3].astype(jnp.float32)
    t = pose[:3, 3].astype(jnp.float32)
    points = pts_cam @ R.T + t
    valid = (d > min_depth) & (d < max_depth)
    return points, valid


def depth_outlier_mask(depth: jnp.ndarray, mask: jnp.ndarray,
                       max_deviations: float = 1.0) -> jnp.ndarray:
    """Per-instance depth outlier rejection: keep pixels whose depth is within
    ``max_deviations``*sigma of the masked region's mean depth
    (ref: projection_utils.py:302-309 _outlier_removal, applied to the masked
    depth vector). Returns a refined boolean mask of the same shape."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(depth * m) / n
    # torch.std uses Bessel's correction (n-1)
    var = jnp.sum(jnp.square(depth - mean) * m) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    # epsilon floor: a perfectly flat region has sigma = 0 and the strict
    # `< sigma` of the reference would reject every pixel of it
    keep = jnp.abs(depth - mean) < max_deviations * std + 1e-3
    return mask & keep


def erode_mask(mask: jnp.ndarray, kernel: int = 7) -> jnp.ndarray:
    """Binary erosion with a square kernel (ref: projection_utils.py:185-190
    erodes each instance mask with a 7x7 kernel before projection).
    Implemented as a min-pool via reduce_window — maps to the VPU."""
    pad = kernel // 2
    return jax.lax.reduce_window(
        mask.astype(jnp.float32), 1.0, jax.lax.min,
        window_dimensions=(kernel, kernel), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    ) > 0.5


def dilate_mask(mask: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Binary dilation (cv2.dilate parity for the topdown maps,
    ref: projection_utils.py:715-726)."""
    pad = kernel // 2
    return jax.lax.reduce_window(
        mask.astype(jnp.float32), 0.0, jax.lax.max,
        window_dimensions=(kernel, kernel), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    ) > 0.5


def morph_close(mask: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Morphological closing (cv2.MORPH_CLOSE parity,
    ref: projection_utils.py:788-791)."""
    return erode_mask(dilate_mask(mask, kernel), kernel)


def project_points_to_image(points: jnp.ndarray, pose: jnp.ndarray,
                            height: int, width: int, hfov_deg: float,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points into a camera: inverse of backproject_depth
    (used for box reprojection between views, ref: projection_utils.py:28-134).

    Args:
      points: [..., 3] world coordinates.
      pose: [4, 4] T_world_cam of the target camera.

    Returns:
      pix: [..., 2] (x, y) pixel coordinates.
      in_front: [...] bool, True where the point is in front of the camera.
    """
    fx, fy, xc, yc = intrinsics_from_hfov(height, width, hfov_deg)
    R = pose[:3, :3].astype(jnp.float32)
    t = pose[:3, 3].astype(jnp.float32)
    cam = (points - t) @ R  # R^T applied from the right == R^-1 @ p
    z = -cam[..., 2]
    in_front = z > 1e-6
    zs = jnp.where(in_front, z, 1.0)
    x_pix = cam[..., 0] / zs * fx + xc
    y_pix = -cam[..., 1] / zs * fy + yc
    return jnp.stack([x_pix, y_pix], axis=-1), in_front


def reproject_box(box: jnp.ndarray, depth: jnp.ndarray, pose_src: jnp.ndarray,
                  pose_dst: jnp.ndarray, hfov_deg: float) -> jnp.ndarray:
    """Project an XYXY box seen in camera `src` onto camera `dst` by
    back-projecting the box region and re-projecting its extremes
    (ref: project_cam2_bb_onto_cam1, projection_utils.py:28-134)."""
    h, w = depth.shape
    points, valid = backproject_depth(depth, pose_src, hfov_deg)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    inside = ((xs >= box[0]) & (xs < box[2]) & (ys >= box[1]) & (ys < box[3])
              & valid)
    pix, in_front = project_points_to_image(points, pose_dst, h, w, hfov_deg)
    ok = inside & in_front
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(ok, pix[..., 0], big))
    y1 = jnp.min(jnp.where(ok, pix[..., 1], big))
    x2 = jnp.max(jnp.where(ok, pix[..., 0], -big))
    y2 = jnp.max(jnp.where(ok, pix[..., 1], -big))
    any_ok = jnp.any(ok)
    # clip x to image WIDTH and y to HEIGHT (one shared bound would let
    # boxes extend past the short side of non-square frames)
    out = jnp.stack([jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
                     jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)])
    return jnp.where(any_ok, out, jnp.zeros(4))
