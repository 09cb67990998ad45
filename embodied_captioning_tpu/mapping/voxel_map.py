"""On-device 3D semantic voxel map — the disagreement core.

TPU-native redesign of the reference's ``SemanticPointCloud``
(ref: experimenting_env/utils/projection_utils.py:312-925), which stores a
growing Nx3 point list + python dicts of per-object logit/embedding sets and
re-voxelizes with pyntcloud + cc3d + scipy-KDTree on every update.

Here the map is a *dense* voxel grid over the scene bounds at 0.05 m
(ref voxel size, projection_utils.py:339) held in device memory, updated by
scatter ops, with fixed-capacity object tables:

  grids   per-voxel streaming consensus stats (mapping/consensus.py),
          per-voxel owning object-id
  objects per-object centroid accumulators, class, ring buffers of K view
          logits and K caption embeddings (the reference's
          object_id_to_logits / object_id_to_embeddings dicts,
          ref :388-430, made fixed-capacity)

Persistent object identity is resolved on device by centroid matching
(same class within a match radius) instead of host-side connected components;
offline re-segmentation with exact 26-connectivity CC is available via
``mapping/components.py`` for the pseudo-labeling path (ref :544-588).

Everything in this module is functional: ``VoxelMapState`` is a NamedTuple
pytree; updates are jit-able pure functions, so the whole
detect→caption→embed→fuse→disagree step compiles into one XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..ops.cosine import cosine_disagreement
from ..ops.geometry import backproject_depth, depth_outlier_mask, dilate_mask, erode_mask, morph_close
from .consensus import VoxelStats, resolve

MATCH_RADIUS = 0.75  # meters: detections within this of an object centroid merge


class VoxelMapState(NamedTuple):
    # grids, flattened over voxels V = X*Y*Z
    col_max: jnp.ndarray  # [V, C] f32 streaming column max of logits
    col_sum: jnp.ndarray  # [V, C] f32 streaming column sum
    col_exp: jnp.ndarray  # [V, C] f32 streaming sum of exp (bayesian)
    count: jnp.ndarray    # [V] i32 observation count
    vox_obj: jnp.ndarray  # [V] i32 owning object slot (-1 = free)
    # object tables, M slots
    obj_active: jnp.ndarray   # [M] bool
    obj_class: jnp.ndarray    # [M] i32
    obj_pos_sum: jnp.ndarray  # [M, 3] f32
    obj_pts: jnp.ndarray      # [M] f32  point count
    obj_logits: jnp.ndarray   # [M, K, C] f32 ring buffer
    obj_logit_cnt: jnp.ndarray  # [M] i32
    obj_emb: jnp.ndarray      # [M, K, D] f32 ring buffer
    obj_emb_cnt: jnp.ndarray  # [M] i32
    # geometry
    lower: jnp.ndarray  # [3] world-space lower bound
    episode: jnp.ndarray  # [] i32

    @property
    def num_objects(self) -> jnp.ndarray:
        return jnp.sum(self.obj_active.astype(jnp.int32))


def create(cfg: MapConfig, lower_bound, episode: int = 0) -> VoxelMapState:
    X, Y, Z = cfg.grid
    V = X * Y * Z
    C = cfg.num_classes
    M = cfg.max_objects
    K = cfg.max_views_per_object
    D = cfg.embed_dim
    return VoxelMapState(
        col_max=jnp.full((V, C), -jnp.inf, jnp.float32),
        col_sum=jnp.zeros((V, C), jnp.float32),
        col_exp=jnp.zeros((V, C), jnp.float32),
        count=jnp.zeros((V,), jnp.int32),
        vox_obj=jnp.full((V,), -1, jnp.int32),
        obj_active=jnp.zeros((M,), bool),
        obj_class=jnp.full((M,), -1, jnp.int32),
        obj_pos_sum=jnp.zeros((M, 3), jnp.float32),
        obj_pts=jnp.zeros((M,), jnp.float32),
        obj_logits=jnp.zeros((M, K, C), jnp.float32),
        obj_logit_cnt=jnp.zeros((M,), jnp.int32),
        obj_emb=jnp.zeros((M, K, D), jnp.float32),
        obj_emb_cnt=jnp.zeros((M,), jnp.int32),
        lower=jnp.asarray(lower_bound, jnp.float32),
        episode=jnp.asarray(episode, jnp.int32),
    )


# ---------------------------------------------------------------------------
# voxel indexing
# ---------------------------------------------------------------------------

def world_to_voxel(points: jnp.ndarray, lower: jnp.ndarray, cfg: MapConfig
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World points [..., 3] -> (flat voxel index [...], in-bounds mask)."""
    X, Y, Z = cfg.grid
    ijk = jnp.floor((points - lower) / cfg.voxel_size).astype(jnp.int32)
    inb = ((ijk[..., 0] >= 0) & (ijk[..., 0] < X)
           & (ijk[..., 1] >= 0) & (ijk[..., 1] < Y)
           & (ijk[..., 2] >= 0) & (ijk[..., 2] < Z))
    ijk = jnp.clip(ijk, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    flat = (ijk[..., 0] * Y + ijk[..., 1]) * Z + ijk[..., 2]
    return flat, inb


def voxel_centers(flat: jnp.ndarray, lower: jnp.ndarray, cfg: MapConfig
                  ) -> jnp.ndarray:
    X, Y, Z = cfg.grid
    x = flat // (Y * Z)
    y = (flat // Z) % Y
    z = flat % Z
    ijk = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    return lower + (ijk + 0.5) * cfg.voxel_size


# ---------------------------------------------------------------------------
# the per-frame fusion update
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "hfov_deg"))
def integrate_frame(state: VoxelMapState, depth: jnp.ndarray,
                    pose: jnp.ndarray, masks: jnp.ndarray,
                    classes: jnp.ndarray, logits: jnp.ndarray,
                    embeddings: jnp.ndarray, det_valid: jnp.ndarray,
                    cfg: MapConfig, hfov_deg: float = 79.0,
                    min_depth: float = 0.5, max_depth: float = 15.0,
                    ) -> VoxelMapState:
    """Fuse one frame's detections into the map.

    Equivalent of the reference's ``project_semantic_masks_to_3d`` +
    ``pcd.__add__`` + ``pcd.preprocess()`` chain
    (ref: projection_utils.py:144-206, 388-430, 461-588) collapsed into one
    scatter pass: mask erosion (7x7), depth clamps, per-instance 1-sigma depth
    outlier removal, voxelization, streaming consensus stats, object identity.

    Args:
      depth: [H, W]; pose: [4, 4] T_world_cam; masks: [N, H, W] float/bool;
      classes: [N] i32; logits: [N, C]; embeddings: [N, D]; det_valid: [N].
    """
    n_det = masks.shape[0]
    points, dvalid = backproject_depth(depth, pose, hfov_deg, min_depth,
                                       max_depth)
    flat_idx, inb = world_to_voxel(points, state.lower, cfg)
    V = state.count.shape[0]

    # per-detection refined pixel masks: erode 7x7, depth range, outliers
    def refine(mask):
        m = erode_mask(mask > 0.5, 7) & dvalid
        return depth_outlier_mask(depth, m)

    pix_masks = jax.vmap(refine)(masks) & det_valid[:, None, None]  # [N,H,W]

    # ---- object identity: sequential allocate/match over N dets -----------
    def det_centroid(pm):
        wsum = jnp.sum(pm)
        c = jnp.sum(jnp.where(pm[..., None], points, 0.0), axis=(0, 1))
        return c / jnp.maximum(wsum, 1.0), wsum

    centroids, pix_counts = jax.vmap(det_centroid)(pix_masks)
    usable = det_valid & (pix_counts > 0)

    def assign(carry, i):
        obj_active, obj_class, obj_pos_sum, obj_pts = carry
        c = centroids[i]
        cls = classes[i]
        cent = obj_pos_sum / jnp.maximum(obj_pts, 1.0)[:, None]
        dist = jnp.linalg.norm(cent - c[None, :], axis=-1)
        cand = obj_active & (obj_class == cls) & (dist < MATCH_RADIUS)
        dist_m = jnp.where(cand, dist, jnp.inf)
        best = jnp.argmin(dist_m)
        has_match = jnp.isfinite(dist_m[best])
        free = jnp.argmin(obj_active.astype(jnp.int32))  # first inactive slot
        # when every slot is active and nothing matched, DROP the detection
        # (slot -1, upd False) instead of merging it into slot 0
        has_free = ~jnp.all(obj_active)
        slot = jnp.where(has_match, best, jnp.where(has_free, free, -1))
        slot = jnp.where(usable[i], slot, -1)
        upd = slot >= 0
        obj_active = obj_active.at[slot].set(jnp.where(upd, True,
                                                       obj_active[slot]))
        obj_class = obj_class.at[slot].set(jnp.where(upd, cls,
                                                     obj_class[slot]))
        obj_pos_sum = obj_pos_sum.at[slot].add(
            jnp.where(upd, c * pix_counts[i], 0.0))
        obj_pts = obj_pts.at[slot].add(jnp.where(upd, pix_counts[i], 0.0))
        return (obj_active, obj_class, obj_pos_sum, obj_pts), slot

    (obj_active, obj_class, obj_pos_sum, obj_pts), slots = jax.lax.scan(
        assign,
        (state.obj_active, state.obj_class, state.obj_pos_sum, state.obj_pts),
        jnp.arange(n_det),
    )

    # ---- append view logits / embeddings into ring buffers ----------------
    K = state.obj_emb.shape[1]
    obj_logits, obj_logit_cnt = state.obj_logits, state.obj_logit_cnt
    obj_emb, obj_emb_cnt = state.obj_emb, state.obj_emb_cnt

    def append(carry, i):
        obj_logits, obj_logit_cnt, obj_emb, obj_emb_cnt = carry
        s = slots[i]
        upd = usable[i] & (s >= 0)  # overflow-dropped detections have slot -1
        lpos = obj_logit_cnt[s] % K
        epos = obj_emb_cnt[s] % K
        obj_logits = obj_logits.at[s, lpos].set(
            jnp.where(upd, logits[i], obj_logits[s, lpos]))
        obj_logit_cnt = obj_logit_cnt.at[s].add(jnp.where(upd, 1, 0))
        obj_emb = obj_emb.at[s, epos].set(
            jnp.where(upd, embeddings[i], obj_emb[s, epos]))
        obj_emb_cnt = obj_emb_cnt.at[s].add(jnp.where(upd, 1, 0))
        return (obj_logits, obj_logit_cnt, obj_emb, obj_emb_cnt), None

    (obj_logits, obj_logit_cnt, obj_emb, obj_emb_cnt), _ = jax.lax.scan(
        append, (obj_logits, obj_logit_cnt, obj_emb, obj_emb_cnt),
        jnp.arange(n_det))

    # ---- voxel scatter of consensus stats + ownership ---------------------
    # flatten pixels of all detections into one scatter; invalid pixels are
    # redirected to a dump row V (grids padded by one row). Detections
    # dropped on object-table overflow (slot == -1) dump entirely: their
    # stats must not accumulate, and writing -1 into vox_obj would erase a
    # real object's voxel ownership (its disagreement contribution with it).
    ok_det = usable & (slots >= 0)
    pix_ok = pix_masks & inb[None] & ok_det[:, None, None]  # [N, H, W]
    tgt = jnp.where(pix_ok, flat_idx[None], V).reshape(n_det, -1)  # [N, P]
    P = tgt.shape[1]

    col_max = jnp.concatenate([state.col_max,
                               jnp.full((1, state.col_max.shape[1]),
                                        -jnp.inf)], 0)
    col_sum = jnp.concatenate([state.col_sum,
                               jnp.zeros((1, state.col_sum.shape[1]))], 0)
    col_exp = jnp.concatenate([state.col_exp,
                               jnp.zeros((1, state.col_exp.shape[1]))], 0)
    count = jnp.concatenate([state.count, jnp.zeros((1,), jnp.int32)], 0)
    vox_obj = jnp.concatenate([state.vox_obj,
                               jnp.full((1,), -1, jnp.int32)], 0)

    det_rows = logits.astype(jnp.float32)           # [N, C]
    det_exp = jnp.exp(det_rows)

    def scatter_det(carry, i):
        col_max, col_sum, col_exp, count, vox_obj = carry
        t = tgt[i]  # [P]
        col_max = col_max.at[t].max(jnp.broadcast_to(det_rows[i],
                                                     (P, det_rows.shape[1])))
        col_sum = col_sum.at[t].add(jnp.broadcast_to(det_rows[i],
                                                     (P, det_rows.shape[1])))
        col_exp = col_exp.at[t].add(jnp.broadcast_to(det_exp[i],
                                                     (P, det_exp.shape[1])))
        count = count.at[t].add(1)
        vox_obj = vox_obj.at[t].set(jnp.full((P,), slots[i], jnp.int32))
        return (col_max, col_sum, col_exp, count, vox_obj), None

    (col_max, col_sum, col_exp, count, vox_obj), _ = jax.lax.scan(
        scatter_det, (col_max, col_sum, col_exp, count, vox_obj),
        jnp.arange(n_det))

    return state._replace(
        col_max=col_max[:V], col_sum=col_sum[:V], col_exp=col_exp[:V],
        count=count[:V], vox_obj=vox_obj[:V],
        obj_active=obj_active, obj_class=obj_class,
        obj_pos_sum=obj_pos_sum, obj_pts=obj_pts,
        obj_logits=obj_logits, obj_logit_cnt=obj_logit_cnt,
        obj_emb=obj_emb, obj_emb_cnt=obj_emb_cnt,
    )


# ---------------------------------------------------------------------------
# readouts
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def object_disagreement(state: VoxelMapState, cfg: MapConfig) -> jnp.ndarray:
    """[M] mean pairwise cosine distance of each object's view embeddings
    (ref: projection_utils.py:738-767, 928-942)."""
    K = state.obj_emb.shape[1]
    cnt = jnp.minimum(state.obj_emb_cnt, K)
    return cosine_disagreement(state.obj_emb, cnt)


@functools.partial(jax.jit, static_argnames=("cfg",))
def resolve_map(state: VoxelMapState, cfg: MapConfig):
    """Per-voxel (class, logits) via the configured consensus strategy."""
    stats = VoxelStats(state.col_max, state.col_sum, state.col_exp,
                       state.count)
    return resolve(stats, cfg.solution)


@functools.partial(jax.jit, static_argnames=("cfg",))
def topdown_maps(state: VoxelMapState, cfg: MapConfig) -> jnp.ndarray:
    """4-channel top-down map [Z, X, 4]: (obstacle, explored, semantic,
    disagreement) (ref: projection_utils.py:681-798 get_topdown_semantic).

    Rendered at voxel resolution with rows = Z, cols = X like the reference's
    raster (grid_y from world z, grid_x from world x). Obstacle = occupancy
    within the height band, dilated 3x3 and closed; explored = any occupancy
    below the upper height; semantic = consensus class + 1 (0 = free);
    disagreement = per-column max of the owning objects' disagreement scores,
    inflated 3x3.
    """
    X, Y, Z = cfg.grid
    occ3 = (state.count > 0).reshape(X, Y, Z)
    ylow, yhigh = cfg.height_thresh
    y_m = (jnp.arange(Y) + 0.5) * cfg.voxel_size + state.lower[1]
    band = (y_m > ylow) & (y_m < yhigh)
    below_high = y_m < yhigh

    obstacle = jnp.any(occ3 & band[None, :, None], axis=1)        # [X, Z]
    explored = jnp.any(occ3 & below_high[None, :, None], axis=1)  # [X, Z]

    cls, _ = resolve_map(state, cfg)
    cls3 = cls.reshape(X, Y, Z)
    sem = jnp.max(jnp.where(occ3 & below_high[None, :, None], cls3 + 1, 0),
                  axis=1)  # [X, Z], 0 = free

    dis = object_disagreement(state, cfg)           # [M]
    dis_pad = jnp.concatenate([dis, jnp.zeros((1,))])  # slot -1 -> 0
    vox_dis = dis_pad[state.vox_obj].reshape(X, Y, Z)
    vox_dis = jnp.where(occ3, vox_dis, 0.0)
    dmap = jnp.max(vox_dis, axis=1)                 # [X, Z]

    # transpose to (rows=Z, cols=X) raster
    obstacle_t = obstacle.T
    explored_t = explored.T
    sem_t = sem.T.astype(jnp.float32)
    dmap_t = dmap.T

    obstacle_t = dilate_mask(obstacle_t, 3)
    obstacle_t = morph_close(obstacle_t, 3)
    explored_t = morph_close(explored_t, 3) | obstacle_t
    # 3x3 inflation of disagreement (ref :769-786)
    dmap_t = jax.lax.reduce_window(dmap_t, 0.0, jax.lax.max, (3, 3), (1, 1),
                                   "SAME")
    return jnp.stack([obstacle_t.astype(jnp.float32),
                      explored_t.astype(jnp.float32), sem_t, dmap_t], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def disagreement_reward(state: VoxelMapState, cfg: MapConfig,
                        scale: float = 1e-3) -> jnp.ndarray:
    """Scalar reward = disagreement_map.sum() * scale
    (ref: envs/env_habitat3.py:75-84: sum() / 1000)."""
    maps = topdown_maps(state, cfg)
    return jnp.sum(maps[..., 3]) * scale


@functools.partial(jax.jit, static_argnames=("cfg", "hfov_deg", "max_objects_out"))
def raytrace_pseudo_labels(state: VoxelMapState, depth: jnp.ndarray,
                           pose: jnp.ndarray, cfg: MapConfig,
                           hfov_deg: float = 79.0,
                           max_objects_out: int = 16,
                           min_pixels: int = 100):
    """Re-render map objects into a camera: per-pixel owning object via exact
    voxel lookup of the back-projected depth (replaces the reference's KDTree
    radius query, ref: projection_utils.py:846-925 _depth_raytracing; exact at
    voxel resolution, which is the KDTree threshold 2*thr anyway).

    Returns (masks [O, H, W] bool, object_slots [O] i32, classes [O] i32,
    logits [O, C], valid [O]) for the ``max_objects_out`` largest visible
    objects with >= min_pixels support.
    """
    points, dvalid = backproject_depth(depth, pose, hfov_deg)
    flat_idx, inb = world_to_voxel(points, state.lower, cfg)
    ok = dvalid & inb
    vox_obj = jnp.where(state.count > 0, state.vox_obj, -1)
    pix_obj = jnp.where(ok, vox_obj[flat_idx], -1)  # [H, W]

    M = state.obj_active.shape[0]
    onehot_counts = jax.ops.segment_sum(
        jnp.ones_like(pix_obj.reshape(-1), jnp.int32),
        jnp.where(pix_obj.reshape(-1) < 0, M, pix_obj.reshape(-1)),
        num_segments=M + 1)[:M]
    eligible = state.obj_active & (onehot_counts >= min_pixels)
    counts_m = jnp.where(eligible, onehot_counts, -1)
    top_slots = jnp.argsort(-counts_m)[:max_objects_out]
    valid = eligible[top_slots]

    masks = pix_obj[None, :, :] == top_slots[:, None, None]
    masks = masks & valid[:, None, None]
    classes = jnp.where(valid, state.obj_class[top_slots], -1)

    # resolve per-object logits from the ring buffer with the map's strategy
    K = state.obj_logits.shape[1]
    rows = state.obj_logits[top_slots]              # [O, K, C]
    rcnt = jnp.minimum(state.obj_logit_cnt[top_slots], K)
    row_valid = jnp.arange(K)[None, :] < rcnt[:, None]
    from .consensus import VoxelStats as _VS
    neg = jnp.float32(-jnp.inf)
    stats = _VS(
        col_max=jnp.max(jnp.where(row_valid[..., None], rows, neg), axis=1),
        col_sum=jnp.sum(jnp.where(row_valid[..., None], rows, 0.0), axis=1),
        col_exp=jnp.sum(jnp.where(row_valid[..., None], jnp.exp(rows), 0.0),
                        axis=1),
        count=rcnt,
    )
    _, logits = resolve(stats, cfg.solution)
    return masks, top_slots.astype(jnp.int32), classes, logits, valid


@functools.partial(jax.jit, static_argnames=("cfg", "hfov_deg"))
def kl_score(state: VoxelMapState, depth: jnp.ndarray, pose: jnp.ndarray,
             pred_masks: jnp.ndarray, pred_logits: jnp.ndarray,
             pred_valid: jnp.ndarray, cfg: MapConfig,
             hfov_deg: float = 79.0) -> jnp.ndarray:
    """Per-detection KL(map-consensus logits || prediction logits) where the
    detection's points land on mapped objects (ref: projection_utils.py:807-844
    _get_kl, used by the SemanticDisagreement-kl env). Returns [N] float32
    (0 where no overlap)."""
    points, dvalid = backproject_depth(depth, pose, hfov_deg)
    flat_idx, inb = world_to_voxel(points, state.lower, cfg)
    ok = dvalid & inb
    _, map_logits = resolve_map(state, cfg)
    occupied = state.count > 0

    def per_det(mask, logit):
        m = (mask > 0.5) & ok
        hit = m & occupied[flat_idx]
        w = hit.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
        tgt = jnp.sum(map_logits[flat_idx] * w[..., None], axis=(0, 1)) / n
        p = jax.nn.softmax(tgt)
        logq = jax.nn.log_softmax(logit)
        kl = jnp.sum(p * (jnp.log(jnp.maximum(p, 1e-12)) - logq))
        return jnp.where(jnp.any(hit), kl, 0.0)

    kls = jax.vmap(per_det)(pred_masks, pred_logits.astype(jnp.float32))
    return jnp.where(pred_valid, kls, 0.0)
