"""Host-side 3D connected components (cc3d replacement).

The reference re-segments the voxel map every update with
``cc3d.connected_components(voxelize_pcd, connectivity=26)`` (C++/Cython,
ref: experimenting_env/utils/projection_utils.py:544). In the TPU rebuild the
*online* path keeps object identity on device (centroid matching,
mapping/voxel_map.py); exact 26-connectivity CC is used offline for
pseudo-label re-segmentation, where it runs on host at voxel-grid scale.

Implementation: a native C++ union-find (embodied_captioning_tpu/native/
ccl3d.cpp) loaded via ctypes, with a pure scipy.ndimage fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native_dir = os.path.join(here, "native")
    path = os.path.join(native_dir, "libecap_native.so")
    if not os.path.exists(path):
        # build on demand (g++ is part of the toolchain)
        import subprocess

        try:
            subprocess.run(["make", "-C", native_dir], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.connected_components_26.restype = ctypes.c_int32
        lib.connected_components_26.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # labels in (class+1, 0=free)
            ctypes.POINTER(ctypes.c_int32),  # out component labels
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # X, Y, Z
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def connected_components_26(grid: np.ndarray) -> Tuple[np.ndarray, int]:
    """26-connectivity connected components over a labeled 3D grid.

    Args:
      grid: [X, Y, Z] int array; 0 = background. Voxels with *different*
        nonzero values still merge if adjacent (cc3d on a class grid merges
        by foreground connectivity per label value; the reference calls it on
        the class grid, so components are per-class regions). We match cc3d
        semantics: two adjacent voxels join the same component iff they hold
        the same nonzero value.

    Returns (components [X, Y, Z] int32 with labels 1..n, n).
    """
    grid = np.ascontiguousarray(grid.astype(np.int32))
    lib = _load_native()
    if lib is not None:
        out = np.zeros_like(grid)
        n = lib.connected_components_26(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            grid.shape[0], grid.shape[1], grid.shape[2])
        return out, int(n)
    return _scipy_cc(grid)


def _scipy_cc(grid: np.ndarray) -> Tuple[np.ndarray, int]:
    from scipy import ndimage

    structure = np.ones((3, 3, 3), bool)  # 26-connectivity
    out = np.zeros(grid.shape, np.int32)
    next_label = 0
    for value in np.unique(grid):
        if value == 0:
            continue
        comp, n = ndimage.label(grid == value, structure=structure)
        out[comp > 0] = comp[comp > 0] + next_label
        next_label += n
    return out, next_label


def resegment_objects(class_grid: np.ndarray, vox_obj: np.ndarray,
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Offline re-segmentation (ref: projection_utils.py:544-588): run CC on
    the per-voxel (class+1) grid and return
    (cc_labels [X,Y,Z], old-object -> cc-label mapping, n_components).

    `vox_obj` is the device map's per-voxel owning slot (-1 = free); the
    mapping lets callers union per-object embedding/logit sets across merged
    components.
    """
    comps, n = connected_components_26(class_grid)
    max_obj = int(vox_obj.max()) + 1 if vox_obj.size else 0
    obj_to_comp = np.full((max(max_obj, 1),), -1, np.int64)
    occ = comps > 0
    if occ.any() and max_obj > 0:
        objs = vox_obj[occ]
        labels = comps[occ]
        keep = objs >= 0
        # last write wins is fine: an old object maps to whichever component
        # holds (most of) its voxels; use bincount argmax for robustness
        for o in np.unique(objs[keep]):
            sel = labels[objs == o]
            if sel.size:
                obj_to_comp[o] = np.bincount(sel).argmax()
    return comps, obj_to_comp, n
