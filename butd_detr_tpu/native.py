"""ctypes bindings for the native host runtime (csrc/butd_native.cpp).

Auto-builds `csrc/libbutd_native.so` with make on first use (g++ is part
of the supported toolchain); every entry point has a pure-python/numpy
fallback, so the package works without a compiler — the native path is a
host-CPU accelerator for the data loader and eval cold paths, mirroring
the role of the reference's compiled extension (pointnet2/setup.py) in its
stack.
"""

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc"
)
_SO = os.path.join(_CSRC, "libbutd_native.so")


@functools.lru_cache()
def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    lib = _load_or_build(rebuild=False)
    if lib is None:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # stale .so predating a newly added entry point — rebuild once
        lib = _load_or_build(rebuild=True)
        if lib is None:
            return None
        try:
            _bind(lib)
        except AttributeError:
            return None
    return lib


def _load_or_build(rebuild: bool) -> Optional[ctypes.CDLL]:
    # run make unconditionally (incremental no-op when the .so is fresh):
    # a committed-but-stale object whose EXISTING entry points changed
    # signature would otherwise bind successfully and silently compute
    # with the old ABI — mtime tells us whether to take the reload path
    before = os.path.getmtime(_SO) if os.path.exists(_SO) else None
    try:
        subprocess.run(
            ["make", "-s"] + (["-B"] if rebuild else []),
            cwd=_CSRC, check=True, capture_output=True, timeout=120,
        )
    except Exception:
        if before is None:
            return None  # nothing on disk and cannot build
    after = os.path.getmtime(_SO) if os.path.exists(_SO) else None
    if after is None:
        return None
    if rebuild or before is None or after != before:
        # freshly (re)built object: dlopen caches by pathname, so load it
        # via a UNIQUE temp copy — which also makes concurrent rebuilds
        # (e.g. dataloader workers racing) safe: no other process ever
        # sees a partially written file under a name it would open
        import shutil
        import tempfile

        try:
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CSRC)
            os.close(fd)
            shutil.copy2(_SO, tmp)
            lib = ctypes.CDLL(tmp)
            os.unlink(tmp)  # the mapping survives the unlink (POSIX)
            return lib
        except OSError:
            return None
    try:
        return ctypes.CDLL(_SO)
    except OSError:
        return None


def _bind(lib: ctypes.CDLL) -> None:
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)
    c_i32_p = ctypes.POINTER(ctypes.c_int32)

    lib.ply_vertex_count.restype = ctypes.c_long
    lib.ply_vertex_count.argtypes = [ctypes.c_char_p]
    lib.ply_read_vertices.restype = ctypes.c_long
    lib.ply_read_vertices.argtypes = [
        ctypes.c_char_p, c_float_p, c_u8_p, c_i32_p
    ]
    lib.greedy_nms.restype = ctypes.c_long
    lib.greedy_nms.argtypes = [
        c_float_p, c_float_p, c_float_p, c_i32_p,
        ctypes.c_long, ctypes.c_int, ctypes.c_float, ctypes.c_int, c_i32_p,
    ]
    lib.voc_match.restype = ctypes.c_long
    lib.voc_match.argtypes = [
        c_float_p, c_i32_p, ctypes.c_long,
        c_float_p, c_i32_p, ctypes.c_long,
        ctypes.c_float, c_u8_p, c_u8_p,
    ]
    lib.points_in_boxes.restype = None
    lib.points_in_boxes.argtypes = [
        c_float_p, ctypes.c_long, c_float_p, ctypes.c_long, c_i32_p
    ]
    lib.augment_fused.restype = None
    lib.augment_fused.argtypes = [
        c_float_p, ctypes.c_long, ctypes.c_long, c_float_p, c_float_p,
        c_float_p, ctypes.c_float, c_float_p, c_float_p, c_float_p,
    ]


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def ply_read_vertices_native(path: str):
    """Returns (xyz (n,3) f32, rgb (n,3) u8, label (n,) i32) or None if the
    native lib is unavailable / format unsupported."""
    lib = load_native()
    if lib is None:
        return None
    n = lib.ply_vertex_count(path.encode())
    if n <= 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.zeros((n, 3), np.uint8)
    label = np.full((n,), -1, np.int32)
    got = lib.ply_read_vertices(
        path.encode(), _ptr(xyz, ctypes.c_float), _ptr(rgb, ctypes.c_uint8),
        _ptr(label, ctypes.c_int32),
    )
    if got != n:
        return None
    return xyz, rgb, label


def greedy_nms_native(mins, maxs, scores, thresh, old_type=False,
                      classes=None):
    """Native greedy NMS; returns keep indices (list) or None."""
    lib = load_native()
    if lib is None:
        return None
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n, d = mins.shape
    keep = np.empty(n, np.int32)
    cls_ptr = None
    if classes is not None:
        classes = np.ascontiguousarray(classes, np.int32)
        cls_ptr = _ptr(classes, ctypes.c_int32)
    k = lib.greedy_nms(
        _ptr(mins, ctypes.c_float), _ptr(maxs, ctypes.c_float),
        _ptr(scores, ctypes.c_float), cls_ptr,
        n, d, float(thresh), int(old_type), _ptr(keep, ctypes.c_int32),
    )
    return keep[:k].tolist()


def voc_match_native(det_boxes, det_img, gt_boxes, gt_img, ovthresh):
    """Native VOC greedy matcher; returns (tp, fp) uint8 arrays or None.
    Detections must already be confidence-sorted desc."""
    lib = load_native()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    det_img = np.ascontiguousarray(det_img, np.int32)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_img = np.ascontiguousarray(gt_img, np.int32)
    nd, ng = len(det_boxes), len(gt_boxes)
    tp = np.zeros(nd, np.uint8)
    fp = np.zeros(nd, np.uint8)
    lib.voc_match(
        _ptr(det_boxes, ctypes.c_float), _ptr(det_img, ctypes.c_int32), nd,
        _ptr(gt_boxes, ctypes.c_float), _ptr(gt_img, ctypes.c_int32), ng,
        float(ovthresh), _ptr(tp, ctypes.c_uint8), _ptr(fp, ctypes.c_uint8),
    )
    return tp, fp


def points_in_boxes_native(points, boxes):
    """Counts of points inside each AABB; (k,) i32 or None."""
    lib = load_native()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    counts = np.empty(len(boxes), np.int32)
    lib.points_in_boxes(
        _ptr(points, ctypes.c_float), len(points),
        _ptr(boxes, ctypes.c_float), len(boxes),
        _ptr(counts, ctypes.c_int32),
    )
    return counts


def augment_fused_native(pc, M, noise, shift, scale, color, cscale, mean):
    """Fused in-place augmentation pass (see csrc augment_fused). `pc`
    must be a C-contiguous f32 (N, >=3) array — mutated in place; `color`
    (f32 (N, 3), mutated) may be None. Returns True, or None when the
    native lib is unavailable (caller falls back to numpy)."""
    lib = load_native()
    if lib is None:
        return None
    n, stride = pc.shape[0], pc.shape[1]
    M = np.ascontiguousarray(M, np.float32)
    noise = np.ascontiguousarray(noise, np.float32)
    shift = np.ascontiguousarray(shift, np.float32).reshape(3)
    cptr = csptr = mptr = None
    if color is not None:
        cscale = np.ascontiguousarray(cscale, np.float32)
        mean = np.ascontiguousarray(mean, np.float32).reshape(3)
        cptr = _ptr(color, ctypes.c_float)
        csptr = _ptr(cscale, ctypes.c_float)
        mptr = _ptr(mean, ctypes.c_float)
    lib.augment_fused(
        _ptr(pc, ctypes.c_float), n, stride, _ptr(M, ctypes.c_float),
        _ptr(noise, ctypes.c_float), _ptr(shift, ctypes.c_float),
        float(scale), cptr, csptr, mptr,
    )
    return True
