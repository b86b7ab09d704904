"""Point-cloud viewer: native C++ ball rasterizer + interactive loop.

Covers the reference viewer's capabilities (utils/show3d_balls.py:25-157):
z-buffered shaded-ball rendering, per-point colors/magnification, rotation
and zoom controls. Headless use — `render(points, ...) -> (H, W, 3) uint8`
— works everywhere; the interactive loop needs OpenCV and a display.

The rasterizer is a C++ .so loaded via ctypes and built on demand with g++
(no build system needed); a vectorized numpy fallback keeps rendering
available when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "render_balls.cpp")
_SO = os.path.join(os.path.dirname(__file__), "librender_balls.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    except OSError:  # source pruned from the install; use the .so as-is
        stale = not os.path.exists(_SO)
    if stale:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            # no compiler (or build failed): an already-built .so on disk
            # (merely older than the source after a checkout) still beats
            # the numpy fallback — fall through and try to load it
            if not os.path.exists(_SO):
                _lib = False
                return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.render_balls.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def _render_numpy(h, w, xyz, colors, radii, image=None):
    """Vectorized fallback: nearest-point-wins per pixel, flat shading.
    `image` (background-initialized) is drawn into when given."""
    if image is None:
        image = np.zeros((h, w, 3), np.uint8)
    zbuf = np.full((h, w), -np.inf, np.float32)
    order = np.argsort(xyz[:, 2])  # far-to-near painter with z test
    for i in order:
        xf, yf, z = xyz[i]
        r = int(max(radii[i], 1))
        x, y = int(round(xf)), int(round(yf))
        x0, x1 = max(x - r, 0), min(x + r + 1, h)
        y0, y1 = max(y - r, 0), min(y + r + 1, w)
        if x0 >= x1 or y0 >= y1:
            continue
        gx, gy = np.mgrid[x0:x1, y0:y1]
        # exact float centers, matching the C++ rasterizer's geometry
        d2 = (gx - xf) ** 2 + (gy - yf) ** 2
        inside = d2 <= r * r
        dz = np.sqrt(np.maximum(r * r - d2, 0))
        zs = z + dz
        upd = inside & (zs > zbuf[x0:x1, y0:y1])
        zbuf[x0:x1, y0:y1][upd] = zs[upd]
        shade = (0.35 + 0.65 * dz / max(r, 1))[upd]
        image[x0:x1, y0:y1][upd] = (colors[i] * shade[:, None]).astype(np.uint8)
    return image


def render(points: np.ndarray, colors: np.ndarray | None = None,
           canvas: int = 800, ballradius: int = 10, background=(0, 0, 0),
           normalize: bool = True, rot: np.ndarray | None = None) -> np.ndarray:
    """Render (N, 3) points to an (canvas, canvas, 3) uint8 image."""
    pts = np.asarray(points, np.float32).copy()
    n = len(pts)
    if colors is None:
        colors = np.full((n, 3), 255, np.uint8)
    else:
        colors = np.asarray(colors, np.uint8)
        if colors.ndim == 1:
            colors = np.broadcast_to(colors, (n, 3)).copy()
    if normalize and n:
        pts -= pts.mean(axis=0)
        scale = np.max(np.linalg.norm(pts, axis=1)) or 1.0
        pts /= scale
    if rot is not None:
        pts = pts @ np.asarray(rot, np.float32).T
    proj = np.empty_like(pts)
    proj[:, 0] = pts[:, 1] * canvas * 0.35 + canvas / 2  # row
    proj[:, 1] = pts[:, 0] * canvas * 0.35 + canvas / 2  # col
    proj[:, 2] = pts[:, 2]
    radii = np.full(n, float(ballradius), np.float32)

    lib = _load_lib()
    image = np.zeros((canvas, canvas, 3), np.uint8)
    image[:] = background
    if lib:
        # Bind the marshalled arrays to locals: taking .ctypes.data of an
        # unreferenced temporary (e.g. astype(...).ctypes.data) hands the
        # C call a pointer the allocator may reuse mid-render — observed
        # as nondeterministically blank frames.
        proj32 = np.ascontiguousarray(proj, np.float32)
        colors8 = np.ascontiguousarray(colors, np.uint8)
        lib.render_balls(canvas, canvas, image.ctypes.data, n,
                         proj32.ctypes.data, colors8.ctypes.data,
                         radii.ctypes.data)
    else:
        image = _render_numpy(canvas, canvas, proj, colors, radii,
                              image=image)
    return image


def _rotmat(xangle: float, yangle: float) -> np.ndarray:
    cy, sy = np.cos(yangle), np.sin(yangle)
    cx, sx = np.cos(xangle), np.sin(xangle)
    Ry = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, sx], [0, -sx, cx]])
    return Rx @ Ry


def showpoints(points, colors=None, ballradius=10, canvas=800,
               background=(0, 0, 0)):
    """Interactive viewer (needs OpenCV + display). Keys: q quit, n/m ball
    size, drag to rotate — the reference viewer's interaction model."""
    import cv2  # deferred; optional dependency

    state = {"x": 0.0, "y": 0.0, "down": None, "r": ballradius}

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            state["down"] = (x, y, state["x"], state["y"])
        elif event == cv2.EVENT_LBUTTONUP:
            state["down"] = None
        elif event == cv2.EVENT_MOUSEMOVE and state["down"]:
            x0, y0, ax, ay = state["down"]
            state["y"] = ay + (x - x0) * 0.01
            state["x"] = ax + (y - y0) * 0.01

    cv2.namedWindow("pointnet2_tpu viewer")
    cv2.setMouseCallback("pointnet2_tpu viewer", on_mouse)
    while True:
        img = render(points, colors, canvas=canvas, ballradius=state["r"],
                     background=background,
                     rot=_rotmat(state["x"], state["y"]))
        cv2.imshow("pointnet2_tpu viewer", img[:, :, ::-1])
        key = cv2.waitKey(16) & 0xFF
        if key == ord("q"):
            break
        if key == ord("n"):
            state["r"] = max(1, state["r"] - 1)
        if key == ord("m"):
            state["r"] += 1
    cv2.destroyAllWindows()
