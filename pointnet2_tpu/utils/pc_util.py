"""Point-cloud conversion, IO, and rendering utilities.

Covers the capability surface of the reference's utils/pc_util.py and
scannet/pc_util.py with vectorized numpy implementations (the reference
loops per point/voxel in Python and depends on an `eulerangles` module that
is not actually present in its tree):

- surface-voxel label voting (exact majority + first-point "fast" variant
  used by the ScanNet voxel-accuracy protocol, scannet/pc_util.py:23-51)
- point cloud <-> occupancy volume / per-voxel point samples
- PLY IO (plyfile if available, ASCII fallback otherwise)
- z-buffered Gaussian-disk renderer + canonical three-view image
  (utils/pc_util.py:176-315)
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------------
# Voxel label voting (ScanNet evaluation protocol)
# ----------------------------------------------------------------------

def point_cloud_label_to_surface_voxel_label(point_cloud, label, res=0.0484):
    """Majority label per occupied voxel. label: (N,) or (N, K).

    NOTE (both variants): the per-axis voxel index can attain nvox (the
    max-coordinate point) while nvox is also the stride, so voxel
    (nvox0, y, z) aliases (0, y+1, z). The reference's scannet/pc_util.py
    has the identical formula; kept bit-for-bit for voxel-accuracy
    protocol parity."""
    coordmin = point_cloud.min(axis=0)
    nvox = np.ceil((point_cloud.max(axis=0) - coordmin) / res)
    vidx = np.ceil((point_cloud - coordmin) / res)
    vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
    uvidx, inverse = np.unique(vidx, return_inverse=True)
    label2d = label[:, None] if label.ndim == 1 else label
    uvlabel = np.zeros((len(uvidx), label2d.shape[1]), label2d.dtype)
    for k in range(label2d.shape[1]):
        # majority vote via 2-D bincount over (voxel, class)
        ncls = int(label2d[:, k].max()) + 1
        counts = np.zeros((len(uvidx), ncls), np.int64)
        np.add.at(counts, (inverse, label2d[:, k].astype(np.int64)), 1)
        uvlabel[:, k] = counts.argmax(axis=1)
    return uvidx, (uvlabel[:, 0] if label.ndim == 1 else uvlabel), nvox


def point_cloud_label_to_surface_voxel_label_fast(point_cloud, label,
                                                  res=0.0484):
    """First-point label per occupied voxel (the variant the reference's
    ScanNet voxel-accuracy numbers use, scannet/pc_util.py:39-51)."""
    coordmin = point_cloud.min(axis=0)
    nvox = np.ceil((point_cloud.max(axis=0) - coordmin) / res)
    vidx = np.ceil((point_cloud - coordmin) / res)
    vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
    uvidx, vpidx = np.unique(vidx, return_index=True)
    uvlabel = label[vpidx] if label.ndim == 1 else label[vpidx, :]
    return uvidx, uvlabel, nvox


# ----------------------------------------------------------------------
# Point cloud <-> volume
# ----------------------------------------------------------------------

def point_cloud_to_volume(points, vsize, radius=1.0):
    """(N,3) in [-radius, radius] -> binary occupancy (vsize^3)."""
    vol = np.zeros((vsize, vsize, vsize), np.float32)
    voxel = 2 * radius / float(vsize)
    loc = ((points + radius) / voxel).astype(int)
    keep = ((loc >= 0) & (loc < vsize)).all(axis=1)
    loc = loc[keep]
    vol[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    return vol


def point_cloud_to_volume_batch(point_clouds, vsize=12, radius=1.0,
                                flatten=True):
    vols = [point_cloud_to_volume(pc, vsize, radius) for pc in point_clouds]
    if flatten:
        return np.stack([v.reshape(-1) for v in vols])
    return np.stack(vols)[..., None]


def volume_to_point_cloud(vol):
    """Occupancy grid -> (N,3) voxel coordinates."""
    return np.argwhere(vol == 1).astype(np.float64)


def point_cloud_to_volume_v2(points, vsize, radius=1.0, num_sample=128):
    """(N,3) -> (vsize,vsize,vsize,num_sample,3): num_sample points per
    voxel (random subsample / edge-pad), centered and scaled per voxel."""
    vol = np.zeros((vsize, vsize, vsize, num_sample, 3), np.float32)
    voxel = 2 * radius / float(vsize)
    loc = ((points + radius) / voxel).astype(int)
    keep = ((loc >= 0) & (loc < vsize)).all(axis=1)
    points, loc = points[keep], loc[keep]
    flat = loc[:, 0] * vsize * vsize + loc[:, 1] * vsize + loc[:, 2]
    order = np.argsort(flat, kind="stable")
    flat, points, loc = flat[order], points[order], loc[order]
    starts = np.searchsorted(flat, np.unique(flat))
    bounds = np.append(starts, len(flat))
    for s, e in zip(bounds[:-1], bounds[1:]):
        pc = points[s:e]
        i, j, k = loc[s]
        if pc.shape[0] > num_sample:
            pc = pc[np.random.choice(pc.shape[0], num_sample, replace=False)]
        elif pc.shape[0] < num_sample:
            pc = np.pad(pc, ((0, num_sample - pc.shape[0]), (0, 0)), "edge")
        center = (np.array([i, j, k]) + 0.5) * voxel - radius
        vol[i, j, k] = (pc - center) / voxel
    return vol


def point_cloud_to_volume_v2_batch(point_clouds, vsize=12, radius=1.0,
                                   num_sample=128):
    return np.stack([point_cloud_to_volume_v2(pc, vsize, radius, num_sample)
                     for pc in point_clouds])


def point_cloud_to_image(points, imgsize, radius=1.0, num_sample=128):
    """(N,3) -> (imgsize,imgsize,num_sample,3) xy-pixel binned samples."""
    img = np.zeros((imgsize, imgsize, num_sample, 3), np.float32)
    pixel = 2 * radius / float(imgsize)
    loc = ((points[:, 0:2] + radius) / pixel).astype(int)
    keep = ((loc >= 0) & (loc < imgsize)).all(axis=1)
    points, loc = points[keep], loc[keep]
    flat = loc[:, 0] * imgsize + loc[:, 1]
    order = np.argsort(flat, kind="stable")
    flat, points, loc = flat[order], points[order], loc[order]
    starts = np.searchsorted(flat, np.unique(flat))
    bounds = np.append(starts, len(flat))
    for s, e in zip(bounds[:-1], bounds[1:]):
        pc = points[s:e].copy()
        i, j = loc[s]
        if pc.shape[0] > num_sample:
            pc = pc[np.random.choice(pc.shape[0], num_sample, replace=False)]
        elif pc.shape[0] < num_sample:
            pc = np.pad(pc, ((0, num_sample - pc.shape[0]), (0, 0)), "edge")
        center = (np.array([i, j]) + 0.5) * pixel - radius
        pc[:, 0:2] = (pc[:, 0:2] - center) / pixel
        img[i, j] = pc
    return img


def point_cloud_to_image_batch(point_clouds, imgsize, radius=1.0,
                               num_sample=128):
    return np.stack([point_cloud_to_image(pc, imgsize, radius, num_sample)
                     for pc in point_clouds])


# ----------------------------------------------------------------------
# PLY IO
# ----------------------------------------------------------------------

def read_ply(filename):
    """Read an xyz point cloud from a PLY file -> (N,3)."""
    try:
        from plyfile import PlyData

        pc = PlyData.read(filename)["vertex"].data
        return np.stack([pc["x"], pc["y"], pc["z"]], axis=-1)
    except ImportError:
        return _read_ply_ascii(filename)


def _read_ply_ascii(filename):
    with open(filename) as f:
        line = f.readline().strip()
        assert line == "ply", "not a PLY file"
        n = 0
        while True:
            line = f.readline().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        pts = np.atleast_2d(np.loadtxt(f, max_rows=n))
    return pts[:, :3].astype(np.float32)


def write_ply(points, filename, text=True):
    """Write (N,3) points to a PLY file."""
    try:
        from plyfile import PlyData, PlyElement

        vertex = np.array([tuple(p) for p in points[:, :3]],
                          dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
        el = PlyElement.describe(vertex, "vertex", comments=["vertices"])
        PlyData([el], text=text).write(filename)
    except ImportError:
        with open(filename, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(points)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            np.savetxt(f, points[:, :3], fmt="%.6f")


def write_ply_color(points, labels, filename, num_classes=None):
    """Colored PLY by per-point label (scannet/pc_util.py capability)."""
    labels = labels.astype(int)
    num_classes = num_classes or int(labels.max()) + 1
    rng = np.random.default_rng(0)
    colors = (rng.random((num_classes, 3)) * 255).astype(np.uint8)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n")
        for p, l in zip(points, labels):
            c = colors[l]
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def write_ply_rgb(points, colors, filename):
    """Per-point RGB PLY (scannet/pc_util.py:371, used by the ScanNet
    preprocessing demo to dump colored scenes)."""
    colors = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def read_ply_xyz(filename):
    """Alias for read_ply (scannet/pc_util.py:212 capability)."""
    return read_ply(filename)


def read_ply_xyzrgb(filename):
    """Read xyz + rgb from a PLY file -> (N, 6)
    (scannet/pc_util.py:224; also data/scannet_preprocessing.py)."""
    from pointnet2_tpu.data.scannet_preprocessing import (
        read_ply_xyzrgb as _impl,
    )

    return _impl(filename)


# ----------------------------------------------------------------------
# Renderers
# ----------------------------------------------------------------------

def _euler2mat(z=0.0, y=0.0, x=0.0):
    """Rotation matrix from z-y-x Euler angles (replaces the reference's
    missing `eulerangles` import, utils/pc_util.py:13)."""
    Ms = []
    if z:
        c, s = np.cos(z), np.sin(z)
        Ms.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]))
    if y:
        c, s = np.cos(y), np.sin(y)
        Ms.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]))
    if x:
        c, s = np.cos(x), np.sin(x)
        Ms.append(np.array([[1, 0, 0], [0, c, -s], [0, s, c]]))
    M = np.eye(3)
    for m in Ms:
        M = M @ m
    return M


def draw_point_cloud(input_points, canvasSize=500, space=200, diameter=25,
                     xrot=0.0, yrot=0.0, zrot=0.0, switch_xyz=(0, 1, 2),
                     normalize=True):
    """Render points to a gray z-buffered Gaussian-splat image."""
    image = np.zeros((canvasSize, canvasSize))
    if input_points is None or input_points.shape[0] == 0:
        return image
    points = input_points[:, list(switch_xyz)]
    points = (_euler2mat(zrot, yrot, xrot) @ points.T).T
    if normalize:
        points = points - points.mean(axis=0)
        points /= np.max(np.sqrt(np.sum(points ** 2, axis=-1)))

    radius = (diameter - 1) / 2.0
    ii, jj = np.mgrid[0:diameter, 0:diameter]
    disk = np.where((ii - radius) ** 2 + (jj - radius) ** 2 <= radius ** 2,
                    np.exp((-(ii - radius) ** 2 - (jj - radius) ** 2)
                           / radius ** 2), 0.0)
    mask = np.argwhere(disk > 0)
    dx, dy = mask[:, 0], mask[:, 1]
    dv = disk[disk > 0]

    zorder = np.argsort(points[:, 2])
    points = points[zorder]
    zmin, zmax = points[:, 2].min(), points[:, 2].max()
    depth = (points[:, 2] - zmin) / max(zmax - zmin, 1e-12)
    max_depth = depth.max()

    for j in range(points.shape[0] - 1, -1, -1):
        xc = int(round(canvasSize / 2 + points[j, 0] * space))
        yc = int(round(canvasSize / 2 + points[j, 1] * space))
        px, py = dx + xc, dy + yc
        ok = (px >= 0) & (px < canvasSize) & (py >= 0) & (py < canvasSize)
        image[px[ok], py[ok]] = (image[px[ok], py[ok]] * 0.7
                                 + dv[ok] * (max_depth - depth[j]) * 0.3)
    m = image.max()
    return image / m if m > 0 else image


def point_cloud_three_views(points):
    """(N,3) with +y up -> (500, 1500) gray image of three canonical views."""
    img1 = draw_point_cloud(points, zrot=110 / 180.0 * np.pi,
                            xrot=45 / 180.0 * np.pi)
    img2 = draw_point_cloud(points, zrot=70 / 180.0 * np.pi,
                            xrot=135 / 180.0 * np.pi)
    img3 = draw_point_cloud(points, zrot=np.pi, xrot=90 / 180.0 * np.pi)
    return np.concatenate([img1, img2, img3], axis=1)


def point_cloud_three_views_demo(ply_path, out_path="point_cloud_demo.jpg"):
    """Render a PLY to a three-view image file
    (utils/pc_util.py:269 capability; PNG/JPG via matplotlib if present,
    else raw .npy)."""
    img = point_cloud_three_views(read_ply(ply_path))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(out_path, img, cmap="gray")
    except ImportError:
        out_path = out_path + ".npy"
        np.save(out_path, img)
    return out_path


# ----------------------------------------------------------------------
# Matplotlib wrappers (utils/pc_util.py:281-298) — optional dependency
# ----------------------------------------------------------------------

def pyplot_draw_point_cloud(points, output_filename):
    """3D scatter of (N,3) points to an image file (matplotlib required)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=2)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    fig.savefig(output_filename)
    plt.close(fig)


def pyplot_draw_volume(vol, output_filename):
    """Occupancy volume -> 3D scatter image (utils/pc_util.py:292)."""
    pyplot_draw_point_cloud(volume_to_point_cloud(vol), output_filename)
