"""Host-side point-cloud utilities (numpy).

Equivalents of /root/reference/utils/point_cloud.py minus its heavy native deps:
Open3D-ML RadiusSearch becomes a scipy cKDTree query, cv2.projectPoints becomes
explicit pinhole math. Semantics preserved, including the reference's
frame-visibility bound quirk (x checked against image *height*, y against
*width*; point_cloud.py:130-131) — it shaped the released subscan dataset.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def normalize_pc(pc: np.ndarray, return_distances: bool = False):
    """Center + scale to unit sphere (point_cloud.py:34-48)."""
    pc_ = pc[:, :3]
    centroid = np.mean(pc_, axis=0)
    pc_ = pc_ - centroid
    m = np.max(np.sqrt(np.sum(pc_**2, axis=1)))
    pc_ = pc_ / m
    out = np.concatenate((pc_, pc[:, 3:]), axis=1) if pc.shape[1] > 3 else pc_
    if return_distances:
        return out, centroid, m
    return out


def pcl_random_sample(point: np.ndarray, npoint: int,
                      rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    n = point.shape[0]
    indices = rng.choice(n, npoint, replace=n < npoint)
    return point[indices]


def pcl_farthest_sample(point: np.ndarray, npoint: int, return_idxs: bool = False,
                        rng: np.random.Generator | None = None):
    """Farthest point sampling (point_cloud.py:61-89 semantics).

    N < npoint falls back to random choice WITH replacement like the reference
    (np.random.choice default), since 3RScan objects routinely have fewer than
    512 points. For batched on-device FPS see ops/fps.py.
    """
    rng = rng or np.random.default_rng()
    n = point.shape[0]
    if n < npoint:
        indices = rng.choice(n, npoint, replace=True)
        out = point[indices]
        return (out, indices.astype(np.int32)) if return_idxs else out

    xyz = point[:, :3]
    centroids = np.zeros(npoint, dtype=np.int64)
    distance = np.full(n, 1e10)
    farthest = int(rng.integers(0, n))
    for i in range(npoint):
        centroids[i] = farthest
        dist = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        np.minimum(distance, dist, out=distance)
        farthest = int(np.argmax(distance))
    out = point[centroids]
    return (out, centroids.astype(np.int32)) if return_idxs else out


def _native_kdtree(points: np.ndarray):
    """The C++ KD-tree when built + worthwhile; None otherwise."""
    try:
        from sgaligner_tpu import native

        if native.available():
            return native.KDTree(points)
    except Exception:
        pass
    return None


def compute_pcl_overlap(source: np.ndarray, target: np.ndarray,
                        threshold: float = 1e-7):
    """Overlap ratio source->target (point_cloud.py:91-103).

    The reference uses Open3D-ML RadiusSearch with an exact-match radius; a
    KD-tree radius-existence query gives identical semantics on the host
    (native C++ lib when available, scipy otherwise).
    """
    source = np.asarray(source)
    tree = _native_kdtree(target) if len(target) > 5000 else None
    if tree is not None:
        mask = tree.radius_exists(source, threshold)
        common_pts_idx_src = np.where(mask)[0].astype(np.int64)
    else:
        ctree = cKDTree(np.asarray(target, np.float64))
        neighbors = ctree.query_ball_point(np.asarray(source, np.float64),
                                           threshold)
        common_pts_idx_src = np.array(
            [i for i, lst in enumerate(neighbors) if lst], dtype=np.int64)
    overlap_ratio = round(common_pts_idx_src.shape[0] / source.shape[0], 4)
    return overlap_ratio, common_pts_idx_src


def inverse_relative(pose1to2: np.ndarray) -> np.ndarray:
    """Rigid pose inverse (point_cloud.py:105-110)."""
    pose2to1 = np.zeros((4, 4), dtype="float32")
    pose2to1[:3, :3] = pose1to2[:3, :3].T
    pose2to1[:3, 3:4] = -pose1to2[:3, :3].T @ pose1to2[:3, 3:4]
    pose2to1[3, 3] = 1
    return pose2to1


def get_visible_pts_from_cam_pose(scene_pts: np.ndarray, cam_2_world_pose: np.ndarray,
                                  intrinsic_info: dict) -> np.ndarray:
    """Frame-visibility mask via pinhole projection (point_cloud.py:112-134).

    Pure numpy replacement for cv2.projectPoints (the reference passes an
    identity rotation + zero distortion, so projection is just K @ x / z).
    Bound-check quirk preserved: projected x vs height, y vs width.
    """
    world2cam = inverse_relative(cam_2_world_pose)
    homo = np.concatenate([scene_pts, np.ones((scene_pts.shape[0], 1))], axis=1)
    cam_pts = (homo @ world2cam.T)[:, :3]

    k = intrinsic_info["intrinsic_mat"]
    z = cam_pts[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = k[0, 0] * cam_pts[:, 0] / z + k[0, 2]
        v = k[1, 1] * cam_pts[:, 1] / z + k[1, 2]

    out_x_mask = (u >= 0) & (u <= intrinsic_info["height"])  # quirk: vs height
    out_y_mask = (v >= 0) & (v <= intrinsic_info["width"])   # quirk: vs width
    depth_mask = z > 0.0
    return depth_mask & out_x_mask & out_y_mask


def get_nearest_neighbor(q_points: np.ndarray, s_points: np.ndarray,
                         return_index: bool = False):
    """KD-tree 1-NN distances (point_cloud.py:136-147).

    Uses the native C++ KD-tree (OpenMP-parallel) for large support sets,
    scipy otherwise.
    """
    tree = _native_kdtree(s_points) if len(s_points) > 5000 else None
    if tree is not None:
        distances, indices = tree.query(np.atleast_2d(q_points))
    else:
        ctree = cKDTree(s_points)
        distances, indices = ctree.query(q_points, k=1)
    return (distances, indices) if return_index else distances


def apply_transform(points: np.ndarray, transform: np.ndarray,
                    normals: np.ndarray | None = None):
    rotation = transform[:3, :3]
    translation = transform[:3, 3]
    points = points @ rotation.T + translation
    if normals is not None:
        return points, normals @ rotation.T
    return points


def load_obj(filename: str):
    """Minimal OBJ vertex/face reader (point_cloud.py:17-32)."""
    vertices, faces = [], []
    with open(filename) as f:
        for line in f:
            if line.startswith("v "):
                vertices.append([float(x) for x in line.split()[1:]])
            elif line.startswith("f "):
                faces.append([int(v.split("/")[0]) - 1
                              for v in line.split()[1:]])
    v, fc = np.asarray(vertices), np.asarray(faces)
    assert v.shape[1] == fc.shape[1]
    return v, fc


def sample_faces(vertices: np.ndarray, faces: np.ndarray,
                 n_samples: int = 10**4,
                 rng: np.random.Generator | None = None) -> np.ndarray:
    """Area-weighted barycentric surface sampling (point_cloud.py:159-209)."""
    rng = rng or np.random.default_rng()
    vec_cross = np.cross(vertices[faces[:, 0]] - vertices[faces[:, 2]],
                         vertices[faces[:, 1]] - vertices[faces[:, 2]])
    face_areas = np.sqrt((vec_cross**2).sum(1))
    face_areas = face_areas / face_areas.sum()

    n_per_face = np.ceil(n_samples * face_areas).astype(int)
    floor_num = n_per_face.sum() - n_samples
    if floor_num > 0:
        idxs = np.where(n_per_face > 0)[0]
        drop = rng.choice(idxs, floor_num, replace=True)
        np.subtract.at(n_per_face, drop, 1)
    n_per_face = np.maximum(n_per_face, 0)
    sample_face_idx = np.repeat(np.arange(len(faces)), n_per_face)

    r = rng.random((len(sample_face_idx), 2))
    a = vertices[faces[sample_face_idx, 0]]
    b = vertices[faces[sample_face_idx, 1]]
    c = vertices[faces[sample_face_idx, 2]]
    sq = np.sqrt(r[:, 0:1])
    return (1 - sq) * a + sq * (1 - r[:, 1:]) * b + sq * r[:, 1:] * c
