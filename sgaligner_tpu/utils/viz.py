"""Visualization utilities.

Equivalent of /root/reference/utils/visualisation.py and the non-registration
parts of utils/open3d.py, with Open3D optional (this framework's compute path
never needs it): point-cloud containers fall back to plain numpy, matplotlib is
imported lazily for the bar charts, and registration viz renders two clouds
under GT vs estimated transforms.
"""

from __future__ import annotations

import numpy as np

from sgaligner_tpu.utils.pointcloud import apply_transform

COLOR_MAP = {
    "red": np.array([0.894, 0.102, 0.110]),
    "blue": np.array([0.216, 0.494, 0.722]),
    "green": np.array([0.302, 0.686, 0.290]),
    "yellow": np.array([1.0, 0.851, 0.184]),
    "custom_yellow": np.array([255.0, 204.0, 51.0]) / 255.0,
    "custom_blue": np.array([102.0, 153.0, 255.0]) / 255.0,
}


def get_random_color(rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return rng.integers(0, 256, size=3).astype(np.float64)


def remove_ceiling(points: np.ndarray) -> np.ndarray:
    """Drop the top 1 m of a scene for viewing (visualisation.py:16-19)."""
    return points[points[..., 2] < np.max(points[..., 2]) - 1]


def visualise_dict_counts(counts_dict: dict, title: str = "",
                          file_name: str | None = None) -> None:
    """Bar chart of a {name: count} dict (visualisation.py:21-34)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    names = list(counts_dict.keys())
    vals = [counts_dict[k] for k in names]
    ax.bar(range(len(names)), vals)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90)
    ax.set_title(title)
    fig.tight_layout()
    if file_name:
        fig.savefig(file_name)
    plt.close(fig)


def _maybe_open3d():
    try:
        import open3d as o3d  # noqa: F401

        return o3d
    except ImportError:
        return None


def make_open3d_point_cloud(points: np.ndarray, colors=None, normals=None):
    """Open3D container when available, else a plain dict (open3d.py:36-43)."""
    o3d = _maybe_open3d()
    if o3d is None:
        return {"points": np.asarray(points), "colors": colors,
                "normals": normals}
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(points)
    if colors is not None:
        pcd.colors = o3d.utility.Vector3dVector(colors)
    if normals is not None:
        pcd.normals = o3d.utility.Vector3dVector(normals)
    return pcd


def visualise_point_cloud_registration(src_points, ref_points, gt_transform,
                                       est_transform, file_name=None):
    """Side-by-side GT vs estimated alignment (visualisation.py:36-47); renders
    to a matplotlib scatter when Open3D's viewer is unavailable (headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 6))
    for i, (tf, name) in enumerate([(gt_transform, "ground truth"),
                                    (est_transform, "estimated")]):
        ax = fig.add_subplot(1, 2, i + 1, projection="3d")
        moved = apply_transform(src_points, tf)
        sub = slice(None, None, max(1, len(moved) // 5000))
        ax.scatter(*moved[sub].T, s=0.5, c=[COLOR_MAP["custom_yellow"]])
        sub_r = slice(None, None, max(1, len(ref_points) // 5000))
        ax.scatter(*np.asarray(ref_points)[sub_r].T, s=0.5,
                   c=[COLOR_MAP["custom_blue"]])
        ax.set_title(name)
    if file_name:
        fig.savefig(file_name)
    plt.close(fig)
    return fig
