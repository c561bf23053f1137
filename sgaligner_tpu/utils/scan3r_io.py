"""3RScan raw-data IO.

Equivalent of /root/reference/utils/scan3r.py for the raw dataset: intrinsics
parser (_info.txt), per-frame poses, frame enumeration, ref<->rescan transforms
(3RScan.json), camera centers, and structured-vertex subsetting. The reference
depends on the ``plyfile`` package; this module includes a minimal numpy PLY
reader for the annotated 3RScan vertex layout (ascii / binary_little_endian).
"""

from __future__ import annotations

import json
import os.path as osp
from glob import glob

import numpy as np

_PLY_TYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply_vertices(filename: str) -> np.ndarray:
    """Read the vertex element of a PLY file into a structured numpy array.

    Supports ascii and binary_little_endian with scalar vertex properties (the
    3RScan ``labels.instances.align.annotated.v2.ply`` layout). List properties
    of non-vertex elements (faces) are skipped.
    """
    with open(filename, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, str]]]] = []
        cur = None
        for line in header_lines:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                cur = (parts[1], int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == "property" and cur is not None:
                if parts[1] == "list":
                    cur[2].append(("__list__", " ".join(parts[2:])))
                else:
                    cur[2].append((parts[-1], _PLY_TYPES[parts[1]]))

        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"unsupported PLY format: {fmt}")

        out = None
        for name, count, props in elements:
            if any(p[0] == "__list__" for p in props):
                if name == "vertex":
                    raise ValueError("list properties on vertex unsupported")
                break  # faces etc. follow the vertex block; we can stop
            dtype = np.dtype([(n, "<" + t) for n, t in props])
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                arr = np.zeros(count, dtype=dtype)
                for j, (n, t) in enumerate(props):
                    col = np.array([r[j] for r in rows])
                    arr[n] = col.astype(np.dtype(t))
            else:
                arr = np.fromfile(f, dtype=dtype, count=count)
            if name == "vertex":
                out = arr
                break
        if out is None:
            raise ValueError(f"no vertex element in {filename}")
        return out


def get_scan_ids(dirname: str, split: str) -> np.ndarray:
    return np.atleast_1d(
        np.genfromtxt(osp.join(dirname, f"{split}_scans.txt"), dtype=str))


def load_intrinsics(data_dir: str, scan_id: str, type: str = "color") -> dict:
    """Parse sequence/_info.txt (reference scan3r.py:20-55)."""
    info_path = osp.join(data_dir, scan_id, "sequence", "_info.txt")
    width_key = "m_colorWidth" if type == "color" else "m_depthWidth"
    height_key = "m_colorHeight" if type == "color" else "m_depthHeight"
    calib_key = ("m_calibrationColorIntrinsic" if type == "color"
                 else "m_calibrationDepthIntrinsic")

    intrinsic_width = intrinsic_height = None
    intrinsic_mat = None
    with open(info_path) as f:
        for line in f:
            if height_key in line:
                intrinsic_height = line[line.find("= ") + 2:]
            elif width_key in line:
                intrinsic_width = line[line.find("= ") + 2:]
            elif calib_key in line:
                m = line[line.find("= ") + 2:].split(" ")
                intrinsic_mat = np.array(
                    [[m[0], 0, m[2]], [0, m[5], m[6]], [0, 0, 1]],
                    dtype=np.float32)
    return {"width": float(intrinsic_width), "height": float(intrinsic_height),
            "intrinsic_mat": intrinsic_mat}


def load_pose(data_dir: str, scan_id: str, frame_id: str) -> np.ndarray:
    return np.genfromtxt(osp.join(data_dir, scan_id, "sequence",
                                  f"frame-{frame_id}.pose.txt"))


def load_all_poses(data_dir: str, scan_id: str, frame_idxs) -> np.ndarray:
    return np.array([load_pose(data_dir, scan_id, i) for i in frame_idxs])


def load_frame_idxs(data_dir: str, scan_id: str, skip: int | None = None):
    num_frames = len(glob(osp.join(data_dir, scan_id, "sequence", "*.jpg")))
    step = skip or 1
    return [f"{i:06d}" for i in range(0, num_frames, step)]


def read_transform_mat(filename: str) -> dict[str, np.ndarray]:
    """ref<->rescan alignment transforms from 3RScan.json (scan3r.py:88-96)."""
    rescan2ref = {}
    with open(filename) as f:
        data = json.load(f)
    for scene in data:
        for scans in scene["scans"]:
            if "transform" in scans:
                rescan2ref[scans["reference"]] = \
                    np.array(scans["transform"]).reshape(4, 4)
    return rescan2ref


def find_cam_centers(frame_idxs, frame_poses) -> np.ndarray:
    """Camera centers from cam2world poses (scan3r.py:116-128, mm quirk kept)."""
    cam_centers = []
    for idx in range(len(frame_idxs)):
        frame_pose = np.linalg.inv(frame_poses[idx])  # world2cam
        rot = frame_pose[:3, :3]
        trans = frame_pose[:3, 3] * 1000.0
        cam_centers.append(-(rot.T @ trans) / 1000.0)
    return np.array(cam_centers).reshape(-1, 3)


def create_ply_data(ply_data: np.ndarray, visible_pts_idx: np.ndarray):
    """Subset structured vertices to data.npy records (scan3r.py:130-158)."""
    from sgaligner_tpu.utils.io import PLY_NPY_DTYPE

    vertices = np.zeros(len(visible_pts_idx), dtype=PLY_NPY_DTYPE)
    for field in ("x", "y", "z", "red", "green", "blue", "objectId",
                  "globalId", "NYU40", "Eigen13", "RIO27"):
        vertices[field] = ply_data[field][visible_pts_idx].astype(
            PLY_NPY_DTYPE[field])
    return vertices, ply_data["objectId"][visible_pts_idx]
