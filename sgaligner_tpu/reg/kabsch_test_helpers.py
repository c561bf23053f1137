"""Shared fixture helpers for registration tests."""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def random_transform(rng: np.random.Generator, max_angle_deg: float = 45.0,
                     max_trans: float = 0.5) -> np.ndarray:
    """Random rigid [4,4] transform (like the reference dataset's random rigid
    augmentation bounds, /root/reference/src/datasets/scan3r.py:53-55)."""
    angles = rng.uniform(-max_angle_deg, max_angle_deg, size=3)
    tf = np.eye(4)
    tf[:3, :3] = Rotation.from_euler("xyz", angles, degrees=True).as_matrix()
    tf[:3, 3] = rng.uniform(-max_trans, max_trans, size=3)
    return tf
