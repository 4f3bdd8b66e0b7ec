"""Camera and rotation models."""

from psba_tpu.models.quaternion import (
    compose_local,
    local_scalar,
    quat_multiply,
    quat_normalize_vec,
    quat_rotate,
    quat_to_matrix,
)
from psba_tpu.models.pinhole import project, project_quat

__all__ = [
    "compose_local",
    "local_scalar",
    "quat_multiply",
    "quat_normalize_vec",
    "quat_rotate",
    "quat_to_matrix",
    "project",
    "project_quat",
]
