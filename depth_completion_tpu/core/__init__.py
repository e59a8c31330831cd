from depth_completion_tpu.core.dtypes import DTypePolicy, resolve_policy
from depth_completion_tpu.core.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    MeshSpec,
    make_mesh,
)

__all__ = [
    "DTypePolicy",
    "resolve_policy",
    "AXIS_DATA",
    "AXIS_MODEL",
    "MeshSpec",
    "make_mesh",
]
