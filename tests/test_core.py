"""Core: mesh construction and dtype policy."""

import numpy as np
import jax
import pytest

from depth_completion_tpu.core import MeshSpec, make_mesh, resolve_policy
from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL


def test_make_mesh_default_all_data():
    mesh = make_mesh()
    assert mesh.axis_names == (AXIS_DATA, AXIS_MODEL)
    assert mesh.shape[AXIS_DATA] == jax.device_count()
    assert mesh.shape[AXIS_MODEL] == 1


def test_make_mesh_model_axis():
    mesh = make_mesh(MeshSpec(data=-1, model=2))
    assert mesh.shape[AXIS_DATA] == jax.device_count() // 2
    assert mesh.shape[AXIS_MODEL] == 2


def test_make_mesh_invalid():
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=3, model=3))  # 9 != 8
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(model=0))


def test_resolve_policy():
    import jax.numpy as jnp

    bf16 = resolve_policy("bf16")
    assert bf16.compute_dtype == jnp.bfloat16
    assert bf16.reduce_dtype == jnp.float32
    fp32 = resolve_policy("fp32")
    assert fp32.is_full_precision
    with pytest.raises(ValueError):
        resolve_policy("fp64")


def test_data_sharding_helpers():
    from depth_completion_tpu.core.mesh import data_sharding, replicated

    mesh = make_mesh()
    s = data_sharding(mesh, ndim=4)
    assert s.spec[0] == AXIS_DATA
    r = replicated(mesh)
    assert all(p is None for p in (r.spec or [None]))
    x = jax.device_put(np.zeros((8, 2, 2, 1), np.float32), s)
    assert len(x.sharding.device_set) == 8


def test_logger_file_sink(tmp_path):
    from depth_completion_tpu.logger import logger

    log_path = tmp_path / "run.log"
    logger.configure(level="DEBUG", log_path=log_path)
    logger.info("hello-info")
    logger.success("hello-success")
    logger.trace("hello-trace")  # below DEBUG, filtered
    text = log_path.read_text()
    assert "hello-info" in text and "hello-success" in text
    assert "hello-trace" not in text
    logger.configure()  # restore defaults for other tests
