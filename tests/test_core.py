"""Core: mesh construction and dtype policy."""

import os

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


def test_compile_cache_host_salt(tmp_path, monkeypatch):
    """Cache dirs are salted per host fingerprint (stale cross-machine
    XLA:CPU AOT entries segfault/SIGILL on deserialize), idempotently
    through env-var inheritance, and the DCT_NO_COMPILE_CACHE kill switch
    disables the cache entirely."""
    from depth_completion_tpu.core import compile_cache as cc

    monkeypatch.delenv("DCT_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)

    fp = cc._host_fingerprint()
    assert fp.startswith("host-") and fp == cc._host_fingerprint()  # stable

    d1 = cc.enable_compile_cache(str(tmp_path / "xla"))
    assert d1 == str(tmp_path / "xla" / fp)
    # a child process inheriting JAX_COMPILATION_CACHE_DIR must not re-salt
    assert os.environ["JAX_COMPILATION_CACHE_DIR"] == d1
    assert cc.enable_compile_cache() == d1

    monkeypatch.setenv("DCT_NO_COMPILE_CACHE", "1")
    assert cc.enable_compile_cache(str(tmp_path / "xla")) == ""

    # restore: the suite default is cache off (conftest set the kill switch
    # before this test ran, and enable_compile_cache mutated live config)
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)


def test_respect_jax_platforms_env(monkeypatch):
    """JAX_PLATFORMS must win over a startup config override (the session
    sitecustomize forces jax_platforms at import, silently sending 'CPU'
    scripts over the remote-TPU tunnel — core/platform.py)."""
    import jax

    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    orig = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "")  # simulate a startup override
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        respect_jax_platforms_env()
        assert jax.config.jax_platforms == "cpu"
        # no env var -> no-op
        jax.config.update("jax_platforms", "")
        monkeypatch.delenv("JAX_PLATFORMS")
        respect_jax_platforms_env()
        assert jax.config.jax_platforms == ""
    finally:
        jax.config.update("jax_platforms", orig)
