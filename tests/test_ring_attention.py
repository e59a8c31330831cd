"""Ring attention over the 8-device virtual mesh ≡ single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL
from depth_completion_tpu.models.layers import attention
from depth_completion_tpu.ops.ring_attention import ring_attention


def _mesh(p=8):
    devs = np.asarray(jax.devices("cpu")[:p]).reshape(p, 1)
    return Mesh(devs, (AXIS_DATA, AXIS_MODEL))


def _qkv(n=2, s=256, c=64, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(n, s, c)).astype(np.float32)) for _ in range(3)
    )


def test_ring_matches_full_attention():
    mesh = _mesh()
    q, k, v = _qkv()
    out = ring_attention(q, k, v, num_heads=4, mesh=mesh)
    ref = attention(q, k, v, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_ring_grad_matches_full_attention():
    """Differentiable through the ring (guidance-gradient compatible)."""
    mesh = _mesh(4)
    q, k, v = _qkv(n=1, s=64, c=32, seed=1)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring_attention(q, k, v, 2, mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention(q, k, v, 2)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_ring_unet_stage0_geometry():
    """UNet stage-0 channel config (C=320, 5 heads of d=64) at a sequence
    long enough to rotate real per-device KV shards (S=2304 → 288/device on
    the 8-ring): fwd and guidance-gradient equivalence vs full attention."""
    mesh = _mesh()
    q, k, v = _qkv(n=1, s=2304, c=320, seed=2)

    def loss_ring(q):
        return jnp.sum(jnp.square(ring_attention(q, k, v, 5, mesh)))

    def loss_ref(q):
        return jnp.sum(jnp.square(attention(q, k, v, 5)))

    out = ring_attention(q, k, v, num_heads=5, mesh=mesh)
    ref = attention(q, k, v, num_heads=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    g_ring = jax.grad(loss_ring)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_ref), rtol=1e-4, atol=1e-3
    )


def _run_flash_ring(q, k, v, heads, mesh, grad=False):
    """Flash-tiled ring in Pallas interpreter mode (CPU stand-in for TPU)."""
    from depth_completion_tpu.ops import flash_attention as fa
    from depth_completion_tpu.ops.ring_attention import ring_attention_sharded
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(None, AXIS_DATA, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        if grad:
            return jax.grad(
                lambda q, k, v: jnp.sum(
                    jnp.square(
                        ring_attention_sharded(
                            q, k, v, heads, mesh, use_flash="on"
                        )
                    )
                ),
                argnums=(0, 1, 2),
            )(qs, ks, vs)
        return ring_attention_sharded(qs, ks, vs, heads, mesh, use_flash="on")
    finally:
        fa.INTERPRET = old


def test_flash_ring_matches_full_attention():
    """Flash-tiled ring (Pallas bodies per visiting KV block, interpreter
    mode) ≡ full attention — block-aligned shards (512/4 = 128)."""
    mesh = _mesh(4)
    q, k, v = _qkv(n=1, s=512, c=128, seed=3)
    out = _run_flash_ring(q, k, v, 2, mesh)
    ref = attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_ring_grad_matches_full_attention():
    """The flash ring's custom VJP (second ring pass, dk/dv rotating with
    their blocks) ≡ autodiff through full attention."""
    mesh = _mesh(4)
    q, k, v = _qkv(n=1, s=512, c=128, seed=4)
    g_ring = _run_flash_ring(q, k, v, 2, mesh, grad=True)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.square(attention(q, k, v, 2))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name}",
        )


def test_flash_ring_padded_shards():
    """Shard length not a block multiple (600/4 = 150 → padded to 256 with
    masked KV tails): fwd + grad still match full attention."""
    mesh = _mesh(4)
    q, k, v = _qkv(n=1, s=600, c=64, seed=5)
    out = _run_flash_ring(q, k, v, 1, mesh)
    ref = attention(q, k, v, num_heads=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    g_ring = _run_flash_ring(q, k, v, 1, mesh, grad=True)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.square(attention(q, k, v, 1))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name}",
        )


def test_ring_rejects_ragged_sequence():
    import pytest

    mesh = _mesh()
    q, k, v = _qkv(s=100)  # not divisible by 8
    with pytest.raises(ValueError):
        ring_attention(q, k, v, 4, mesh)

def test_ring_inside_jitted_sampler_matches_base():
    """Native-res mode: the full guided sampler with the self-attention
    sequence sharded over the ring equals the single-device path."""
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    bundle = make_random_bundle(seed=0)
    mesh = _mesh()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, 48, 64, 3)), jnp.float32)
    sp = np.zeros((1, 48, 64, 1), np.float32)
    sp[0, ::7, ::9, 0] = rng.random((7, 8)).astype(np.float32) * 50
    sparses = jnp.asarray(sp)

    f = jax.jit(guided_sample, static_argnames=("cfg",))
    base = SamplerConfig(steps=2, resolution=64, max_depth=120.0)
    ring = SamplerConfig(steps=2, resolution=64, max_depth=120.0, ring_mesh=mesh)
    d0, l0 = f(bundle, images, sparses, base)
    d1, l1 = f(bundle, images, sparses, ring)
    assert bool(jnp.isfinite(d1).all())
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-3, atol=1e-4)
