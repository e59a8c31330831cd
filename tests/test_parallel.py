"""Sharded execution on the 8-device virtual CPU mesh.

Contract (SURVEY.md §4): sharded run ≡ single-device run within tolerance;
tensor-parallel and data-parallel paths both compile and execute; the driver
dry-run entry works.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.parallel.ensemble import ensemble_sample
from depth_completion_tpu.parallel.sharding import shard_batch, shard_bundle
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

_jit_sample = jax.jit(guided_sample, static_argnames=("cfg",))


def _mesh(data, model):
    devs = np.asarray(jax.devices("cpu")[: data * model]).reshape(data, model)
    return Mesh(devs, (AXIS_DATA, AXIS_MODEL))


def _inputs(n=4):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(n, 32, 48, 3)).astype(np.float32)
    sparse = np.zeros((n, 32, 48, 1), np.float32)
    mask = rng.random((n, 32, 48, 1)) < 0.08
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    return images, sparse


CFG = SamplerConfig(steps=2, resolution=64, max_depth=120.0)


def test_data_parallel_matches_single_device():
    bundle = make_random_bundle(seed=0)
    images, sparse = _inputs(4)
    ref, _ = _jit_sample(bundle, jnp.asarray(images), jnp.asarray(sparse), CFG)

    mesh = _mesh(4, 2)
    bundle_s = shard_bundle(mesh, bundle, tensor_parallel=False)
    im_s, sp_s = shard_batch(mesh, jnp.asarray(images), jnp.asarray(sparse))
    out, _ = _jit_sample(bundle_s, im_s, sp_s, CFG)
    # tolerance: partitioning changes fp32 reduction order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_tensor_parallel_matches_replicated():
    bundle = make_random_bundle(seed=0)
    images, sparse = _inputs(2)
    ref, _ = _jit_sample(bundle, jnp.asarray(images), jnp.asarray(sparse), CFG)

    mesh = _mesh(2, 4)
    bundle_s = shard_bundle(mesh, bundle, tensor_parallel=True)
    im_s, sp_s = shard_batch(mesh, jnp.asarray(images), jnp.asarray(sparse))
    out, _ = _jit_sample(bundle_s, im_s, sp_s, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_ensemble_sample_reduces_members():
    bundle = make_random_bundle(seed=0)
    images, sparse = _inputs(2)
    fn = jax.jit(ensemble_sample, static_argnames=("cfg", "ensemble_size", "reduce"))
    denses, members = fn(
        bundle, jnp.asarray(images), jnp.asarray(sparse), CFG, ensemble_size=3
    )
    assert denses.shape == (2, 32, 48, 1)
    assert members.shape == (2, 3, 32, 48, 1)
    np.testing.assert_allclose(
        np.asarray(denses), np.median(np.asarray(members), axis=1), atol=1e-6
    )
    # members differ (different init noise per member)
    m = np.asarray(members)
    assert np.abs(m[:, 0] - m[:, 1]).max() > 1e-6


def test_align_members_exact_affine_recovery():
    """The aligned reduce's contract (VERDICT r3 #4): members that are
    affine perturbations of a common depth map reduce to the unperturbed
    map. The middle member is unperturbed, so the elementwise median IS the
    true map (positive scales keep the ordering); each member is exactly
    affine in it, so the closed-form LSQ alignment recovers it exactly."""
    from depth_completion_tpu.parallel.ensemble import align_members

    rng = np.random.default_rng(0)
    d = rng.uniform(1.0, 80.0, size=(2, 6, 8, 1)).astype(np.float32)
    perturb = [(1.15, 0.7), (1.0, 0.0), (0.85, -0.4)]
    members = np.stack([s * d + t for s, t in perturb], axis=1)

    aligned = np.asarray(align_members(jnp.asarray(members)))
    for m in range(len(perturb)):
        np.testing.assert_allclose(aligned[:, m], d, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.median(aligned, axis=1), d, rtol=1e-4, atol=1e-3)
    # plain median does NOT cancel the perturbations away from the middle
    assert np.abs(members[:, 0] - d).max() > 0.5


def test_ensemble_aligned_reduce_and_uncertainty():
    """aligned-median runs e2e through ensemble_sample; the uncertainty
    output is the member MAD around the reduced map (>= 0, 0 where all
    members agree)."""
    bundle = make_random_bundle(seed=0)
    images, sparse = _inputs(2)
    fn = jax.jit(
        ensemble_sample,
        static_argnames=("cfg", "ensemble_size", "reduce", "return_uncertainty"),
    )
    denses, members, unc = fn(
        bundle, jnp.asarray(images), jnp.asarray(sparse), CFG,
        ensemble_size=3, reduce="aligned-median", return_uncertainty=True,
    )
    assert denses.shape == (2, 32, 48, 1)
    assert unc.shape == (2, 32, 48, 1)
    d, m, u = np.asarray(denses), np.asarray(members), np.asarray(unc)
    assert np.isfinite(d).all() and np.isfinite(u).all()
    assert (u >= 0).all()
    # the reduce is the median of the ALIGNED members, not the raw ones
    from depth_completion_tpu.parallel.ensemble import align_members

    aligned = np.asarray(align_members(jnp.asarray(m)))
    np.testing.assert_allclose(d, np.median(aligned, axis=1), atol=1e-5)
    np.testing.assert_allclose(
        u, np.median(np.abs(aligned - d[:, None]), axis=1), atol=1e-5
    )
    # invalid reduce name fails loudly
    import pytest

    with pytest.raises(ValueError, match="Unknown ensemble reduce"):
        ensemble_sample(
            bundle, jnp.asarray(images), jnp.asarray(sparse), CFG,
            ensemble_size=2, reduce="bogus",
        )


def test_ensemble_size_one_matches_plain():
    """E=1 with per-member noise must equal the plain common-noise path
    (same seed → same [1,EH,EW,4] normal draw)."""
    bundle = make_random_bundle(seed=0)
    images, sparse = _inputs(2)
    ref, _ = _jit_sample(bundle, jnp.asarray(images), jnp.asarray(sparse), CFG)
    fn = jax.jit(ensemble_sample, static_argnames=("cfg", "ensemble_size", "reduce"))
    denses, _ = fn(
        bundle, jnp.asarray(images), jnp.asarray(sparse), CFG, ensemble_size=1
    )
    np.testing.assert_allclose(np.asarray(denses), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_tp_spec_shards_convs_and_guards_divisibility():
    """Conv TP non-vacuousness: resnet conv1 is output-channel-sharded,
    conv2 input-channel-sharded, temb rides conv1's sharding, boundary
    convs replicate; non-divisible dims fall back to replicated."""
    bundle = make_random_bundle(seed=0)
    mesh = _mesh(2, 4)
    b = shard_bundle(mesh, bundle, tensor_parallel=True)

    specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(b.unet_params)[0]:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        specs[name] = tuple(leaf.sharding.spec)

    def spec_of(suffix):
        hits = [v for k, v in specs.items() if k.endswith(suffix)]
        assert hits, f"no param ends with {suffix}"
        return hits[0]

    assert spec_of("resnets/0/conv1/kernel") == (None, None, None, AXIS_MODEL)
    assert spec_of("resnets/0/conv1/bias") == (AXIS_MODEL,)
    assert spec_of("resnets/0/conv2/kernel") == (None, None, AXIS_MODEL, None)
    assert spec_of("resnets/0/time_emb_proj/kernel") == (None, AXIS_MODEL)
    assert spec_of("conv_in/kernel") == ()
    # at least one conv_shortcut exists (channel-changing stage) — replicated
    assert any(
        k.endswith("conv_shortcut/kernel") and v == ()
        for k, v in specs.items()
    )

    # divisibility fallback: model=8 doesn't divide a 4-channel final conv?
    # simulate with a non-divisible leaf via the tiny config's conv_out
    # (out channels 4, model axis 4 divides; use model mesh of 8 on a leaf
    # that cannot divide: check the rule directly)
    from depth_completion_tpu.parallel.sharding import unet_tp_spec

    class _Leaf:
        ndim = 4
        shape = (3, 3, 32, 30)  # 30 % 4 != 0

    # spec function still proposes sharding; shard_bundle's guard handles
    # divisibility — emulate it here
    import jax.tree_util as jtu

    path = (
        jtu.DictKey("down_blocks"),
        jtu.DictKey("0"),
        jtu.DictKey("resnets"),
        jtu.DictKey("0"),
        jtu.DictKey("conv1"),
        jtu.DictKey("kernel"),
    )
    spec = unet_tp_spec(path, _Leaf())
    assert spec == jax.sharding.PartitionSpec(None, None, None, AXIS_MODEL)


def test_unet_param_sharding_divisibility_fallback():
    """unet_param_sharding (used by shard_bundle AND the production-
    geometry lowering check) applies the divisibility guard: an eligible
    leaf whose sharded dim doesn't divide the model axis replicates, and
    it accepts abstract ShapeDtypeStructs (no data)."""
    import jax.tree_util as jtu
    from jax.sharding import PartitionSpec

    from depth_completion_tpu.parallel.sharding import unet_param_sharding

    mesh = _mesh(2, 4)  # model axis = 4
    path = (
        jtu.DictKey("down_blocks"),
        jtu.DictKey("0"),
        jtu.DictKey("resnets"),
        jtu.DictKey("0"),
        jtu.DictKey("conv1"),
        jtu.DictKey("kernel"),
    )
    ok = jax.ShapeDtypeStruct((3, 3, 32, 32), jnp.float32)
    bad = jax.ShapeDtypeStruct((3, 3, 32, 30), jnp.float32)  # 30 % 4 != 0
    assert unet_param_sharding(mesh, path, ok).spec == PartitionSpec(
        None, None, None, AXIS_MODEL
    )
    assert unet_param_sharding(mesh, path, bad).spec == PartitionSpec()
    # tensor_parallel=False replicates everything
    assert unet_param_sharding(
        mesh, path, ok, tensor_parallel=False
    ).spec == PartitionSpec()
