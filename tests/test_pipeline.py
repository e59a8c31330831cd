"""End-to-end tiny-shape sampling tests (SURVEY.md §4 integration strategy).

Tiny random models, 64×48 images, 3-4 steps, CPU backend. Contracts tested:
shape/dtype of outputs, determinism under a fixed seed (the reference seeds
everything from one generator, marigold_dc.py:661), anchor consistency of the
guided result, temporal latent carry, and every major config path (train
per-step/per-input/off, closed-form vs learned affine, projections, LCM).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.pipeline import DepthCompletionPipeline


@pytest.fixture(scope="module")
def pipe():
    return DepthCompletionPipeline(make_random_bundle(seed=0))


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(1, 48, 64, 3)).astype(np.float32)
    sparse = np.zeros((1, 48, 64, 1), np.float32)
    mask = rng.random((1, 48, 64, 1)) < 0.05
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    return images, sparse


COMMON = dict(max_depth=120.0, steps=3, resolution=64)


def test_e2e_guided_per_step(pipe, inputs):
    images, sparse = inputs
    denses, latents = pipe(images, sparse, **COMMON)
    denses = np.asarray(denses)
    assert denses.shape == (1, 48, 64, 1)
    assert np.isfinite(denses).all()
    assert latents.shape[0] == 1 and latents.shape[-1] == 4
    # output in metric range
    assert denses.min() >= -1e-3 and denses.max() <= 120.0 + 1e-3


def test_e2e_determinism(pipe, inputs):
    images, sparse = inputs
    a, _ = pipe(images, sparse, **COMMON)
    b, _ = pipe(images, sparse, **COMMON)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_e2e_learned_affine(pipe, inputs):
    images, sparse = inputs
    denses, _ = pipe(images, sparse, closed_form=False, **COMMON)
    assert np.isfinite(np.asarray(denses)).all()


def test_e2e_no_train_closed_form(pipe, inputs):
    images, sparse = inputs
    denses, _ = pipe(images, sparse, train_latents=False, **COMMON)
    assert np.isfinite(np.asarray(denses)).all()


def test_e2e_per_input(pipe, inputs):
    images, sparse = inputs
    denses, _ = pipe(
        images, sparse, train_method="per-input", train_steps=2, **COMMON
    )
    assert np.isfinite(np.asarray(denses)).all()


@pytest.mark.parametrize(
    "projection,inv", [("log", False), ("log10", False), ("linear", True)]
)
def test_e2e_projections(pipe, inputs, projection, inv):
    images, sparse = inputs
    denses, _ = pipe(
        images,
        sparse,
        min_depth=0.5,
        projection=projection,
        inv=inv,
        **COMMON,
    )
    assert np.isfinite(np.asarray(denses)).all()


def test_e2e_lcm(pipe, inputs):
    images, sparse = inputs
    denses, _ = pipe(
        images, sparse, scheduler="lcm", train_latents=False, **COMMON
    )
    assert np.isfinite(np.asarray(denses)).all()


def test_e2e_temporal_carry(pipe, inputs):
    images, sparse = inputs
    _, latents = pipe(images, sparse, **COMMON)
    denses2, _ = pipe(
        images, sparse, pred_latents_prev=latents, beta=0.9, **COMMON
    )
    assert np.isfinite(np.asarray(denses2)).all()


def test_e2e_percentile_norm_and_kld(pipe, inputs):
    images, sparse = inputs
    denses, _ = pipe(
        images,
        sparse,
        norm="percentile",
        percentile=(0.05, 0.95),
        kld=True,
        kld_mode="strict",
        **COMMON,
    )
    assert np.isfinite(np.asarray(denses)).all()


def test_closed_form_guided_tracks_anchors(inputs):
    """With closed-form affine the final output must be affine-aligned to the
    anchors: masked mean error bounded by the (random-model) affine residual,
    i.e. finite and not wildly off-range."""
    images, sparse = inputs
    pipe = DepthCompletionPipeline(make_random_bundle(seed=1))
    denses, _ = pipe(images, sparse, train_latents=False, **COMMON)
    d = np.asarray(denses)
    m = sparse > 0
    # closed-form least squares keeps the masked mean of pred ≈ mean of anchors
    assert abs(d[m].mean() - sparse[m].mean()) < sparse[m].std() * 2


def test_shape_validation(pipe):
    with pytest.raises(ValueError):
        pipe(np.zeros((1, 8, 8, 3)), np.zeros((2, 8, 8, 1)), max_depth=10.0)
    with pytest.raises(ValueError):
        pipe(np.zeros((1, 8, 8, 3)), np.zeros((1, 4, 4, 1)), max_depth=10.0)


def test_empty_sparse_frame_raises(pipe, inputs):
    # Reference utils.py:132-136 contract: a frame with zero valid sparse
    # points must fail loudly, not flow inf through normalization.
    images, sparse = inputs
    empty = np.zeros_like(sparse)
    with pytest.raises(ValueError, match="No valid values found in mask"):
        pipe(images, empty, **COMMON)
    # batch with one good and one empty row names the offending row
    images2 = np.concatenate([images, images])
    sparse2 = np.concatenate([sparse, empty])
    with pytest.raises(ValueError, match=r"frames \[1\]"):
        pipe(images2, sparse2, **COMMON)
    # the contract is points > 0 (projection.py mask), not merely nonzero:
    # a negative-only frame must also fail loudly, not flow ±inf
    with pytest.raises(ValueError, match="No valid values found in mask"):
        pipe(images, -np.abs(sparse) - 1.0, **COMMON)


def test_degenerate_sparse_range_raises(pipe, inputs):
    """A constant-valued sparse frame under minmax/percentile normalization
    would divide by (max-min)=0 — the reference silently NaNs
    (marigold_dc.py:739-756); we raise host-side (PARITY.md deviation 9).
    norm='const' must still accept it."""
    images, sparse = inputs
    const_sp = np.where(sparse > 0, 7.0, 0.0).astype(np.float32)
    kw = dict(COMMON)
    kw.pop("norm", None)
    with pytest.raises(ValueError, match="Degenerate sparse depth range"):
        pipe(images, const_sp, norm="minmax", **kw)
    with pytest.raises(ValueError, match="Degenerate sparse depth range"):
        pipe(images, const_sp, norm="percentile", **kw)
    d, _ = pipe(images, const_sp, norm="const", **kw)
    assert np.isfinite(np.asarray(d)).all()


def test_config_validation(pipe, inputs):
    images, sparse = inputs
    with pytest.raises(ValueError):
        pipe(images, sparse, max_depth=120.0, beta=1.5)
    with pytest.raises(ValueError):
        pipe(images, sparse, max_depth=120.0, projection="bogus")
    with pytest.raises(ValueError):
        pipe(images, sparse, max_depth=120.0, train_latents=False, closed_form=False)
    with pytest.raises(ValueError):
        # log projection requires positive min_depth
        pipe(images, sparse, max_depth=120.0, min_depth=0.0, projection="log")


def test_pipeline_ensemble_api(pipe, inputs):
    images, sparse = inputs
    denses, members = pipe(
        images, sparse, ensemble_size=2, ensemble_reduce="median", **COMMON
    )
    assert np.asarray(denses).shape == (1, 48, 64, 1)
    assert np.asarray(members).shape == (1, 2, 48, 64, 1)
    assert np.isfinite(np.asarray(denses)).all()


def test_detach_unet_grad_mode(pipe, inputs):
    """Fast-guidance mode: grads skip the UNet backward; still anchors-aware."""
    images, sparse = inputs
    denses, _ = pipe(images, sparse, detach_unet_grad=True, **COMMON)
    assert np.isfinite(np.asarray(denses)).all()


def test_golden_regression(pipe, inputs):
    """Seeded tiny run must stay numerically stable across refactors.

    Golden statistics recorded from the validated implementation (jax 0.9,
    CPU). Loose tolerances absorb backend/version-level reduction noise; a
    real dataflow change moves these by orders of magnitude more.
    """
    images, sparse = inputs
    d, latents = pipe(images, sparse, **COMMON)
    d, latents = np.asarray(d), np.asarray(latents)
    assert abs(d.mean() - 5.137968) < 0.05, d.mean()
    assert abs(d.std() - 1.799544) < 0.05, d.std()
    assert abs(latents.mean() - (-0.043031)) < 0.02, latents.mean()
    assert abs(latents.std() - 0.744239) < 0.02, latents.std()


def test_prev_latent_shape_validation(pipe, inputs):
    images, sparse = inputs
    with pytest.raises(ValueError, match="pred_latents_prev"):
        pipe(
            images, sparse,
            pred_latents_prev=np.zeros((1, 4, 4, 4), np.float32),
            **COMMON,
        )


def test_remat_unet_string_values_resolve():
    """'off' must disable remat ('on'/'off' were both truthy strings once:
    bool('off') is True); unknown values raise. Verified by comparing the
    lowered HLO: remat inserts checkpoint regions, so on != off."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    bundle = make_random_bundle(seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32))
    sparse = np.zeros((1, 32, 48, 1), np.float32)
    sparse[0, 8, 8, 0] = 5.0
    sparse = jnp.asarray(sparse)

    def lowered(remat):
        cfg = SamplerConfig(
            steps=1, resolution=64, max_depth=120.0, remat_unet=remat
        )
        return jax.jit(guided_sample, static_argnames=("cfg",)).lower(
            bundle, images, sparse, cfg
        ).as_text()

    on, off = lowered("on"), lowered("off")
    assert on != off  # remat changes the program
    assert off == lowered(False) and on == lowered(True)

    with pytest.raises(ValueError, match="remat_unet must be"):
        lowered("never")


def test_remat_auto_threshold_scales_with_hbm(monkeypatch):
    """The 'auto' fit edge is hardware-derived: it scales linearly with the
    device's bytes_limit around the measured v5e anchor (VERDICT r3 item 3);
    devices without memory stats fall back to the anchor unchanged."""
    import jax

    from depth_completion_tpu.pipeline import sampler

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            if self._limit is None:
                return None
            return {"bytes_limit": self._limit}

    anchor = sampler._REMAT_ANCHOR_PIXELS
    v5e = sampler._REMAT_ANCHOR_BYTES

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev(v5e)])
    assert sampler._remat_auto_threshold() == anchor  # v5e: unchanged
    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev(2 * v5e)])
    assert sampler._remat_auto_threshold() == 2 * anchor
    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev(v5e // 2)])
    assert sampler._remat_auto_threshold() == anchor // 2
    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev(None)])
    assert sampler._remat_auto_threshold() == anchor  # no stats → anchor


def test_remat_auto_decision_flips_with_mocked_hbm(monkeypatch):
    """End-to-end: under a tiny mocked HBM, 'auto' lowers the remat-on
    program; under a huge one, the remat-off program."""
    import jax
    import numpy as np

    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline import sampler
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    bundle = make_random_bundle(seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32))
    sparse = np.zeros((1, 32, 48, 1), np.float32)
    sparse[0, 8, 8, 0] = 5.0
    sparse = jnp.asarray(sparse)

    def lowered(remat):
        cfg = SamplerConfig(
            steps=1, resolution=64, max_depth=120.0, remat_unet=remat
        )
        # fresh wrapper per call: jax's lowering cache keys on (function,
        # static cfg) and would otherwise serve the first "auto" lowering
        # again after the threshold mock changes
        fn = lambda b, i, s, c: guided_sample(b, i, s, c)  # noqa: E731
        return jax.jit(fn, static_argnames=("c",)).lower(
            bundle, images, sparse, cfg
        ).as_text()

    on, off = lowered("on"), lowered("off")
    monkeypatch.setattr(sampler, "_remat_auto_threshold", lambda: 1)
    assert lowered("auto") == on
    monkeypatch.setattr(sampler, "_remat_auto_threshold", lambda: 10**12)
    assert lowered("auto") == off


def test_prev_latent_validation_uses_bundle_channels(inputs):
    """The carry shape check derives its channel count from the bundle's
    VAE (round-5 review: it hardcoded 4, so the serving warmup's
    bundle-derived carry signature was rejected for any other VAE).
    Validation runs before any compute, so a config-only 8-channel bundle
    suffices to exercise it."""
    import dataclasses

    from depth_completion_tpu.ops.resize import latent_size

    bundle = make_random_bundle(seed=0)
    cfg8 = dataclasses.replace(bundle.vae.config, latent_channels=8)
    bundle8 = dataclasses.replace(
        bundle, vae=dataclasses.replace(bundle.vae, params=bundle.vae.params, config=cfg8)
    )
    pipe8 = DepthCompletionPipeline(bundle8)
    images, sparse = inputs
    eh, ew = latent_size((48, 64), 64, bundle8.vae.downsample_factor)
    # a 4-channel carry must be rejected with the TRUE expected shape (8)
    with pytest.raises(ValueError, match=r"8\)"):
        pipe8(
            images, sparse,
            pred_latents_prev=np.zeros((1, eh, ew, 4), np.float32),
            **COMMON,
        )


@pytest.mark.parametrize(
    "hw",
    [
        (47, 63),   # both dims odd, landscape
        (63, 47),   # portrait (W < H exercises the other resize branch)
        (33, 128),  # extreme wide: resized H collapses near the pad floor
        (100, 31),  # extreme tall
        (16, 16),   # square, already smaller than the processing res
    ],
)
def test_e2e_odd_geometries(pipe, hw):
    """Padding/unpad bookkeeping survives awkward aspect ratios.

    The reference resizes the longest side to ``resolution`` and pads to a
    multiple of 16 (MarigoldImageProcessor.preprocess semantics, reference
    marigold_dc.py:687-693); every e2e test above runs 48x64, so non-16
    multiples, portrait orientation, and extreme aspect ratios were only
    covered at the resize-unit level. Output must come back at the ORIGINAL
    resolution, finite, and deterministic."""
    h, w = hw
    rng = np.random.default_rng(42)
    images = rng.uniform(0, 255, size=(1, h, w, 3)).astype(np.float32)
    sparse = np.zeros((1, h, w, 1), np.float32)
    mask = rng.random((1, h, w, 1)) < 0.1
    mask[0, h // 2, w // 2, 0] = True  # guarantee at least one anchor
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    denses, latents = pipe(images, sparse, max_depth=120.0, steps=2, resolution=64)
    d = np.asarray(denses)
    assert d.shape == (1, h, w, 1)
    assert np.isfinite(d).all()
    from depth_completion_tpu.ops.resize import latent_size

    eh, ew = latent_size((h, w), 64, pipe.bundle.vae.downsample_factor)
    assert latents.shape == (1, eh, ew, latents.shape[-1])
    d2 = np.asarray(
        pipe(images, sparse, max_depth=120.0, steps=2, resolution=64)[0]
    )
    np.testing.assert_array_equal(d, d2)


def test_ensemble_odd_geometry(pipe):
    """The ensemble path (member axis + reduce) shares none of the
    single-sample program, so its padding/unpad bookkeeping needs its own
    odd-shape coverage."""
    h, w = 47, 63
    rng = np.random.default_rng(7)
    images = rng.uniform(0, 255, size=(1, h, w, 3)).astype(np.float32)
    sparse = np.zeros((1, h, w, 1), np.float32)
    mask = rng.random((1, h, w, 1)) < 0.1
    mask[0, h // 2, w // 2, 0] = True
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    denses, members = pipe(
        images, sparse, max_depth=120.0, steps=2, resolution=64,
        ensemble_size=2, ensemble_reduce="aligned-median",
    )
    d = np.asarray(denses)
    assert d.shape == (1, h, w, 1)
    assert np.isfinite(d).all()
    assert np.asarray(members).shape == (1, 2, h, w, 1)
