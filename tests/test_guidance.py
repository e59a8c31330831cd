"""Affine solvers, projections, and losses — closed-form expectations."""

import numpy as np
import jax
import jax.numpy as jnp

from depth_completion_tpu.guidance import (
    affine_to_metric_closed_form,
    affine_to_metric_learned,
    compute_affine_params,
    compute_loss,
    denormalize_depth,
    normalize_sparse,
    renormalize_to_guidance,
)


def _rand_depth(rng, n=2, h=16, w=24, density=0.2):
    sparse = np.zeros((n, h, w, 1), np.float32)
    mask = rng.random((n, h, w, 1)) < density
    sparse[mask] = rng.uniform(1.0, 100.0, mask.sum()).astype(np.float32)
    return sparse


def test_affine_params_recover_exact_transform():
    """If guide = a·x + b on the mask, the solver must recover (a, b)."""
    rng = np.random.default_rng(0)
    affines = rng.normal(size=(3, 8, 8, 1)).astype(np.float32)
    masks = (rng.random((3, 8, 8, 1)) > 0.5)
    a_true, b_true = 2.5, -1.25
    guides = a_true * affines + b_true
    scales, shifts = compute_affine_params(
        jnp.asarray(affines), jnp.asarray(guides), jnp.asarray(masks)
    )
    np.testing.assert_allclose(np.asarray(scales), a_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(shifts), b_true, rtol=1e-3, atol=1e-3)


def test_closed_form_alignment_zeroes_anchor_error():
    rng = np.random.default_rng(1)
    affines = rng.uniform(0, 1, size=(2, 8, 8, 1)).astype(np.float32)
    masks = rng.random((2, 8, 8, 1)) > 0.5
    guides = 3.0 * affines + 2.0
    metric = affine_to_metric_closed_form(
        jnp.asarray(affines), jnp.asarray(guides), jnp.asarray(masks)
    )
    err = np.abs(np.asarray(metric) - guides)[masks]
    assert err.max() < 1e-3


def test_learned_affine_formula():
    rng = np.random.default_rng(2)
    n = 2
    affines = rng.uniform(0, 1, size=(n, 4, 4, 1)).astype(np.float32)
    guides = rng.uniform(1, 10, size=(n, 4, 4, 1)).astype(np.float32)
    masks = np.ones((n, 4, 4, 1), bool)
    scale = rng.normal(size=(n, 1, 1, 1)).astype(np.float32)
    shift = rng.normal(size=(n, 1, 1, 1)).astype(np.float32)
    out = affine_to_metric_learned(
        *map(jnp.asarray, (affines, guides, masks, scale, shift))
    )
    mins = guides.reshape(n, -1).min(1).reshape(n, 1, 1, 1)
    maxs = guides.reshape(n, -1).max(1).reshape(n, 1, 1, 1)
    expected = scale**2 * (maxs - mins) * affines + shift**2 * mins
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_normalize_minmax_roundtrip():
    rng = np.random.default_rng(3)
    sparse = _rand_depth(rng)
    dn = normalize_sparse(
        jnp.asarray(sparse),
        norm="minmax",
        projection="linear",
        inv=False,
        min_depth=0.0,
        max_depth=120.0,
    )
    s = np.asarray(dn.sparses_normed)
    m = np.asarray(dn.masks)
    assert s[m].min() >= -1e-6 and s[m].max() <= 1 + 1e-6
    # round trip: denormalize puts anchors back at metric values
    metric = np.asarray(denormalize_depth(dn.sparses_normed, dn))
    np.testing.assert_allclose(metric[m], sparse[m], rtol=1e-4)


def test_normalize_projection_log_inverse_consistency():
    """Projection round trip (marigold_dc.py:739-756 vs 843-860): feeding the
    normalized *linear-space* prediction through renormalize and inverting in
    projected space must reproduce the anchors."""
    rng = np.random.default_rng(4)
    sparse = _rand_depth(rng)
    for projection, inv in [("log", False), ("log10", False), ("linear", True), ("log", True)]:
        dn = normalize_sparse(
            jnp.asarray(sparse),
            norm="minmax",
            projection=projection,
            inv=inv,
            min_depth=0.5,
            max_depth=120.0,
        )
        m = np.asarray(dn.masks)
        # linear-space normalized version of the clamped sparse depth
        lin_normed = (
            jnp.asarray(sparse) - dn.min_depths
        ) / (dn.max_depths - dn.min_depths)
        guide = np.asarray(
            renormalize_to_guidance(lin_normed, dn, projection, inv)
        )
        np.testing.assert_allclose(
            guide[m], np.asarray(dn.sparses_normed)[m], rtol=1e-3, atol=1e-3
        )


def test_normalize_percentile_within_minmax():
    rng = np.random.default_rng(5)
    sparse = _rand_depth(rng, density=0.5)
    dn_p = normalize_sparse(
        jnp.asarray(sparse),
        norm="percentile",
        projection="linear",
        inv=False,
        min_depth=0.0,
        max_depth=120.0,
        percentile=(0.1, 0.9),
    )
    dn_m = normalize_sparse(
        jnp.asarray(sparse),
        norm="minmax",
        projection="linear",
        inv=False,
        min_depth=0.0,
        max_depth=120.0,
    )
    assert np.all(np.asarray(dn_p.min_depths) >= np.asarray(dn_m.min_depths) - 1e-5)
    assert np.all(np.asarray(dn_p.max_depths) <= np.asarray(dn_m.max_depths) + 1e-5)


def test_loss_l1_l2_closed_form():
    rng = np.random.default_rng(6)
    d = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    s = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    m = rng.random((2, 8, 8, 1)) > 0.5
    total = np.asarray(
        compute_loss(
            jnp.asarray(d), jnp.asarray(s), jnp.asarray(m), ["l1", "l2"]
        )
    )
    nv = m.reshape(2, -1).sum(1)
    l1 = (np.abs(d - s) * m).reshape(2, -1).sum(1) / nv
    l2 = (((d - s) ** 2) * m).reshape(2, -1).sum(1) / nv
    np.testing.assert_allclose(total, l1 + l2, rtol=1e-5)


def test_loss_edge_smooth_and_grad():
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    m = jnp.asarray(rng.random((2, 8, 8, 1)) > 0.5)
    img = jnp.asarray(rng.uniform(0, 255, size=(2, 8, 8, 3)).astype(np.float32))

    def scalar_loss(dd):
        return jnp.sum(
            compute_loss(dd, s, m, ["l1", "l2", "edge", "smooth"], images=img)
        )

    g = jax.grad(scalar_loss)(d)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_loss_per_sample_independence():
    """Per-sample grads: sample i's gradient must not depend on sample j."""
    rng = np.random.default_rng(8)
    d = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    s = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    m = np.ones((2, 8, 8, 1), bool)

    def total(dd):
        return jnp.sum(compute_loss(dd, jnp.asarray(s), jnp.asarray(m), ["l2"]))

    g_joint = np.asarray(jax.grad(total)(jnp.asarray(d)))

    def single(dd):
        return jnp.sum(
            compute_loss(dd, jnp.asarray(s[:1]), jnp.asarray(m[:1]), ["l2"])
        )

    g_single = np.asarray(jax.grad(single)(jnp.asarray(d[:1])))
    np.testing.assert_allclose(g_joint[:1], g_single, rtol=1e-5)
