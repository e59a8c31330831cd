"""Masked statistics: parity with torch reference semantics.

torch (CPU) is available in the image, so we check masked_quantile against
``torch.quantile`` directly — the reference's per-sample loop
(marigold_dc.py:714-726) is the behavior contract.
"""

import numpy as np
import jax.numpy as jnp
import torch

from depth_completion_tpu.ops.stats import (
    kld_stdnorm,
    masked_mae,
    masked_minmax,
    masked_quantile,
    masked_rmse,
)


def test_masked_minmax_basic():
    x = jnp.asarray([[1.0, 5.0, -2.0, 9.0], [4.0, 4.0, 4.0, 4.0]])
    m = jnp.asarray([[True, False, True, True], [False, True, False, False]])
    mins, maxs, ok = masked_minmax(x, m)
    np.testing.assert_allclose(np.asarray(mins), [-2.0, 4.0])
    np.testing.assert_allclose(np.asarray(maxs), [9.0, 4.0])
    assert np.asarray(ok).all()


def test_masked_minmax_empty_row_flagged():
    x = jnp.ones((2, 3))
    m = jnp.asarray([[True, True, True], [False, False, False]])
    mins, maxs, ok = masked_minmax(x, m)
    assert bool(ok[0]) and not bool(ok[1])
    assert np.isinf(np.asarray(mins)[1])


def test_masked_quantile_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 257)).astype(np.float32)
    mask = rng.random((4, 257)) > 0.3
    mask[:, 0] = True  # ensure at least one valid per row
    qs = np.asarray([0.01, 0.5, 0.99], dtype=np.float32)
    ours = np.asarray(masked_quantile(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(qs)))
    for i in range(4):
        expected = torch.quantile(
            torch.from_numpy(x[i][mask[i]]), torch.from_numpy(qs)
        ).numpy()
        np.testing.assert_allclose(ours[i], expected, rtol=1e-4, atol=1e-5)


def test_kld_stdnorm_modes():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 64)).astype(np.float32)
    simple = np.asarray(kld_stdnorm(jnp.asarray(x), reduction="none", mode="simple"))
    np.testing.assert_allclose(simple, (x**2).mean(axis=1), rtol=1e-5)
    strict = np.asarray(kld_stdnorm(jnp.asarray(x), reduction="none", mode="strict"))
    mu = x.mean(axis=1)
    var = x.var(axis=1)
    expected = 0.5 * (mu**2 + var - np.log(var + np.finfo(np.float32).eps) - 1)
    np.testing.assert_allclose(strict, expected, rtol=5e-3, atol=1e-5)
    # reductions
    assert np.isclose(
        float(kld_stdnorm(jnp.asarray(x), reduction="mean", mode="simple")),
        simple.mean(),
    )


def test_masked_metrics_match_torch():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(2, 8, 8)).astype(np.float32)
    t = rng.normal(size=(2, 8, 8)).astype(np.float32)
    m = rng.random((2, 8, 8)) > 0.5
    tp, tt, tm = torch.from_numpy(p), torch.from_numpy(t), torch.from_numpy(m)
    exp_mae = torch.mean(torch.abs(tp[tm] - tt[tm])).item()
    exp_rmse = torch.sqrt(torch.mean((tp[tm] - tt[tm]) ** 2)).item()
    assert np.isclose(
        float(masked_mae(jnp.asarray(p), jnp.asarray(t), jnp.asarray(m))),
        exp_mae,
        rtol=1e-5,
    )
    assert np.isclose(
        float(masked_rmse(jnp.asarray(p), jnp.asarray(t), jnp.asarray(m))),
        exp_rmse,
        rtol=1e-5,
    )
