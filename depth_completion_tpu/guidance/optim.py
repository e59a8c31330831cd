"""Latent/affine optimizers as scan-carried optax state.

The reference builds a torch optimizer over two parameter groups — the depth
latent (lr 0.05) and the learned affine scale/shift (lr 0.005) — choosing
Adam | SGD | Adagrad (reference marigold_dc.py:774-789, predict.py:215-238).

Here the "parameters" are a pytree carried through the sampling scan:

    {"latents": [N,EH,EW,4], "affine": {"scale": [N,1,1,1], "shift": ...}}

and the optimizer is an optax ``multi_transform`` whose state rides in the
scan carry. Hyperparameters follow torch defaults: Adam (β=0.9/0.999,
eps=1e-8), plain SGD, Adagrad (eps=1e-10, zero initial accumulator).
"""

from __future__ import annotations

import optax


def make_optimizer(
    opt: str, lr_latent: float = 0.05, lr_scaling: float = 0.005
) -> optax.GradientTransformation:
    """Two-group optimizer over the {"latents", "affine"} parameter pytree."""

    def group(lr: float) -> optax.GradientTransformation:
        if opt == "adam":
            return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        if opt == "sgd":
            return optax.sgd(lr)
        if opt == "adagrad":
            return optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
        raise ValueError(f"Unknown optimizer: {opt}")

    def label_fn(params):
        import jax

        return {
            key: jax.tree.map(
                lambda _: "latents" if key == "latents" else "affine", subtree
            )
            for key, subtree in params.items()
        }

    return optax.multi_transform(
        {"latents": group(lr_latent), "affine": group(lr_scaling)}, label_fn
    )
