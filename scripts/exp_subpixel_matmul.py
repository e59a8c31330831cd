"""Experiment: upsample+conv3x3 as four subpixel 2x2-tap matmuls.

The up-path upsampler convs run at ~32 TF/s in-graph (PERF.md round 2):
XLA fuses the nearest-2x broadcast into the conv and leaves 4.5 ms/step on
the table; barriers and MSA compiler flags were all neutral. This tries a
formulation XLA cannot rewrite back: compute on the ORIGINAL grid, where
output subpixel (di,dj) of the upsampled-then-convolved result is a 2x2-tap
conv with row/col-summed kernel slices (2.25x fewer MACs), expressed as
dot_general over a 4C contraction, then depth-to-space.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_subpixel_matmul.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.core.compile_cache import enable_compile_cache
from depth_completion_tpu.models.layers import conv2d, upsample_nearest_2x

enable_compile_cache()


def upsample_conv_matmul(params, x):
    """= conv2d(params, upsample_nearest_2x(x)) with padding 1, exactly."""
    n, h, w, c = x.shape
    k = params["kernel"].astype(x.dtype)  # [3,3,C,Co]
    co = k.shape[-1]

    # Per-axis tap collapse under nearest-2x: subpixel 0 of an output pair
    # reads source offsets (-1, 0) with kernel rows (0, 1+2); subpixel 1
    # reads offsets (0, +1) with rows (0+1, 2). Same along columns.
    a0 = jnp.stack([k[0], k[1] + k[2]])            # [2,3,C,Co] rows for di=0
    a1 = jnp.stack([k[0] + k[1], k[2]])            # [2,3,C,Co] rows for di=1

    def col_collapse(a, dj):
        if dj == 0:
            return jnp.stack([a[:, 0], a[:, 1] + a[:, 2]], axis=1)  # [2,2,C,Co]
        return jnp.stack([a[:, 0] + a[:, 1], a[:, 2]], axis=1)

    # shifted views of x with zero edges; offsets -1, 0, +1 per axis
    def shift(x, ri, rj):
        pt, pb = max(-ri, 0), max(ri, 0)
        pl, pr = max(-rj, 0), max(rj, 0)
        y = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        return y[:, pb : pb + h, pr : pr + w, :]

    offs = {0: (-1, 0), 1: (0, 1)}  # subpixel -> (first, second) source offset
    outs = []
    for di in (0, 1):
        row_k = a0 if di == 0 else a1
        for dj in (0, 1):
            kk = col_collapse(row_k, dj)           # [2,2,C,Co]
            views = [
                shift(x, offs[di][ai], offs[dj][bi])
                for ai in (0, 1)
                for bi in (0, 1)
            ]
            xin = jnp.concatenate(views, axis=-1)  # [N,H,W,4C]
            wmat = kk.reshape(4 * c, co)           # [4C,Co] (a-major, b, then C)
            outs.append(
                jax.lax.dot_general(
                    xin.reshape(n * h * w, 4 * c),
                    wmat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=x.dtype,
                ).reshape(n, h, w, co)
            )
    o = jnp.stack(outs, axis=3).reshape(n, h, w, 2, 2, co)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    if "bias" in params:
        o = o + params["bias"].astype(o.dtype)
    return o


def main() -> None:
    rng = np.random.default_rng(0)

    # exactness (force true-fp32 multiplies — TPU matmuls default to bf16)
    with jax.default_matmul_precision("float32"):
        _exactness(rng)

    if jax.default_backend() != "tpu":
        print("not on TPU; skipping timing")
        return

    _timing(rng)


def _exactness(rng) -> None:
    for h, w, c, co in [(5, 7, 8, 16), (36, 48, 64, 32)]:
        x = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
        params = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, c, co)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(co,)), jnp.float32),
        }
        ref = conv2d(params, upsample_nearest_2x(x))
        got = upsample_conv_matmul(params, x)
        err = float(jnp.abs(ref - got).max())
        scale = float(jnp.abs(ref).max())
        print(f"exactness {h}x{w} {c}->{co}: max err {err:.3e} (scale {scale:.1f})")
        assert err / scale < 1e-5, "not equivalent"


def _timing(rng) -> None:
    # standalone timing at the real up-path geometries (bf16)
    for h, w, c in [(18, 24, 1280), (36, 48, 1280), (36, 48, 640), (72, 96, 640)]:
        x = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.bfloat16)
        params = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, c, c)), jnp.bfloat16),
            "bias": jnp.zeros((c,), jnp.bfloat16),
        }

        def bench(f, tag):
            g = jax.jit(lambda p, x: jnp.sum(f(p, x).astype(jnp.float32)))
            gr = jax.jit(jax.grad(lambda p, x: jnp.sum(f(p, x).astype(jnp.float32)), argnums=1))
            float(g(params, x))
            float(jnp.sum(gr(params, x).astype(jnp.float32)))
            reps = 30
            t0 = time.time()
            acc = None
            for _ in range(reps):
                acc = g(params, x)
            float(acc)
            fwd = (time.time() - t0) / reps * 1000
            t0 = time.time()
            for _ in range(reps):
                acc = gr(params, x)
            float(jnp.sum(acc.astype(jnp.float32)))
            bwd = (time.time() - t0) / reps * 1000
            print(f"  {tag}: fwd {fwd:.3f} ms, fwd+bwd-ish {bwd:.3f} ms")

        print(f"geometry {h}x{w} c={c} (out {2*h}x{2*w}):")
        bench(lambda p, x: conv2d(p, upsample_nearest_2x(x)), "baseline ups+conv")
        bench(upsample_conv_matmul, "subpixel matmul  ")


if __name__ == "__main__":
    main()
