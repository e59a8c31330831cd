"""Upsample+conv experiments: defuse the broadcast from the conv.

The trace shows upsampler convs run at ~32 TF/s while plain convs hit
~136 TF/s — XLA fuses the nearest-2x broadcast into the conv (kOutput
fusion), which breaks the efficient conv path. Candidates:

  fused    conv(upsample(x))                      current
  barrier  conv(optimization_barrier(upsample))   force materialization
  subpixel 4 low-res convs with alias-summed taps (round-1 experiment)

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_upsample.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.models.layers import conv2d, upsample_nearest_2x


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=8, flops=None):
    sync(fn(*args))
    t0 = time.time()
    sync(fn(*args))
    t1 = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    tn = time.time() - t0
    ms = (tn - t1) / (iters - 1) * 1000
    extra = f"  {flops / (ms / 1000) / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {ms:8.3f} ms{extra}", flush=True)


def subpixel(params, x):
    """conv3x3(nearest_2x(x)) via 4 parity convs at low resolution."""
    k = params["kernel"].astype(x.dtype)
    rows = {
        0: jnp.stack([k[0], k[1] + k[2]], axis=0),
        1: jnp.stack([k[0] + k[1], k[2]], axis=0),
    }
    outs = {}
    for di in (0, 1):
        e = rows[di]
        cols = {
            0: jnp.stack([e[:, 0], e[:, 1] + e[:, 2]], axis=1),
            1: jnp.stack([e[:, 0] + e[:, 1], e[:, 2]], axis=1),
        }
        for dj in (0, 1):
            pad = (((1, 0) if di == 0 else (0, 1)), ((1, 0) if dj == 0 else (0, 1)))
            outs[(di, dj)] = jax.lax.conv_general_dilated(
                x, cols[dj], (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, w, _ = x.shape
    cout = k.shape[-1]
    out = jnp.stack(
        [jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3),
         jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)], axis=2)
    out = out.reshape(n, h * 2, w * 2, cout)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def run(tag, h, w, c, iters=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h, w, c)) * 0.1, jnp.bfloat16)
    params = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16),
        "bias": jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.bfloat16),
    }
    flops = 2 * (2 * h) * (2 * w) * 9 * c * c

    fused = jax.jit(lambda p, x: conv2d(p, upsample_nearest_2x(x)))
    barrier = jax.jit(
        lambda p, x: conv2d(p, jax.lax.optimization_barrier(upsample_nearest_2x(x))))
    subp = jax.jit(subpixel)

    a, b, c2 = fused(params, x), barrier(params, x), subp(params, x)
    err_b = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    err_s = float(jnp.max(jnp.abs(a.astype(jnp.float32) - c2.astype(jnp.float32))))
    print(f"-- {tag} [1,{h},{w},{c}] -> 2x (errs: barrier {err_b:.2e}, "
          f"subpixel {err_s:.2e})", flush=True)
    timed("fwd fused", fused, params, x, iters=iters, flops=flops)
    timed("fwd barrier", barrier, params, x, iters=iters, flops=flops)
    timed("fwd subpixel", subp, params, x, iters=iters, flops=flops)

    for name, f in [("fused", fused), ("barrier", barrier), ("subpixel", subp)]:
        g = jax.jit(jax.grad(
            lambda x, p, f=f: jnp.sum(f(p, x).astype(jnp.float32))))
        timed(f"f+b {name}", g, x, params, iters=iters, flops=3 * flops)


if __name__ == "__main__":
    run("unet up1", 36, 48, 640)
    run("unet up0", 18, 24, 1280)
    run("taesd up", 144, 192, 64)
    run("taesd up hi", 288, 384, 64)
