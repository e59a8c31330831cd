"""Microbenchmarks with tunnel-overhead-free timing.

Method: dispatch N async calls, sync once; per-call device time =
(t_N - t_1) / (N - 1). Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_micro.py
"""

import time

import jax
import jax.numpy as jnp

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.models.layers import group_norm, norm_init
from depth_completion_tpu.models.unet import apply_unet
from depth_completion_tpu.ops.flash_attention import flash_attention


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=8):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.time()
    sync(fn(*args))
    t1 = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    tn = time.time() - t0
    per_call = (tn - t1) / (iters - 1) if iters > 1 else tn
    print(f"{name:44s} {per_call*1000:8.2f} ms/call  (single {t1*1000:.1f})", flush=True)


def main():
    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    cfg = bundle.unet_config
    eh, ew = 72, 96
    x = jnp.zeros((1, eh, ew, 8), jnp.bfloat16)
    lat = jnp.zeros((1, eh, ew, 4), jnp.bfloat16)
    ctx = jnp.broadcast_to(bundle.text_context, (1,) + bundle.text_context.shape[1:])
    t = jnp.asarray(500)

    fwd = jax.jit(lambda p, x: apply_unet(p, x, t, ctx, cfg, attention_fn=flash_attention))
    timed("unet fwd", fwd, bundle.unet_params, x, iters=6)

    grad = jax.jit(
        jax.grad(
            lambda z, p: jnp.sum(
                apply_unet(
                    p, jnp.concatenate([x[..., :4], z], axis=-1), t, ctx, cfg,
                    attention_fn=flash_attention, remat=False,
                ).astype(jnp.float32)
            )
        )
    )
    timed("unet fwd+bwd", grad, lat, bundle.unet_params, iters=4)

    # conv-only UNet (no attention): isolates conv/norm cost
    cfg_noattn = registry.UNetConfig(
        block_out_channels=cfg.block_out_channels,
        num_heads=cfg.num_heads,
        attention_stages=(False, False, False, False),
    )
    from depth_completion_tpu.models.unet import init_unet

    p_na = jax.jit(lambda k: init_unet(k, cfg_noattn, jnp.bfloat16))(jax.random.PRNGKey(0))
    fwd_na = jax.jit(lambda p, x: apply_unet(p, x, t, ctx, cfg_noattn))
    timed("unet-noattn fwd", fwd_na, p_na, x, iters=6)

    # flash attention alone at stage-0 geometry
    s, heads, c = eh * ew, 5, 320
    q = jnp.zeros((1, s, c), jnp.bfloat16)
    attn_f = jax.jit(lambda q: flash_attention(q, q, q, heads))
    timed(f"flash attn fwd S={s} C={c}", attn_f, q, iters=6)
    attn_g = jax.jit(jax.grad(lambda q: jnp.sum(flash_attention(q, q, q, heads).astype(jnp.float32))))
    timed("flash attn fwd+bwd", attn_g, q, iters=4)

    # groupnorm alone on a stage-0 activation
    gn_p = norm_init(320)
    act = jnp.zeros((1, eh, ew, 320), jnp.bfloat16)
    gn = jax.jit(lambda a: group_norm(gn_p, a, 32, 1e-5))
    timed("group_norm [1,72,96,320]", gn, act, iters=10)

    # taesd decode fwd+bwd
    dgrad = jax.jit(jax.grad(lambda z: jnp.sum(bundle.vae.decode(z).astype(jnp.float32))))
    timed("taesd decode fwd+bwd", dgrad, lat, iters=4)

    # resize + loss head
    from depth_completion_tpu.ops.resize import resize_antialias

    img = jnp.zeros((1, 576, 768, 1), jnp.float32)
    rs_g = jax.jit(jax.grad(lambda a: jnp.sum(resize_antialias(a, (480, 640)))))
    timed("resize 576x768->480x640 fwd+bwd", rs_g, img, iters=6)


if __name__ == "__main__":
    main()
