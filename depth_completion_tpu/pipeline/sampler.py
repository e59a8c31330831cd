"""The guided sampling loop — one jit-compiled `lax.scan`, zero host trips.

This is the TPU-native redesign of the reference's hot loop
(reference marigold_dc.py:791-909). Per DDIM step the reference launches
dozens of torch kernels from Python and mutates `.data` on an nn.Parameter;
here the entire algorithm — UNet forward, Tweedie preview, differentiable
decode through the VAE, anchor losses, per-sample ε-norm gradient rescale,
optimizer update, and the DDIM transition — is one scan body compiled once
per (batch, geometry, steps) signature.

Exact dataflow preserved from the reference:
- ε̂ comes from the UNet applied to the *pre-update* latent; the DDIM step is
  applied to the *post-update* latent with that old ε̂
  (reference marigold_dc.py:806-904).
- gradients flow through the UNet and the VAE decoder into the latent (the
  scheduler preview is kept in-graph, reference marigold_dc.py:820-826).
- per-sample losses: grad of the summed loss equals per-sample gradients
  because samples are independent (the `losses.backward(ones)` trick,
  reference marigold_dc.py:875-877).
- latent gradient rescaled per sample by ‖ε̂_ref‖/‖g‖ (reference
  marigold_dc.py:879-894) before the optimizer step; affine-parameter grads
  are left untouched.

Deliberate deviation (SURVEY.md §3.2 warning): in `per-input` mode the
reference's optimizer holds a stale latent parameter so only affine params
actually train; here the final latent genuinely trains, which is the
documented *intended* behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from depth_completion_tpu.guidance.affine import (
    affine_to_metric_closed_form,
    affine_to_metric_learned,
)
from depth_completion_tpu.guidance.losses import compute_loss
from depth_completion_tpu.guidance.optim import make_optimizer
from depth_completion_tpu.guidance.projection import (
    DepthNormalization,
    denormalize_depth,
    normalize_sparse,
    renormalize_to_guidance,
)
from depth_completion_tpu.models.bundle import ModelBundle
from depth_completion_tpu.models.unet import apply_unet
from depth_completion_tpu.ops.resize import resize_antialias, unpad
from depth_completion_tpu.pipeline.preprocess import preprocess_images
from depth_completion_tpu.sched.ddim import (
    DDIMConfig,
    ddim_step,
    make_schedule,
    make_timesteps,
    pred_epsilon,
    pred_original,
)
from depth_completion_tpu.sched.lcm import LCMConfig, lcm_step, make_lcm_timesteps

EPSILON = 1e-7  # reference marigold_dc.py:20

# remat_unet="auto" anchor, measured on v5e (PERF.md round-3 batch/remat
# sweep): batch 12 of 72×96 latents fits remat-off in the 15.75 GiB the
# runtime grants (bytes_limit), batch 16 OOMs at compile (needs 17.0 GiB).
_REMAT_ANCHOR_PIXELS = 12 * 72 * 96
_REMAT_ANCHOR_BYTES = int(15.75 * 1024**3)


def _remat_auto_threshold() -> int:
    """Latent-pixel product (n·EH·EW) above which "auto" rematerializes.

    Derived from the device's reported HBM when available: the threshold
    scales linearly with ``memory_stats()["bytes_limit"]`` around the
    measured v5e anchor (on v5e the ratio is 1.0, so behavior there is
    unchanged). Linear scaling is conservative — activation memory has a
    large fixed term (weights + decode activations), so a 32 GiB chip fits
    strictly more than 2× the v5e batch — remat flips on early, never OOMs
    late. Devices that don't report memory stats (CPU, some plugins) use
    the v5e anchor unchanged.
    """
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    if not limit:
        return _REMAT_ANCHOR_PIXELS
    return max(1, int(_REMAT_ANCHOR_PIXELS * (limit / _REMAT_ANCHOR_BYTES)))


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampling configuration (hashable → jit cache key).

    Field defaults mirror the *library* defaults of the reference pipeline
    (reference marigold_dc.py:467-493); the CLI layer applies its own
    differing defaults and coercion rules (reference predict.py:423-457).
    """

    steps: int = 50
    resolution: int = 768
    projection: str = "linear"  # "linear" | "log" | "log10"
    inv: bool = False
    norm: str = "minmax"  # "const" | "minmax" | "percentile"
    percentile: tuple[float, float] = (0.01, 0.99)
    beta: float = 0.9
    closed_form: bool | None = None
    opt: str = "adam"
    lr_latent: float = 0.05
    lr_scaling: float = 0.005
    kld: bool = False
    kld_weight: float = 0.1
    kld_mode: str = "simple"
    interp_mode: str = "bilinear"
    loss_funcs: tuple[str, ...] = ("l1", "l2")
    seed: int = 2024
    train_latents: bool = True
    train_method: str = "per-step"  # "per-step" | "per-input"
    train_steps: int = 10
    min_depth: float = 0.0
    max_depth: float = 120.0
    scheduler: str = "ddim"  # "ddim" | "lcm"
    ddim: DDIMConfig = DDIMConfig()
    lcm: LCMConfig = LCMConfig()
    # Rematerialize UNet stages in the guidance backward pass.
    # "auto": off while batch·latent-area fits the device's HBM, on beyond.
    # The fit edge scales with memory_stats()["bytes_limit"], anchored at
    # the measured v5e point 12·72·96 latent pixels @ 15.75 GiB (batch 12
    # at res 768 fits remat-off, batch 16 OOMs; remat costs ~an extra UNet
    # forward per step). "on"/"off" force it.
    remat_unet: str | bool = "auto"
    # "auto": fused Pallas flash attention on TPU, XLA elsewhere
    flash_attention: str = "auto"  # "auto" | "on" | "off"
    # Experimental native-resolution mode (SURVEY §5 long-context stretch):
    # shard the self-attention sequence over this mesh axis and rotate KV
    # blocks around the ring (ops/ring_attention.py), so each device holds
    # S/P of the keys/values during attention. Cross-attention (2-token KV)
    # and sequences not divisible by the ring size fall back to the base
    # attention. Mesh is hashable → stays a valid static jit key.
    ring_mesh: Any = None  # jax.sharding.Mesh | None
    ring_axis: str = "data"
    # Acceleration option (deviation from reference when enabled): stop the
    # guidance gradient at the UNet output, so the anchor loss differentiates
    # only through the Tweedie combination and the VAE decoder — the common
    # "gradient through x̂₀" approximation in guided-diffusion practice.
    # Skips the UNet backward pass (~2× faster steps); off by default to
    # match the reference's exact dataflow (marigold_dc.py:806-877).
    detach_unet_grad: bool = False

    def resolved_closed_form(self) -> bool:
        """closed_form=None → ¬train_latents (reference marigold_dc.py:605-613)."""
        if self.closed_form is None:
            return not self.train_latents
        if not self.closed_form and not self.train_latents:
            raise ValueError(
                "closed_form must be True (or None) when train_latents=False"
            )
        return self.closed_form

    def validate(self) -> None:
        """Host-side argument validation (reference marigold_dc.py:583-656)."""
        if self.train_method not in ("per-step", "per-input"):
            raise ValueError(f"Unknown train_method: {self.train_method}")
        if self.train_method == "per-input" and self.train_steps <= 0:
            raise ValueError("train_steps must be > 0 for per-input training")
        if not (0 < self.beta < 1):
            raise ValueError(f"beta must be in (0, 1), got {self.beta}")
        if self.norm == "percentile" and not all(
            0 <= p <= 1 for p in self.percentile
        ):
            raise ValueError(f"percentile must be in [0, 1], got {self.percentile}")
        if self.projection not in ("linear", "log", "log10"):
            raise ValueError(f"Unknown projection method: {self.projection}")
        if (self.projection in ("log", "log10") or self.inv) and (
            self.min_depth <= EPSILON
        ):
            raise ValueError(
                f"min_depth must be > {EPSILON} for log/log10/inverse projection"
            )
        if self.norm not in ("const", "minmax", "percentile"):
            raise ValueError(f"Unknown norm method: {self.norm}")
        self.resolved_closed_form()


# ---------------------------------------------------------------------------
# Decode head
# ---------------------------------------------------------------------------

def decode_prediction(bundle: ModelBundle, latents: jnp.ndarray) -> jnp.ndarray:
    """Latent → [0,1] affine depth at processing resolution.

    Marigold decode semantics: VAE decode → mean over RGB channels →
    clip [-1,1] → (x+1)/2 (the `decode_prediction` contract the reference
    inherits, SURVEY.md §2.2). Decode runs in the model compute dtype (bf16
    by default, as the reference's bf16 pipeline does) — the fp32 Tweedie
    preview is cast down at the decode boundary.
    """
    latents = latents.astype(bundle.text_context.dtype)
    return bundle.vae.decode_depth(latents)  # [N, PPH, PPW, 1] in [0, 1]


def latent_to_affine(
    bundle: ModelBundle,
    latents: jnp.ndarray,
    orig_res: tuple[int, int],
    padding: tuple[int, int],
    interp_mode: str,
) -> jnp.ndarray:
    """Decode, unpad, resize to original resolution (marigold_dc.py:338-371)."""
    affine = decode_prediction(bundle, latents)
    affine = unpad(affine, padding)
    return resize_antialias(
        affine.astype(jnp.float32), orig_res, method=interp_mode
    )


def _affine_to_metric(
    affines: jnp.ndarray,
    dn: DepthNormalization,
    affine_params: dict | None,
    closed_form: bool,
) -> jnp.ndarray:
    if closed_form:
        return affine_to_metric_closed_form(affines, dn.sparses_normed, dn.masks)
    assert affine_params is not None
    return affine_to_metric_learned(
        affines, dn.sparses_normed, dn.masks, affine_params["scale"], affine_params["shift"]
    )


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def _prepare(bundle, images, sparses, cfg, pred_latents_prev, rng, init_noise=None):
    """No-grad preprocessing: noise, image latents, normalization state."""
    n = images.shape[0]
    imgs_proc, padding, orig_res = preprocess_images(
        images, cfg.resolution, cfg.interp_mode
    )
    imgs_proc = imgs_proc.astype(bundle.text_context.dtype)
    img_latents = bundle.vae.encode(imgs_proc)  # [N, EH, EW, 4]
    eh, ew = img_latents.shape[1], img_latents.shape[2]

    if init_noise is not None:
        # Ensemble mode: per-row noise supplied by the caller.
        pred_latents = init_noise.astype(jnp.float32)
    else:
        # Common init noise across the batch (reference marigold_dc.py:677-684).
        noise = jax.random.normal(rng, (1, eh, ew, 4), dtype=jnp.float32)
        pred_latents = jnp.broadcast_to(noise, (n, eh, ew, 4))
    if pred_latents_prev is not None:
        pred_latents = (
            cfg.beta * pred_latents + (1.0 - cfg.beta) * pred_latents_prev.astype(jnp.float32)
        )

    dn = normalize_sparse(
        sparses,
        norm=cfg.norm,
        projection=cfg.projection,
        inv=cfg.inv,
        min_depth=cfg.min_depth,
        max_depth=cfg.max_depth,
        percentile=cfg.percentile,
    )
    return img_latents, pred_latents, dn, padding, orig_res


def _guidance_loss(
    bundle: ModelBundle,
    cfg: SamplerConfig,
    dn: DepthNormalization,
    images: jnp.ndarray,
    orig_res,
    padding,
    closed_form: bool,
    latents_for_decode: jnp.ndarray,
    affine_params: dict | None,
    pred_latents: jnp.ndarray,
    clamp: bool = True,
) -> jnp.ndarray:
    """Per-sample guidance losses on a decoded latent → [N].

    ``clamp`` matches the reference's mode split: the per-step branch clips
    the decoded prediction to [0,1] before the loss (marigold_dc.py:838-840),
    the per-input branch does NOT (marigold_dc.py:918-928 — clipping would
    kill gradients at anchors whose prediction sits outside [0,1]).
    """
    denses = latent_to_affine(
        bundle, latents_for_decode, orig_res, padding, cfg.interp_mode
    )
    denses = _affine_to_metric(denses, dn, affine_params, closed_form)
    if clamp:
        denses = jnp.clip(denses, 0.0, 1.0)
    denses = renormalize_to_guidance(denses, dn, cfg.projection, cfg.inv)
    return compute_loss(
        denses,
        dn.sparses_normed,
        dn.masks,
        cfg.loss_funcs,
        images=images,
        kld=cfg.kld,
        kld_weight=cfg.kld_weight,
        kld_mode=cfg.kld_mode,
        pred_latents=pred_latents,
    )


def guided_sample(
    bundle: ModelBundle,
    images: jnp.ndarray,
    sparses: jnp.ndarray,
    cfg: SamplerConfig,
    pred_latents_prev: jnp.ndarray | None = None,
    init_noise: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full depth-completion sampling → (metric denses [N,H,W,1], latents).

    Jit-compatible as a whole; `cfg` and shapes are static. Mirrors
    `MarigoldDepthCompletionPipeline.__call__` (reference
    marigold_dc.py:467-985) with the scan-based redesign described above.
    """
    cfg.validate()
    closed_form = cfg.resolved_closed_form()
    n = images.shape[0]
    sched = make_schedule(cfg.ddim)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, noise_key = jax.random.split(rng)

    img_latents, pred_latents, dn, padding, orig_res = _prepare(
        bundle, images, sparses, cfg, pred_latents_prev, noise_key, init_noise
    )
    compute_dtype = img_latents.dtype

    if cfg.scheduler == "lcm":
        ts = make_lcm_timesteps(cfg.ddim.num_train_timesteps, cfg.steps, cfg.lcm)
        prev_ts = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    else:
        ts = make_timesteps(cfg.ddim, cfg.steps)
        prev_ts = None  # DDIM derives prev internally from the static stride

    if cfg.flash_attention == "on" or (
        cfg.flash_attention == "auto" and jax.default_backend() == "tpu"
    ):
        from depth_completion_tpu.ops.flash_attention import flash_attention

        attention_fn = flash_attention
    else:
        from depth_completion_tpu.models.layers import attention as attention_fn

    if cfg.ring_mesh is not None:
        # Native-resolution mode: route self-attention (divisible S) through
        # the sequence-sharded ring; cross-attention keeps the base kernel.
        from depth_completion_tpu.ops.ring_attention import ring_attention_sharded

        ring_size = cfg.ring_mesh.shape[cfg.ring_axis]
        base_attention = attention_fn

        def attention_fn(q, k, v, num_heads):  # noqa: F811
            if q.shape[1] == k.shape[1] and q.shape[1] % ring_size == 0:
                return ring_attention_sharded(
                    q, k, v, num_heads, cfg.ring_mesh, cfg.ring_axis
                )
            return base_attention(q, k, v, num_heads)

    if cfg.remat_unet == "auto":
        # heuristic: rematerialize UNet stages once activation memory
        # genuinely stops fitting HBM (remat costs ~an extra UNet forward
        # per step — 22% at batch 12 on v5e, PERF.md round-3 sweep). The
        # threshold is derived from the device's reported HBM, anchored at
        # the measured v5e fit edge (see _remat_auto_threshold).
        eh, ew = img_latents.shape[1], img_latents.shape[2]
        remat_unet = n * eh * ew > _remat_auto_threshold()
    elif isinstance(cfg.remat_unet, bool):
        remat_unet = cfg.remat_unet
    elif cfg.remat_unet in ("on", "off"):
        # NB not bool(str): bool("off") is True — that bug shipped once
        remat_unet = cfg.remat_unet == "on"
    else:
        raise ValueError(
            f"remat_unet must be 'auto'/'on'/'off' or bool, got "
            f"{cfg.remat_unet!r}"
        )

    def unet_eps(latents, t):
        x = jnp.concatenate(
            [img_latents, latents.astype(compute_dtype)], axis=-1
        )
        ctx = jnp.broadcast_to(
            bundle.text_context, (n,) + bundle.text_context.shape[1:]
        )
        return apply_unet(
            bundle.unet_params,
            x,
            t,
            ctx,
            bundle.unet_config,
            attention_fn=attention_fn,
            remat=remat_unet,
        )

    train = cfg.train_latents and cfg.scheduler != "lcm"

    # ----- plain (no-training) denoising ---------------------------------
    if not train:
        if cfg.scheduler == "lcm":
            def body(carry, xs):
                lat, step_rng = carry
                t, pt, is_last = xs
                step_rng, sub = jax.random.split(step_rng)
                out = unet_eps(lat, t)
                lat, _ = lcm_step(
                    sched, out, t, pt, lat, sub, is_last, cfg.lcm
                )
                return (lat, step_rng), None

            is_last = np.zeros(len(ts), dtype=bool)
            is_last[-1] = True
            (pred_latents, _), _ = jax.lax.scan(
                body,
                (pred_latents, rng),
                (jnp.asarray(ts), jnp.asarray(prev_ts), jnp.asarray(is_last)),
            )
        else:
            def body(lat, t):
                out = unet_eps(lat, t)
                lat, _ = ddim_step(sched, out, t, lat, cfg.steps)
                return lat, None

            pred_latents, _ = jax.lax.scan(body, pred_latents, jnp.asarray(ts))
        final_latents = pred_latents
        affine_params = None

    # ----- per-step guided training (THE hot path) -----------------------
    elif cfg.train_method == "per-step":
        from depth_completion_tpu.ops import guidance_epilogue as ge

        params = {"latents": pred_latents}
        if not closed_form:
            params["affine"] = {
                "scale": jnp.ones((n, 1, 1, 1), jnp.float32),
                "shift": jnp.zeros((n, 1, 1, 1), jnp.float32),
            }

        def loss_and_grads(params, t):
            def loss_fn(p):
                lat = p["latents"]
                out = unet_eps(lat, t)
                if cfg.detach_unet_grad:
                    out = jax.lax.stop_gradient(out)
                x0 = pred_original(sched, out, t, lat)
                losses = _guidance_loss(
                    bundle, cfg, dn, images, orig_res, padding, closed_form,
                    x0, p.get("affine"), lat,
                )
                return jnp.sum(losses), out

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        # Fused Pallas epilogue (ε-rescale + Adam + DDIM in one kernel,
        # ops/guidance_epilogue.py) for the Marigold configuration; any
        # other optimizer/scheduler takes the general optax chain below.
        use_fused = (
            cfg.opt == "adam"
            and ge.enabled()
            and sched.config.prediction_type in ("v_prediction", "epsilon")
            and not sched.config.clip_sample
        )
        if use_fused:
            aff_opt = (
                optax.adam(cfg.lr_scaling, b1=0.9, b2=0.999, eps=1e-8)
                if not closed_form
                else None
            )
            aff_state = aff_opt.init(params["affine"]) if aff_opt else None
            carry0 = (
                params,
                aff_state,
                jnp.zeros_like(pred_latents),  # Adam m
                jnp.zeros_like(pred_latents),  # Adam v
                jnp.zeros((), jnp.int32),  # Adam step count
            )

            def step_body(carry, t):
                params, aff_state, m, v, count = carry
                (_, out), grads = loss_and_grads(params, t)
                if aff_opt is not None:
                    upd, aff_state = aff_opt.update(
                        grads["affine"], aff_state, params["affine"]
                    )
                    params["affine"] = optax.apply_updates(
                        params["affine"], upd
                    )
                new_lat, m, v, count = ge.guided_epilogue(
                    params["latents"],
                    grads["latents"],
                    out,
                    m, v, count,
                    sched, t, cfg.steps,
                    lr=cfg.lr_latent,
                )
                params["latents"] = new_lat
                return (params, aff_state, m, v, count), None

            (params, *_), _ = jax.lax.scan(step_body, carry0, jnp.asarray(ts))
        else:
            opt = make_optimizer(cfg.opt, cfg.lr_latent, cfg.lr_scaling)
            opt_state = opt.init(params)

            def step_body(carry, t):
                params, opt_state = carry
                (_, out), grads = loss_and_grads(params, t)

                # ε-norm gradient rescale, per sample, latent grads only
                # (reference marigold_dc.py:879-894).
                eps_ref = pred_epsilon(sched, out, t, params["latents"])
                eps_norm = jnp.linalg.norm(
                    eps_ref.reshape(n, -1).astype(jnp.float32), axis=1
                )
                g = grads["latents"].astype(jnp.float32)
                g_norm = jnp.linalg.norm(g.reshape(n, -1), axis=1)
                factors = (
                    eps_norm / jnp.maximum(g_norm, EPSILON)
                ).reshape(n, 1, 1, 1)
                grads["latents"] = g * factors

                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                # DDIM transition: old ε̂ on the *updated* latent
                # (reference marigold_dc.py:899-904).
                new_lat, _ = ddim_step(
                    sched, out, t, params["latents"], cfg.steps
                )
                params["latents"] = new_lat
                return (params, opt_state), None

            (params, _), _ = jax.lax.scan(
                step_body, (params, opt_state), jnp.asarray(ts)
            )
        final_latents = params["latents"]
        affine_params = params.get("affine")

    # ----- per-input training --------------------------------------------
    else:
        def denoise_body(lat, t):
            out = unet_eps(lat, t)
            lat, _ = ddim_step(sched, out, t, lat, cfg.steps)
            return lat, None

        pred_latents, _ = jax.lax.scan(denoise_body, pred_latents, jnp.asarray(ts))

        opt = make_optimizer(cfg.opt, cfg.lr_latent, cfg.lr_scaling)
        params = {"latents": pred_latents}
        if not closed_form:
            params["affine"] = {
                "scale": jnp.ones((n, 1, 1, 1), jnp.float32),
                "shift": jnp.zeros((n, 1, 1, 1), jnp.float32),
            }
        opt_state = opt.init(params)

        def train_body(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                # Per-input mode decodes the latent directly — no Tweedie
                # preview, and no [0,1] clamp before the loss (reference
                # marigold_dc.py:918-928).
                losses = _guidance_loss(
                    bundle, cfg, dn, images, orig_res, padding, closed_form,
                    p["latents"], p.get("affine"), p["latents"],
                    clamp=False,
                )
                return jnp.sum(losses)

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        (params, _), _ = jax.lax.scan(
            train_body, (params, opt_state), None, length=cfg.train_steps
        )
        final_latents = params["latents"]
        affine_params = params.get("affine")

    # ----- final decode (reference marigold_dc.py:969-985) ----------------
    denses_affine = latent_to_affine(
        bundle, final_latents, orig_res, padding, cfg.interp_mode
    )
    denses_normed = jnp.clip(
        _affine_to_metric(denses_affine, dn, affine_params, closed_form), 0.0, 1.0
    )
    denses = denormalize_depth(denses_normed, dn)
    return denses, final_latents
