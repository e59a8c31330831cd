"""ModelBundle: the pipeline's view of (UNet, VAE, text context, schedule).

Abstracts over the two VAE families (KL "original" vs TAESD "light",
reference predict.py:44-52,484-488) with a uniform encode/decode interface,
and carries the cached empty-prompt context the UNet cross-attends to
(reference marigold_dc.py:663-674 caches it once per pipeline).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp

from depth_completion_tpu.models import clip_text, registry, vae_kl, vae_tiny, weights
from depth_completion_tpu.models.registry import (
    CLIPTextConfig,
    TaesdConfig,
    UNetConfig,
    VAEConfig,
)


@dataclasses.dataclass(frozen=True)
class VAE:
    """VAE params + config with dispatch on family."""

    kind: str  # "kl" | "tiny"
    params: Any
    config: VAEConfig | TaesdConfig

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "kl":
            return vae_kl.encode(self.params, images, self.config)
        return vae_tiny.encode(self.params, images, self.config)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "kl":
            return vae_kl.decode(self.params, latents, self.config)
        return vae_tiny.decode(self.params, latents, self.config)

    def decode_depth(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Marigold decode head: latent → [0,1] depth [N,H,W,1].

        Equals ``(clip(mean_rgb(decode(z)), -1, 1) + 1) / 2``; the tiny VAE
        fuses the channel mean into ``conv_out`` (see vae_tiny.decode_depth).
        """
        if self.kind == "tiny":
            return vae_tiny.decode_depth(self.params, latents, self.config)
        return vae_kl.decode_depth(self.params, latents, self.config)

    @property
    def downsample_factor(self) -> int:
        """Spatial downsampling of encode (8 for SD-class configs)."""
        if self.kind == "kl":
            return 2 ** (len(self.config.block_out_channels) - 1)
        return 2 ** (len(self.config.encoder_blocks) - 1)


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Everything the sampling loop needs besides the schedule."""

    unet_params: Any
    unet_config: UNetConfig
    vae: VAE
    # [1, S, D] cached empty-prompt CLIP context (S=2 with do_not_pad)
    text_context: jnp.ndarray
    # diffusion schedule read from the checkpoint's scheduler config (static)
    ddim_config: Any = None  # DDIMConfig | None → sampler default


# Register VAE and ModelBundle as pytrees: params are children (traced /
# shardable), configs and the VAE family tag are static aux data — so a
# bundle can be passed straight through jit/pjit.
jax.tree_util.register_pytree_node(
    VAE,
    lambda v: ((v.params,), (v.kind, v.config)),
    lambda aux, ch: VAE(kind=aux[0], params=ch[0], config=aux[1]),
)
jax.tree_util.register_pytree_node(
    ModelBundle,
    lambda b: (
        (b.unet_params, b.vae, b.text_context),
        (b.unet_config, b.ddim_config),
    ),
    lambda aux, ch: ModelBundle(
        unet_params=ch[0],
        unet_config=aux[0],
        vae=ch[1],
        text_context=ch[2],
        ddim_config=aux[1],
    ),
)


def make_random_bundle(
    seed: int = 0,
    unet_config: UNetConfig = registry.TINY_UNET_CONFIG,
    vae_kind: str = "tiny",
    vae_config: VAEConfig | TaesdConfig | None = None,
    text_config: CLIPTextConfig = registry.TINY_TEXT_CONFIG,
    dtype=jnp.float32,
) -> ModelBundle:
    """Random-weight bundle (tests, benches; checkpoints unavailable offline)."""
    if vae_config is None:
        vae_config = (
            registry.TINY_TAESD_CONFIG if vae_kind == "tiny" else registry.TINY_VAE_CONFIG
        )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    from depth_completion_tpu.models.unet import init_unet

    # jit the initializers: eager init dispatches thousands of tiny ops,
    # which is pathological on a remote-device backend.
    unet_params = jax.jit(
        lambda k: init_unet(k, unet_config, dtype)
    )(k1)
    if vae_kind == "tiny":
        vae_params = jax.jit(lambda k: vae_tiny.init_taesd(k, vae_config, dtype))(k2)
    else:
        vae_params = jax.jit(lambda k: vae_kl.init_vae(k, vae_config, dtype))(k2)
    ids = jnp.asarray(clip_text.empty_prompt_ids(text_config))
    # clamp ids into the tiny vocab for scaled-down test configs
    ids = jnp.minimum(ids, text_config.vocab_size - 1)

    def _ctx(k, ids):
        text_params = clip_text.init_text_encoder(k, text_config, dtype)
        return clip_text.apply_text_encoder(text_params, ids, text_config)

    ctx = jax.jit(_ctx)(k3, ids)
    # project context to the UNet's cross-attention width if configs disagree
    if ctx.shape[-1] != unet_config.cross_attention_dim:
        ctx = jnp.zeros(
            (1, ctx.shape[1], unet_config.cross_attention_dim), dtype
        ).at[..., : min(ctx.shape[-1], unet_config.cross_attention_dim)].set(
            ctx[..., : unet_config.cross_attention_dim]
        )
    return ModelBundle(
        unet_params=unet_params,
        unet_config=unet_config,
        vae=VAE(kind=vae_kind, params=vae_params, config=vae_config),
        text_context=ctx.astype(dtype),
    )


def _read_json(path: Path) -> dict | None:
    import json

    return json.loads(path.read_text()) if path.exists() else None


def load_bundle(
    model_dir: Path,
    vae_kind: str = "tiny",
    taesd_dir: Path | None = None,
    dtype=jnp.bfloat16,
    unet_config: UNetConfig | None = None,
    text_config: CLIPTextConfig | None = None,
) -> ModelBundle:
    """Load a Marigold HF-layout checkpoint directory.

    ``model_dir`` holds ``unet/``, ``vae/``, ``text_encoder/``, ``scheduler/``
    subfolders; ``taesd_dir`` (flat safetensors) replaces the VAE when
    vae_kind="tiny" — the reference's default pipeline assembly
    (predict.py:478-488). Model geometry and the diffusion schedule are read
    from the checkpoint's config JSONs when present; explicit ``unet_config``
    / ``text_config`` arguments override.
    """
    model_dir = Path(model_dir)

    if unet_config is None:
        cfg_json = _read_json(model_dir / "unet" / "config.json")
        unet_config = (
            registry.unet_config_from_diffusers(cfg_json)
            if cfg_json
            else registry.MARIGOLD_UNET_CONFIG
        )
    if text_config is None:
        cfg_json = _read_json(model_dir / "text_encoder" / "config.json")
        text_config = (
            registry.text_config_from_transformers(cfg_json)
            if cfg_json
            else registry.SD2_TEXT_CONFIG
        )
    sched_json = _read_json(model_dir / "scheduler" / "scheduler_config.json")
    ddim_config = (
        registry.ddim_config_from_diffusers(sched_json) if sched_json else None
    )

    unet_params = weights.load_unet(model_dir / "unet", dtype)
    if vae_kind == "tiny":
        if taesd_dir is None:
            raise ValueError("taesd_dir is required for vae_kind='tiny'")
        vae = VAE("tiny", weights.load_taesd(Path(taesd_dir), dtype), registry.TAESD_CONFIG)
    else:
        vae_json = _read_json(model_dir / "vae" / "config.json")
        vae_cfg = (
            registry.vae_config_from_diffusers(vae_json)
            if vae_json
            else registry.SD_VAE_CONFIG
        )
        vae = VAE("kl", weights.load_vae(model_dir / "vae", dtype), vae_cfg)
    text_params = weights.load_text_encoder(model_dir / "text_encoder", dtype)
    ids = jnp.asarray(clip_text.empty_prompt_ids(text_config))
    ctx = clip_text.apply_text_encoder(text_params, ids, text_config)
    return ModelBundle(
        unet_params=unet_params,
        unet_config=unet_config,
        vae=vae,
        text_context=ctx.astype(dtype),
        ddim_config=ddim_config,
    )
