"""CLIP text encoder (OpenCLIP-ViT/H tower used by SD2/Marigold).

The reference instantiates the full ``CLIPTextModel`` + tokenizer but only
ever embeds the empty prompt once and caches it
(reference marigold_dc.py:663-674). We implement the tower generically (any
prompt) and additionally expose ``empty_prompt_ids`` — with the reference's
``padding="do_not_pad"`` the empty prompt is just [BOS, EOS], so the cached
context is a [1, 2, hidden] tensor.

Standard pre-LN transformer with causal masking and a final LayerNorm; the
reference consumes the last hidden state (output[0]), not the pooled output.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.models.layers import layer_norm, linear, linear_init, norm_init
from depth_completion_tpu.models.registry import CLIPTextConfig


def empty_prompt_ids(config: CLIPTextConfig) -> np.ndarray:
    """Token ids of "" with do_not_pad: [BOS, EOS]."""
    return np.asarray([[config.bos_token_id, config.eos_token_id]], dtype=np.int32)


def init_text_encoder(key, config: CLIPTextConfig, dtype=jnp.float32):
    cfg = config
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    params: dict = {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.hidden_size), dtype
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (cfg.max_position_embeddings, cfg.hidden_size), dtype
        )
        * 0.01,
        "layers": [],
        "final_layer_norm": norm_init(cfg.hidden_size, dtype),
    }
    for _ in range(cfg.num_layers):
        ks = jax.random.split(next(keys), 6)
        params["layers"].append(
            {
                "layer_norm1": norm_init(cfg.hidden_size, dtype),
                "q_proj": linear_init(ks[0], cfg.hidden_size, cfg.hidden_size, dtype),
                "k_proj": linear_init(ks[1], cfg.hidden_size, cfg.hidden_size, dtype),
                "v_proj": linear_init(ks[2], cfg.hidden_size, cfg.hidden_size, dtype),
                "out_proj": linear_init(ks[3], cfg.hidden_size, cfg.hidden_size, dtype),
                "layer_norm2": norm_init(cfg.hidden_size, dtype),
                "fc1": linear_init(ks[4], cfg.hidden_size, cfg.intermediate_size, dtype),
                "fc2": linear_init(ks[5], cfg.intermediate_size, cfg.hidden_size, dtype),
            }
        )
    return params


def _act(x, kind: str):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation: {kind}")


def apply_text_encoder(
    params, input_ids: jnp.ndarray, config: CLIPTextConfig
) -> jnp.ndarray:
    """[N, S] token ids → [N, S, hidden] last hidden state."""
    cfg = config
    n, s = input_ids.shape
    h = params["token_embedding"][input_ids] + params["position_embedding"][None, :s]
    # causal mask
    mask = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
    scale = 1.0 / math.sqrt(cfg.hidden_size // cfg.num_heads)
    hd = cfg.hidden_size // cfg.num_heads

    for layer in params["layers"]:
        residual = h
        x = layer_norm(layer["layer_norm1"], h, eps=cfg.layer_norm_eps)
        q = linear(layer["q_proj"], x).reshape(n, s, cfg.num_heads, hd)
        k = linear(layer["k_proj"], x).reshape(n, s, cfg.num_heads, hd)
        v = linear(layer["v_proj"], x).reshape(n, s, cfg.num_heads, hd)
        logits = (
            jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        probs = jax.nn.softmax(logits + mask[None, None], axis=-1).astype(h.dtype)
        attn = jnp.einsum(
            "nhqk,nkhd->nqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(h.dtype)
        h = residual + linear(layer["out_proj"], attn.reshape(n, s, cfg.hidden_size))
        residual = h
        x = layer_norm(layer["layer_norm2"], h, eps=cfg.layer_norm_eps)
        h = residual + linear(layer["fc2"], _act(linear(layer["fc1"], x), cfg.hidden_act))

    return layer_norm(params["final_layer_norm"], h, eps=cfg.layer_norm_eps)
