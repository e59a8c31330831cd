"""Checkpoint loading: HF-layout safetensors → NHWC/IO parameter pytrees.

The reference fetches pinned checkpoints from the HF hub at startup
(reference predict.py:478-488, marigold_dc.py:16-18). Here loading is from a
local HF-layout directory (``unet/``, ``vae/``, ``text_encoder/``
subfolders with ``*.safetensors``), converting torch conventions to ours:

- conv kernels  OIHW → HWIO
- linear kernels [out, in] → [in, out]
- norm weight/bias → scale/bias
- 1×1-conv attention projections (old VAE checkpoints) → linear kernels

Key translation is rule-based per model family; unexpected/missing keys
raise, so a checkpoint mismatch fails loudly at load time, not as NaNs
mid-sampling. Sharding-aware placement happens later via device_put with
NamedSharding (weights replicated over data, optionally sharded over model).
"""

from __future__ import annotations

import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _set_path(tree: dict, path: list, value) -> None:
    """Insert ``value`` at a nested path of dict keys / list indices."""
    node = tree
    for i, part in enumerate(path[:-1]):
        nxt = path[i + 1]
        if isinstance(part, int):
            while len(node) <= part:
                node.append([] if isinstance(nxt, int) else {})
            node = node[part]
        else:
            if part not in node:
                node[part] = [] if isinstance(nxt, int) else {}
            node = node[part]
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
        node[last] = value
    else:
        node[last] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # 1x1 conv used as linear (old VAE attention)
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))  # [out,in] → [in,out]


def _norm_name(leaf: str) -> str:
    return {"weight": "scale", "bias": "bias"}[leaf]




def load_safetensors_dir(path: Path) -> dict[str, np.ndarray]:
    """Load and merge every ``*.safetensors`` file under ``path``."""
    from safetensors.numpy import load_file

    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No safetensors files under {path}")
    state: dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(str(f)))
    return state


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _translate_unet_key(key: str) -> tuple[list, str] | None:
    """diffusers UNet2DConditionModel key → (our path, kind).

    kind ∈ {conv, linear, norm}. Returns None for keys we deliberately skip.
    """
    parts = key.split(".")
    leaf = parts[-1]

    def path_of(tokens):
        return [int(t) if t.isdigit() else t for t in tokens]

    k = ".".join(parts[:-1])
    # normalize indexed wrappers
    k = re.sub(r"downsamplers\.0\.conv", "downsampler", k)
    k = re.sub(r"upsamplers\.0\.conv", "upsampler", k)
    k = re.sub(r"to_out\.0", "to_out", k)
    k = re.sub(r"ff\.net\.0\.proj", "ff.proj_in", k)
    k = re.sub(r"ff\.net\.2", "ff.proj_out", k)
    k = re.sub(r"transformer_blocks", "blocks", k)
    tokens = k.split(".")
    path = path_of(tokens) + [leaf]

    name = tokens[-1]
    if name.startswith(("norm", "layer_norm")) or name in (
        "conv_norm_out",
        "group_norm",
    ):
        return path_of(tokens) + [_norm_name(leaf)], "norm"
    if name in ("conv_in", "conv_out", "conv1", "conv2", "conv_shortcut", "downsampler", "upsampler"):
        return path, "conv" if leaf == "weight" else "bias"
    # everything else is linear (time_embedding, attention projections, ff, proj_in/out)
    return path, "linear" if leaf == "weight" else "bias"


def load_unet(path: Path, dtype=jnp.bfloat16) -> dict:
    """Load a diffusers UNet checkpoint directory into our pytree."""
    state = load_safetensors_dir(path)
    return convert_unet_state(state, dtype)


def convert_unet_state(state: dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    tree: dict = {}
    for key, value in state.items():
        out = _translate_unet_key(key)
        if out is None:
            continue
        path, kind = out
        if kind == "conv":
            value = _conv(value)
        elif kind == "linear":
            value = _linear(value)
        if path[-1] == "weight":  # conv/linear weight → kernel
            path[-1] = "kernel"
        _set_path(tree, path, jnp.asarray(value, dtype=dtype))
    return tree


# ---------------------------------------------------------------------------
# KL VAE
# ---------------------------------------------------------------------------

def _translate_vae_key(key: str) -> tuple[list, str]:
    parts = key.split(".")
    leaf = parts[-1]
    k = ".".join(parts[:-1])
    k = re.sub(r"downsamplers\.0\.conv", "downsampler", k)
    k = re.sub(r"upsamplers\.0\.conv", "upsampler", k)
    k = re.sub(r"to_out\.0", "to_out", k)
    # very old checkpoints name VAE attention q/k/v/proj_attn
    k = re.sub(r"\.query$", ".to_q", k)
    k = re.sub(r"\.key$", ".to_k", k)
    k = re.sub(r"\.value$", ".to_v", k)
    k = re.sub(r"\.proj_attn$", ".to_out", k)
    tokens = [int(t) if t.isdigit() else t for t in k.split(".")]
    name = k.split(".")[-1]
    if name.startswith("norm") or name in ("conv_norm_out", "group_norm"):
        return tokens + [_norm_name(leaf)], "norm"
    if name in ("to_q", "to_k", "to_v", "to_out"):
        return tokens + [leaf], "linear" if leaf == "weight" else "bias"
    # all remaining parametric modules in the VAE are convs
    return tokens + [leaf], "conv" if leaf == "weight" else "bias"


def convert_vae_state(state: dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    tree: dict = {}
    for key, value in state.items():
        path, kind = _translate_vae_key(key)
        if kind == "conv":
            value = _conv(value)
        elif kind == "linear":
            value = _linear(value)
        if path[-1] == "weight":
            path[-1] = "kernel"
        _set_path(tree, path, jnp.asarray(value, dtype=dtype))
    return tree


def load_vae(path: Path, dtype=jnp.bfloat16) -> dict:
    return convert_vae_state(load_safetensors_dir(path), dtype)


# ---------------------------------------------------------------------------
# TAESD
# ---------------------------------------------------------------------------

def _taesd_layer_index_maps(encoder_blocks, decoder_blocks):
    """Sequential-index → our-path maps for diffusers AutoencoderTiny."""
    enc: dict[int, list] = {}
    idx = 0
    enc[idx] = ["conv_in"]
    idx += 1
    for i, n in enumerate(encoder_blocks):
        if i > 0:
            enc[idx] = ["stages", i, "down"]
            idx += 1
        for j in range(n):
            enc[idx] = ["stages", i, "blocks", j]
            idx += 1
    enc[idx] = ["conv_out"]

    dec: dict[int, list] = {}
    idx = 0
    dec[idx] = ["conv_in"]
    idx += 1
    idx += 1  # activation (no params)
    for i, n in enumerate(decoder_blocks):
        for j in range(n):
            dec[idx] = ["stages", i, "blocks", j]
            idx += 1
        if i < len(decoder_blocks) - 1:
            idx += 1  # nn.Upsample (no params)
            dec[idx] = ["stages", i, "up_conv"]
            idx += 1
    dec[idx] = ["conv_out"]
    return enc, dec


def convert_taesd_state(
    state: dict[str, np.ndarray],
    encoder_blocks=(1, 3, 3, 3),
    decoder_blocks=(3, 3, 3, 1),
    dtype=jnp.bfloat16,
) -> dict:
    enc_map, dec_map = _taesd_layer_index_maps(encoder_blocks, decoder_blocks)
    conv_names = {"0": "conv1", "2": "conv2", "4": "conv3"}
    tree: dict = {"encoder": {}, "decoder": {}}
    for key, value in state.items():
        parts = key.split(".")
        side, layer_idx = parts[0], int(parts[2])
        idx_map = enc_map if side == "encoder" else dec_map
        base = idx_map[layer_idx]
        rest = parts[3:]
        if rest[0] == "conv":  # AutoencoderTinyBlock: conv.{0,2,4}
            path = base + [conv_names[rest[1]], rest[2]]
        else:  # plain conv layer: weight/bias directly
            path = base + [rest[-1]]
        if path[-1] == "weight":
            path[-1] = "kernel"
            value = _conv(value)
        _set_path(tree[side], path, jnp.asarray(value, dtype=dtype))
    return {"encoder": tree["encoder"], "decoder": tree["decoder"]}


def load_taesd(path: Path, dtype=jnp.bfloat16) -> dict:
    return convert_taesd_state(load_safetensors_dir(path), dtype=dtype)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def convert_text_encoder_state(
    state: dict[str, np.ndarray], dtype=jnp.bfloat16
) -> dict:
    tree: dict = {"layers": []}
    for key, value in state.items():
        if not key.startswith("text_model."):
            continue
        k = key[len("text_model.") :]
        if k == "embeddings.token_embedding.weight":
            tree["token_embedding"] = jnp.asarray(value, dtype=dtype)
        elif k == "embeddings.position_embedding.weight":
            tree["position_embedding"] = jnp.asarray(value, dtype=dtype)
        elif k.startswith("final_layer_norm."):
            leaf = k.split(".")[-1]
            tree.setdefault("final_layer_norm", {})[_norm_name(leaf)] = jnp.asarray(
                value, dtype=dtype
            )
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i = int(parts[2])
            mod, leaf = parts[3], parts[-1]
            if mod == "self_attn":
                name = parts[4]
                value = _linear(value) if leaf == "weight" else value
                _set_path(tree, ["layers", i, name, "kernel" if leaf == "weight" else "bias"], jnp.asarray(value, dtype=dtype))
            elif mod == "mlp":
                name = parts[4]
                value = _linear(value) if leaf == "weight" else value
                _set_path(tree, ["layers", i, name, "kernel" if leaf == "weight" else "bias"], jnp.asarray(value, dtype=dtype))
            elif mod in ("layer_norm1", "layer_norm2"):
                _set_path(tree, ["layers", i, mod, _norm_name(leaf)], jnp.asarray(value, dtype=dtype))
    return tree


def load_text_encoder(path: Path, dtype=jnp.bfloat16) -> dict:
    return convert_text_encoder_state(load_safetensors_dir(path), dtype)


# ---------------------------------------------------------------------------
# Export: our pytrees → diffusers-layout state dicts (the converse of the
# converters above). Used to write HF-layout checkpoints (e.g. the full-size
# synthetic readiness drill, scripts/make_synthetic_checkpoint.py) and to
# hand weights back to torch-side tooling. Round-trip (export → convert)
# is tested bit-exact per family in tests/test_weights.py.
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, prefix + (k,)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_tree(v, prefix + (i,)))
    else:
        out[prefix] = tree
    return out


def _export_leaf(key: str, leaf_name: str, arr: np.ndarray) -> tuple[str, np.ndarray]:
    """Map one of our leaves to (diffusers key, torch-convention array)."""
    if leaf_name == "kernel":
        if arr.ndim == 4:
            return key.replace("kernel", "weight"), np.transpose(arr, (3, 2, 0, 1))
        return key.replace("kernel", "weight"), np.transpose(arr, (1, 0))
    if leaf_name == "scale":  # norm scale
        return key.replace("scale", "weight"), arr
    return key, arr  # bias / embeddings


def to_diffusers_unet_state(tree) -> dict[str, np.ndarray]:
    """Our UNet pytree → diffusers ``UNet2DConditionModel`` state dict."""
    state = {}
    for path, leaf in _flatten_tree(tree).items():
        key = ".".join(str(p) for p in path)
        key = key.replace("downsampler.", "downsamplers.0.conv.")
        key = key.replace("upsampler.", "upsamplers.0.conv.")
        if ".attentions." in key:
            key = key.replace("blocks.", "transformer_blocks.")
        key = key.replace("to_out.", "to_out.0.")
        key = key.replace("ff.proj_in.", "ff.net.0.proj.")
        key = key.replace("ff.proj_out.", "ff.net.2.")
        key, arr = _export_leaf(key, str(path[-1]), np.asarray(leaf))
        state[key] = arr
    return state


def to_diffusers_vae_state(tree) -> dict[str, np.ndarray]:
    """Our KL-VAE pytree → diffusers ``AutoencoderKL`` state dict."""
    state = {}
    for path, leaf in _flatten_tree(tree).items():
        key = ".".join(str(p) for p in path)
        key = key.replace("downsampler.", "downsamplers.0.conv.")
        key = key.replace("upsampler.", "upsamplers.0.conv.")
        key = key.replace("to_out.", "to_out.0.")
        key, arr = _export_leaf(key, str(path[-1]), np.asarray(leaf))
        state[key] = arr
    return state


def to_diffusers_taesd_state(
    tree, encoder_blocks=(1, 3, 3, 3), decoder_blocks=(3, 3, 3, 1)
) -> dict[str, np.ndarray]:
    """Our TAESD pytree → diffusers ``AutoencoderTiny`` state dict."""
    enc_map, dec_map = _taesd_layer_index_maps(encoder_blocks, decoder_blocks)
    rev = {
        side: {tuple(p): i for i, p in m.items()}
        for side, m in (("encoder", enc_map), ("decoder", dec_map))
    }
    conv_pos = {"conv1": "0", "conv2": "2", "conv3": "4"}
    state = {}
    for side in ("encoder", "decoder"):
        for path, leaf in _flatten_tree(tree[side]).items():
            arr = np.asarray(leaf)
            leaf_name = str(path[-1])
            if path[-2] in conv_pos:  # block conv: (base..., convN, leaf)
                base, tail = tuple(path[:-2]), f"conv.{conv_pos[path[-2]]}"
            else:  # plain layer: (base..., leaf)
                base, tail = tuple(path[:-1]), None
            idx = rev[side][base]
            name = "weight" if leaf_name == "kernel" else leaf_name
            if leaf_name == "kernel":
                arr = np.transpose(arr, (3, 2, 0, 1))
            key = f"{side}.layers.{idx}." + (f"{tail}.{name}" if tail else name)
            state[key] = arr
    return state


def to_transformers_text_encoder_state(tree) -> dict[str, np.ndarray]:
    """Our CLIP text pytree → transformers ``CLIPTextModel`` state dict."""
    mod_of = {
        "q_proj": "self_attn", "k_proj": "self_attn", "v_proj": "self_attn",
        "out_proj": "self_attn", "fc1": "mlp", "fc2": "mlp",
    }
    state = {
        "text_model.embeddings.token_embedding.weight": np.asarray(
            tree["token_embedding"]
        ),
        "text_model.embeddings.position_embedding.weight": np.asarray(
            tree["position_embedding"]
        ),
        "text_model.final_layer_norm.weight": np.asarray(
            tree["final_layer_norm"]["scale"]
        ),
        "text_model.final_layer_norm.bias": np.asarray(
            tree["final_layer_norm"]["bias"]
        ),
    }
    for i, layer in enumerate(tree["layers"]):
        base = f"text_model.encoder.layers.{i}"
        for name, leaves in layer.items():
            if name in mod_of:
                w = np.asarray(leaves["kernel"])
                state[f"{base}.{mod_of[name]}.{name}.weight"] = np.transpose(w, (1, 0))
                state[f"{base}.{mod_of[name]}.{name}.bias"] = np.asarray(leaves["bias"])
            else:  # layer_norm1 / layer_norm2
                state[f"{base}.{name}.weight"] = np.asarray(leaves["scale"])
                state[f"{base}.{name}.bias"] = np.asarray(leaves["bias"])
    return state
