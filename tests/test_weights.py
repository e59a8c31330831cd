"""Checkpoint converters: synthetic diffusers-style state dicts → our trees.

Builds torch-convention state dicts (OIHW convs, [out,in] linears, diffusers
key names) for the tiny configs, converts, and checks the resulting pytrees
run through the models — validating the key translation and transposes
without needing real checkpoints (no network egress).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depth_completion_tpu.models import registry, vae_kl, vae_tiny, weights
from depth_completion_tpu.models.clip_text import apply_text_encoder
from depth_completion_tpu.models.unet import apply_unet, init_unet


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + (i,)))
    else:
        out[prefix] = tree
    return out


def _synthetic_unet_state(cfg):
    """Random torch-style state dict keyed like diffusers UNet2DConditionModel."""
    rng = np.random.default_rng(0)
    ours = init_unet(jax.random.PRNGKey(0), cfg)
    state = {}

    def conv_w(x):
        return np.transpose(np.asarray(x), (3, 2, 0, 1))  # HWIO → OIHW

    def lin_w(x):
        return np.transpose(np.asarray(x), (1, 0))

    for path, leaf in _flatten(ours).items():
        # rebuild the diffusers key from our path
        parts = []
        for p in path:
            parts.append(str(p))
        key = ".".join(parts)
        key = key.replace("downsampler.", "downsamplers.0.conv.")
        key = key.replace("upsampler.", "upsamplers.0.conv.")
        key = key.replace("blocks.", "transformer_blocks.") if ".attentions." in key else key
        key = key.replace("to_out.", "to_out.0.")
        key = key.replace("ff.proj_in.", "ff.net.0.proj.")
        key = key.replace("ff.proj_out.", "ff.net.2.")
        leaf_name = path[-1]
        arr = rng.normal(size=np.asarray(leaf).shape).astype(np.float32)
        if leaf_name == "kernel":
            if np.asarray(leaf).ndim == 4:
                state[key.replace("kernel", "weight")] = conv_w(arr)
            else:
                state[key.replace("kernel", "weight")] = lin_w(arr)
        elif leaf_name == "scale":
            state[key.replace("scale", "weight")] = arr
        else:
            state[key] = arr
    return state, ours


def test_unet_state_roundtrip():
    cfg = registry.TINY_UNET_CONFIG
    state, ours = _synthetic_unet_state(cfg)
    tree = weights.convert_unet_state(state, dtype=jnp.float32)
    # identical structure
    ref_paths = set(_flatten(ours))
    got_paths = set(_flatten(tree))
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:5]} "
        f"extra: {sorted(got_paths - ref_paths)[:5]}"
    )
    # identical shapes + runs
    for p in ref_paths:
        assert _flatten(ours)[p].shape == _flatten(tree)[p].shape, p
    out = apply_unet(
        tree,
        jnp.zeros((1, 16, 16, cfg.in_channels)),
        jnp.asarray(10),
        jnp.zeros((1, 2, cfg.cross_attention_dim)),
        cfg,
    )
    assert out.shape == (1, 16, 16, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_conv_transpose_is_correct():
    """A known conv weight must land transposed, not just reshaped."""
    cfg = registry.TINY_UNET_CONFIG
    state, _ = _synthetic_unet_state(cfg)
    w = state["conv_in.weight"]  # OIHW
    tree = weights.convert_unet_state(state, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(tree["conv_in"]["kernel"]), np.transpose(w, (2, 3, 1, 0))
    )


def _synthetic_taesd_state(cfg):
    rng = np.random.default_rng(1)
    c, lc = cfg.channels, cfg.latent_channels

    def conv(cin, cout):
        return rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)

    state = {}

    def add_block(side, idx, ch):
        for j, name in ((0, "0"), (1, "2"), (2, "4")):
            state[f"{side}.layers.{idx}.conv.{name}.weight"] = conv(ch, ch)
            state[f"{side}.layers.{idx}.conv.{name}.bias"] = rng.normal(size=(ch,)).astype(np.float32)

    # encoder: conv_in, per stage [down?, blocks...], conv_out
    idx = 0
    state[f"encoder.layers.{idx}.weight"] = conv(3, c)
    state[f"encoder.layers.{idx}.bias"] = rng.normal(size=(c,)).astype(np.float32)
    idx += 1
    for i, n in enumerate(cfg.encoder_blocks):
        if i > 0:
            state[f"encoder.layers.{idx}.weight"] = conv(c, c)
            idx += 1
        for _ in range(n):
            add_block("encoder", idx, c)
            idx += 1
    state[f"encoder.layers.{idx}.weight"] = conv(c, lc)
    state[f"encoder.layers.{idx}.bias"] = rng.normal(size=(lc,)).astype(np.float32)

    # decoder: conv_in, relu, per stage [blocks..., up?, conv], conv_out
    idx = 0
    state[f"decoder.layers.{idx}.weight"] = conv(lc, c)
    state[f"decoder.layers.{idx}.bias"] = rng.normal(size=(c,)).astype(np.float32)
    idx += 2  # skip activation
    for i, n in enumerate(cfg.decoder_blocks):
        for _ in range(n):
            add_block("decoder", idx, c)
            idx += 1
        if i < len(cfg.decoder_blocks) - 1:
            idx += 1  # nn.Upsample
            state[f"decoder.layers.{idx}.weight"] = conv(c, c)
            idx += 1
    state[f"decoder.layers.{idx}.weight"] = conv(c, 3)
    state[f"decoder.layers.{idx}.bias"] = rng.normal(size=(3,)).astype(np.float32)
    return state


def test_taesd_state_roundtrip():
    cfg = registry.TINY_TAESD_CONFIG
    state = _synthetic_taesd_state(cfg)
    tree = weights.convert_taesd_state(
        state,
        encoder_blocks=cfg.encoder_blocks,
        decoder_blocks=cfg.decoder_blocks,
        dtype=jnp.float32,
    )
    img = jnp.zeros((1, 16, 16, 3))
    lat = vae_tiny.encode(tree, img, cfg)
    rec = vae_tiny.decode(tree, lat, cfg)
    assert rec.shape == img.shape
    assert np.isfinite(np.asarray(rec)).all()


def _synthetic_vae_state(cfg):
    """Build torch-style keys from our randomly-initialized tree structure."""
    ours = vae_kl.init_vae(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    state = {}
    for path, leaf in _flatten(ours).items():
        key = ".".join(str(p) for p in path)
        key = key.replace("downsampler.", "downsamplers.0.conv.")
        key = key.replace("upsampler.", "upsamplers.0.conv.")
        key = key.replace("to_out.", "to_out.0.")
        arr = rng.normal(size=np.asarray(leaf).shape).astype(np.float32)
        leaf_name = path[-1]
        if leaf_name == "kernel":
            if np.asarray(leaf).ndim == 4:
                state[key.replace("kernel", "weight")] = np.transpose(arr, (3, 2, 0, 1))
            else:
                state[key.replace("kernel", "weight")] = np.transpose(arr, (1, 0))
        elif leaf_name == "scale":
            state[key.replace("scale", "weight")] = arr
        else:
            state[key] = arr
    return state, ours


def test_vae_state_roundtrip():
    cfg = registry.TINY_VAE_CONFIG
    state, ours = _synthetic_vae_state(cfg)
    tree = weights.convert_vae_state(state, dtype=jnp.float32)
    assert set(_flatten(ours)) == set(_flatten(tree))
    img = jnp.zeros((1, 16, 16, 3))
    lat = vae_kl.encode(tree, img, cfg)
    rec = vae_kl.decode(tree, lat, cfg)
    assert rec.shape == img.shape


def test_text_encoder_state_roundtrip():
    cfg = registry.TINY_TEXT_CONFIG
    rng = np.random.default_rng(3)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    state = {
        "text_model.embeddings.token_embedding.weight": rng.normal(
            size=(cfg.vocab_size, h)
        ).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": rng.normal(
            size=(cfg.max_position_embeddings, h)
        ).astype(np.float32),
        "text_model.final_layer_norm.weight": np.ones(h, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(h, np.float32),
    }
    for i in range(cfg.num_layers):
        base = f"text_model.encoder.layers.{i}"
        for name, shape in (
            ("self_attn.q_proj", (h, h)),
            ("self_attn.k_proj", (h, h)),
            ("self_attn.v_proj", (h, h)),
            ("self_attn.out_proj", (h, h)),
            ("mlp.fc1", (inter, h)),
            ("mlp.fc2", (h, inter)),
        ):
            state[f"{base}.{name}.weight"] = rng.normal(size=shape).astype(np.float32)
            state[f"{base}.{name}.bias"] = np.zeros(shape[0], np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            state[f"{base}.{ln}.weight"] = np.ones(h, np.float32)
            state[f"{base}.{ln}.bias"] = np.zeros(h, np.float32)
    tree = weights.convert_text_encoder_state(state, dtype=jnp.float32)
    ids = jnp.asarray([[1, 2]])
    out = apply_text_encoder(tree, ids, cfg)
    assert out.shape == (1, 2, h)
    assert np.isfinite(np.asarray(out)).all()


def _assert_trees_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb), (
        f"missing: {sorted(set(fa) - set(fb))[:5]} "
        f"extra: {sorted(set(fb) - set(fa))[:5]}"
    )
    for p in fa:
        np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fb[p]), err_msg=str(p))


def test_unet_export_convert_roundtrip():
    """Exporter inverse: our tree → diffusers state → our tree, bit-exact.
    This is what makes the full-size synthetic checkpoint drill
    (scripts/make_synthetic_checkpoint.py) a faithful stand-in for the
    real HF layout."""
    cfg = registry.TINY_UNET_CONFIG
    ours = init_unet(jax.random.PRNGKey(1), cfg)
    state = weights.to_diffusers_unet_state(ours)
    # keys look like diffusers keys (spot checks)
    assert "conv_in.weight" in state
    assert any("transformer_blocks.0.attn1.to_out.0.weight" in k for k in state)
    back = weights.convert_unet_state(state, dtype=jnp.float32)
    _assert_trees_equal(ours, back)


def test_vae_export_convert_roundtrip():
    cfg = registry.TINY_VAE_CONFIG
    ours = vae_kl.init_vae(jax.random.PRNGKey(2), cfg)
    back = weights.convert_vae_state(
        weights.to_diffusers_vae_state(ours), dtype=jnp.float32
    )
    _assert_trees_equal(ours, back)


def test_taesd_export_convert_roundtrip():
    cfg = registry.TINY_TAESD_CONFIG
    ours = vae_tiny.init_taesd(jax.random.PRNGKey(3), cfg)
    state = weights.to_diffusers_taesd_state(
        ours, encoder_blocks=cfg.encoder_blocks, decoder_blocks=cfg.decoder_blocks
    )
    assert "encoder.layers.0.weight" in state
    back = weights.convert_taesd_state(
        state,
        encoder_blocks=cfg.encoder_blocks,
        decoder_blocks=cfg.decoder_blocks,
        dtype=jnp.float32,
    )
    _assert_trees_equal(ours, back)


def test_text_encoder_export_convert_roundtrip():
    from depth_completion_tpu.models.clip_text import init_text_encoder

    cfg = registry.TINY_TEXT_CONFIG
    ours = init_text_encoder(jax.random.PRNGKey(4), cfg)
    state = weights.to_transformers_text_encoder_state(ours)
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in state
    back = weights.convert_text_encoder_state(state, dtype=jnp.float32)
    _assert_trees_equal(ours, back)


def test_text_encoder_export_matches_real_transformers_inventory():
    """The exporter's key inventory must equal the REAL transformers
    CLIPTextModel state dict for the same geometry — an independent check
    of the text-tower layout (transformers is the reference's own dep,
    reference requirements.txt:6)."""
    pytest.importorskip("transformers")
    import transformers

    cfg = registry.TINY_TEXT_CONFIG
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    hf_keys = {
        k for k in transformers.CLIPTextModel(hf_cfg).state_dict()
        if not k.endswith("position_ids")  # buffer, not a parameter
    }
    from depth_completion_tpu.models.clip_text import init_text_encoder

    ours = weights.to_transformers_text_encoder_state(
        init_text_encoder(jax.random.PRNGKey(0), cfg)
    )
    assert set(ours) == hf_keys, (
        f"missing: {sorted(hf_keys - set(ours))[:5]} "
        f"extra: {sorted(set(ours) - hf_keys)[:5]}"
    )


def test_safetensors_file_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    cfg = registry.TINY_TAESD_CONFIG
    state = _synthetic_taesd_state(cfg)
    save_file(state, str(tmp_path / "model.safetensors"))
    loaded = weights.load_safetensors_dir(tmp_path)
    assert set(loaded) == set(state)
    with pytest.raises(FileNotFoundError):
        weights.load_safetensors_dir(tmp_path / "missing")


def test_load_bundle_from_exported_checkpoint_dir(tmp_path):
    """Directory-level load path (the synthetic-checkpoint drill at tiny
    scale): write a full HF-layout checkpoint via the exporters + config
    JSONs, load_bundle it, and run one guided step. Covers the config
    readers (unet/vae/text/scheduler JSON), the safetensors merge, and the
    converter wiring that scripts/make_synthetic_checkpoint.py relies on."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from depth_completion_tpu.models import vae_kl
    from depth_completion_tpu.models.bundle import load_bundle
    from depth_completion_tpu.models.clip_text import init_text_encoder
    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    ucfg, vcfg, tcfg = (
        registry.TINY_UNET_CONFIG, registry.TINY_VAE_CONFIG,
        registry.TINY_TEXT_CONFIG,
    )
    root = tmp_path / "ckpt"
    (root / "unet").mkdir(parents=True)
    (root / "vae").mkdir()
    (root / "text_encoder").mkdir()
    (root / "scheduler").mkdir()

    def f16(state):
        return {k: np.asarray(v, np.float16) for k, v in state.items()}

    save_file(
        f16(weights.to_diffusers_unet_state(init_unet(jax.random.PRNGKey(0), ucfg))),
        str(root / "unet" / "diffusion_pytorch_model.safetensors"),
    )
    (root / "unet" / "config.json").write_text(json.dumps({
        "block_out_channels": list(ucfg.block_out_channels),
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "attention_head_dim": list(ucfg.num_heads),
        "in_channels": ucfg.in_channels,
        "out_channels": ucfg.out_channels,
        "layers_per_block": ucfg.layers_per_block,
        "cross_attention_dim": ucfg.cross_attention_dim,
        "norm_num_groups": ucfg.norm_groups,
    }))
    save_file(
        f16(weights.to_diffusers_vae_state(vae_kl.init_vae(jax.random.PRNGKey(1), vcfg))),
        str(root / "vae" / "diffusion_pytorch_model.safetensors"),
    )
    (root / "vae" / "config.json").write_text(json.dumps({
        "block_out_channels": list(vcfg.block_out_channels),
        "layers_per_block": vcfg.layers_per_block,
        "norm_num_groups": vcfg.norm_groups,
        "latent_channels": vcfg.latent_channels,
    }))
    save_file(
        f16(weights.to_transformers_text_encoder_state(
            init_text_encoder(jax.random.PRNGKey(2), tcfg))),
        str(root / "text_encoder" / "model.safetensors"),
    )
    (root / "text_encoder" / "config.json").write_text(json.dumps({
        "vocab_size": tcfg.vocab_size,
        "hidden_size": tcfg.hidden_size,
        "num_hidden_layers": tcfg.num_layers,
        "num_attention_heads": tcfg.num_heads,
        "intermediate_size": tcfg.intermediate_size,
    }))
    (root / "scheduler" / "scheduler_config.json").write_text(json.dumps({
        "prediction_type": "v_prediction",
        "beta_schedule": "scaled_linear",
        "clip_sample": False,
    }))

    bundle = load_bundle(root, vae_kind="kl", dtype=jnp.float32)
    assert bundle.unet_config == registry.unet_config_from_diffusers(
        json.loads((root / "unet" / "config.json").read_text())
    )
    assert bundle.ddim_config is not None
    assert bundle.ddim_config.prediction_type == "v_prediction"
    # the cross-attention context width matches the tiny tower
    assert bundle.text_context.shape == (1, 2, tcfg.hidden_size)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(1, 32, 48, 3)).astype(np.float32)
    sp = np.zeros((1, 32, 48, 1), np.float32)
    sp[0, ::8, ::8, 0] = rng.uniform(2.0, 80.0, sp[0, ::8, ::8, 0].shape)
    denses, _ = DepthCompletionPipeline(bundle)(
        img, sp, max_depth=120.0, steps=2, resolution=32
    )
    assert np.isfinite(np.asarray(denses)).all()
