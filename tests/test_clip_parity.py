"""CLIP text tower parity vs transformers' CLIPTextModel (same weights).

transformers (but not diffusers) is available in this environment, so the
text encoder gets a true end-to-end parity check: random-init a torch
CLIPTextModel at a tiny config, convert its state dict with our loader, and
compare hidden states on the same token ids.
"""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")

from depth_completion_tpu.models.clip_text import apply_text_encoder  # noqa: E402
from depth_completion_tpu.models.registry import CLIPTextConfig  # noqa: E402
from depth_completion_tpu.models.weights import (  # noqa: E402
    convert_text_encoder_state,
)


def _tiny_torch_clip():
    cfg = transformers.CLIPTextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="gelu",
    )
    import torch

    torch.manual_seed(0)
    model = transformers.CLIPTextModel(cfg)
    model.eval()
    return model, cfg


def test_text_encoder_matches_transformers():
    import torch

    model, tcfg = _tiny_torch_clip()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    tree = convert_text_encoder_state(state, dtype=jnp.float32)
    ours_cfg = CLIPTextConfig(
        vocab_size=tcfg.vocab_size,
        hidden_size=tcfg.hidden_size,
        num_layers=tcfg.num_hidden_layers,
        num_heads=tcfg.num_attention_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        hidden_act="gelu",
    )
    ids = np.asarray([[5, 17, 99, 3]], dtype=np.int32)
    ours = np.asarray(apply_text_encoder(tree, jnp.asarray(ids), ours_cfg))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long())[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
