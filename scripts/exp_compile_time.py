"""Cold-start anatomy: where does the sampler's compile time go?

VERDICT r3 #7: the KITTI config pays ~507 s compile + first frame cold.
This experiment splits the cost into its stages and A/Bs the levers XLA
actually exposes:

  stage split:   trace+lower (host Python/StableHLO) vs backend compile
                 vs first execution
  levers:        xla exec_time_optimization_effort (compile-speed knob),
                 scan unrolling (control: should be 1 body compile),
                 Pallas kernel count (flash on/off)

Run on TPU:  PYTHONPATH=.:/root/.axon_site python scripts/exp_compile_time.py
Env: ECT_RES (default 768), ECT_HW (default 480x640), ECT_BATCH (1),
ECT_STEPS (50), ECT_EFFORTS (comma floats, default "0,-1").

NOTE: uses a FRESH compilation-cache dir per variant so every number is a
true cold compile (the persistent cache would otherwise hide everything).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

# fresh cache root: every variant below gets its own subdir
_CACHE_ROOT = tempfile.mkdtemp(prefix="dct_ect_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(_CACHE_ROOT, "init")

import numpy as np

RES = int(os.environ.get("ECT_RES", "768"))
H, W = (int(x) for x in os.environ.get("ECT_HW", "480x640").split("x"))
BATCH = int(os.environ.get("ECT_BATCH", "1"))
STEPS = int(os.environ.get("ECT_STEPS", "50"))
EFFORTS = [
    float(x) for x in os.environ.get("ECT_EFFORTS", "0,-1").split(",")
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, size=(BATCH, H, W, 3)).astype(np.float32)
    )
    sparse_np = np.zeros((BATCH, H, W, 1), np.float32)
    idx = rng.choice(H * W, size=500, replace=False)
    f = sparse_np.reshape(BATCH, -1)
    f[:, idx] = rng.uniform(2.0, 80.0, 500)
    sparse = jnp.asarray(f.reshape(BATCH, H, W, 1))

    base_cfg = SamplerConfig(
        steps=STEPS, resolution=RES, train_latents=True,
        train_method="per-step", closed_form=False,
        loss_funcs=("l1", "l2"), norm="const", max_depth=120.0,
    )

    def run_variant(tag: str, cfg, compiler_options=None) -> dict:
        # fresh cache dir => true cold compile for this variant
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(_CACHE_ROOT, tag.replace(" ", "_")),
        )
        jax.clear_caches()
        fn = jax.jit(
            guided_sample,
            static_argnames=("cfg",),
            compiler_options=compiler_options,
        )
        t0 = time.time()
        lowered = fn.lower(bundle, images, sparse, cfg)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        out, _ = compiled(bundle, images, sparse)
        float(jnp.sum(out))
        t_first = time.time() - t0
        t0 = time.time()
        out, _ = compiled(bundle, images, sparse)
        float(jnp.sum(out))
        t_steady = time.time() - t0
        row = {
            "variant": tag,
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "first_exec_s": round(t_first, 1),
            "steady_s": round(t_steady, 2),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    for effort in EFFORTS:
        opts = (
            {"exec_time_optimization_effort": effort} if effort != 0 else None
        )
        try:
            rows.append(
                run_variant(f"effort={effort}", base_cfg, compiler_options=opts)
            )
        except Exception as exc:
            print(json.dumps({"variant": f"effort={effort}",
                              "error": f"{type(exc).__name__}: {exc}"}))
    # Pallas-kernel share of compile: XLA attention instead of flash
    import dataclasses

    rows.append(
        run_variant(
            "flash=off",
            dataclasses.replace(base_cfg, flash_attention="off"),
        )
    )
    # steps scaling (scan body compiles once — 10-step compile should be
    # ~= 50-step compile if that's true)
    rows.append(
        run_variant("steps=10", dataclasses.replace(base_cfg, steps=10))
    )
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
