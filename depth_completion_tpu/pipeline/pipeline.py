"""Public pipeline API — the `MarigoldDepthCompletionPipeline` equivalent.

Host-side wrapper around the jitted `guided_sample`: input validation
(reference marigold_dc.py:583-656), layout conversion, compile caching (one
XLA program per (geometry, batch, config) signature), and the temporal latent
carry for video (reference marigold_dc.py:699-704, predict.py:697-699).

API deviation from the reference: arrays are NHWC (TPU layout), inputs may be
numpy or jax arrays, and outputs are jax arrays left on device (callers pull
them host-side when saving). A `from_nchw` helper eases porting.
"""

from __future__ import annotations

import dataclasses
import threading
from collections import OrderedDict
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.models.bundle import ModelBundle
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

_jitted_sample = jax.jit(guided_sample, static_argnames=("cfg",))


def _ensemble(
    bundle, images, sparses, cfg, ensemble_size, reduce, mesh, uncertainty
):
    from depth_completion_tpu.parallel.ensemble import ensemble_sample

    return ensemble_sample(
        bundle,
        images,
        sparses,
        cfg,
        ensemble_size,
        reduce,
        mesh=mesh,
        return_uncertainty=uncertainty,
    )


_jitted_ensemble = jax.jit(
    _ensemble,
    static_argnames=("cfg", "ensemble_size", "reduce", "mesh", "uncertainty"),
)


def from_nchw(x: np.ndarray | jnp.ndarray) -> np.ndarray | jnp.ndarray:
    """[N,C,H,W] → [N,H,W,C] convenience for reference-style callers."""
    return jnp.transpose(x, (0, 2, 3, 1)) if isinstance(x, jnp.ndarray) else np.transpose(x, (0, 2, 3, 1))


class DepthCompletionPipeline:
    """Sparse→dense guided-diffusion depth completion.

    Usage:
        pipe = DepthCompletionPipeline(bundle)
        denses, latents = pipe(images, sparses, max_depth=120.0, steps=50)

    ``images``: [N,H,W,3] raw RGB (0..255); ``sparses``: [N,H,W,1] metric
    depth with 0 at missing points. Returns metric [N,H,W,1] dense depth and
    the final latents for temporal carry.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        max_programs: int | None = None,
        compiler_options: dict | None = None,
    ):
        """``max_programs``: bound the number of live compiled programs.

        Default (None) shares the module-level jit wrappers — programs for
        every (geometry, batch, config) signature stay cached for the
        process lifetime, which is right for batch jobs. A long-running
        server over a mixed-geometry stream instead passes a bound: each
        signature gets a PRIVATE jit wrapper held in an LRU dict, so
        evicting the least-recently-used wrapper frees its compiled
        executable (and the device memory the program text occupies).
        The LRU bookkeeping is lock-guarded so concurrent warmup threads
        (serving/engine.py warmup(parallel=N)) stay correct; steady-state
        traffic still flows through the engine's single dispatch thread.

        ``compiler_options``: XLA options applied to every program this
        pipeline compiles — e.g. ``{"exec_time_optimization_effort": -1.0}``
        trades ~1.9× slower steps for ~5× faster cold compile (measured on
        v5e, PERF.md round-4), which is the serving tier-0 warmup program.
        Setting this forces private per-signature jit wrappers (the
        module-level shared wrappers are default-options only).
        """
        self.bundle = bundle
        self.max_programs = max_programs
        self.compiler_options = dict(compiler_options) if compiler_options else None
        self._programs: "OrderedDict[tuple, Any]" = OrderedDict()
        self._programs_lock = threading.Lock()

    def program_keys(self) -> list[tuple]:
        """Live private-program signatures, oldest first (diagnostics)."""
        with self._programs_lock:
            return list(self._programs)

    def _lru_program(self, key: tuple, make):
        with self._programs_lock:
            fn = self._programs.get(key)
            if fn is None:
                fn = make()
                self._programs[key] = fn
                if self.max_programs is not None:
                    while len(self._programs) > self.max_programs:
                        # executable freed w/ wrapper
                        self._programs.popitem(last=False)
            else:
                self._programs.move_to_end(key)
            return fn

    @property
    def _private_programs(self) -> bool:
        """Private per-signature jit wrappers are needed when programs must
        be individually evictable (max_programs) or compiled with
        non-default XLA options (compiler_options)."""
        return self.max_programs is not None or self.compiler_options is not None

    def __call__(
        self,
        images: Any,
        sparses: Any,
        max_depth: float,
        min_depth: float = 0.0,
        pred_latents_prev: Any | None = None,
        **config_overrides: Any,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        images = jnp.asarray(images)
        sparses = jnp.asarray(sparses)
        if sparses.ndim == 3:
            sparses = sparses[..., None]
        if (
            images.ndim != 4
            or sparses.ndim != 4
            or images.shape[0] != sparses.shape[0]
            or images.shape[1:3] != sparses.shape[1:3]
            or sparses.shape[-1] != 1
        ):
            raise ValueError(
                "images must be [N,H,W,C] and sparses [N,H,W,1] with matching "
                f"batch and spatial dims, got {images.shape} / {sparses.shape}"
            )

        # Empty-sparse-frame contract (reference utils.py:132-136): a frame
        # with zero valid sparse points would flow ±inf through range
        # estimation; the reference's masked_minmax raises a clear ValueError.
        # One cheap host-side reduction per batch, outside the jitted program.
        # Pure numpy on the host copy: under a multi-process runtime, eager
        # jnp ops dispatch to the global default device (non-addressable on
        # secondary processes), so device reductions cannot be fetched here.
        if not isinstance(sparses, jax.Array) or sparses.is_fully_addressable:
            rows_valid = (np.asarray(sparses) > 0).any(axis=(1, 2, 3))
        else:
            # globally-sharded input: gather the per-row validity bits
            from jax.experimental import multihost_utils

            rows_valid = np.asarray(
                multihost_utils.process_allgather(
                    jnp.any(sparses > 0, axis=(1, 2, 3)), tiled=True
                )
            ).reshape(-1)[: sparses.shape[0]]
        if not rows_valid.all():
            raise ValueError(
                "No valid values found in mask for some positions. Ensure "
                "that mask has at least one True value along the specified "
                f"dimensions. (sparse frames {np.flatnonzero(~rows_valid).tolist()} "
                "have no points > 0)"
            )

        loss_funcs = config_overrides.pop("loss_funcs", None)
        if loss_funcs is not None:
            config_overrides["loss_funcs"] = tuple(loss_funcs)
        percentile = config_overrides.pop("percentile", None)
        if percentile is not None:
            config_overrides["percentile"] = tuple(percentile)
        lr = config_overrides.pop("lr", None)
        if lr is not None:
            config_overrides["lr_latent"], config_overrides["lr_scaling"] = lr
        ensemble_size = int(config_overrides.pop("ensemble_size", 1))
        ensemble_reduce = config_overrides.pop("ensemble_reduce", "median")
        ensemble_mesh = config_overrides.pop("ensemble_mesh", None)
        ensemble_uncertainty = bool(
            config_overrides.pop("ensemble_uncertainty", False)
        )
        # schedule from the checkpoint unless explicitly overridden
        if "ddim" not in config_overrides and self.bundle.ddim_config is not None:
            config_overrides["ddim"] = self.bundle.ddim_config

        cfg = SamplerConfig(
            min_depth=min_depth, max_depth=max_depth, **config_overrides
        )
        cfg.validate()

        # Degenerate-range guard (host-side, like the empty-sparse check
        # above): under minmax/percentile normalization a frame whose valid
        # sparse points all share one value (or whose estimated range
        # collapses after clamping into [min_depth, max_depth]) makes the
        # normalizer divide by (max-min)=0 — the reference NaNs silently
        # there (marigold_dc.py:739-756); we fail loudly instead
        # (documented deviation, PARITY.md). Found by the full-size
        # synthetic checkpoint drill (scripts/make_synthetic_checkpoint.py).
        if cfg.norm in ("minmax", "percentile") and (
            not isinstance(sparses, jax.Array) or sparses.is_fully_addressable
        ):
            sp_np = np.asarray(sparses)
            for i in range(sp_np.shape[0]):
                vals = sp_np[i][sp_np[i] > 0]
                if cfg.norm == "minmax":
                    lo, hi = float(vals.min()), float(vals.max())
                else:
                    lo, hi = (float(q) for q in np.quantile(vals, cfg.percentile))
                lo, hi = max(lo, cfg.min_depth), min(hi, cfg.max_depth)
                if not hi > lo:
                    raise ValueError(
                        f"Degenerate sparse depth range for frame {i}: "
                        f"norm={cfg.norm!r} estimated [{lo}, {hi}] "
                        "(all valid points share one value, or the range "
                        "collapses after clamping to "
                        f"[{cfg.min_depth}, {cfg.max_depth}]). Use "
                        "norm='const' or provide varied sparse points."
                    )

        if pred_latents_prev is not None:
            pred_latents_prev = jnp.asarray(pred_latents_prev)
            from depth_completion_tpu.ops.resize import latent_size

            eh, ew = latent_size(
                (int(images.shape[1]), int(images.shape[2])),
                cfg.resolution,
                self.bundle.vae.downsample_factor,
            )
            # channel count from the bundle's VAE, not the SD constant 4 —
            # keeps the serving warmup's bundle-derived carry signature
            # admissible for VAEs with a different latent width
            channels = getattr(
                self.bundle.vae.config, "latent_channels", 4
            )
            expected = (images.shape[0], eh, ew, channels)
            if tuple(pred_latents_prev.shape) != expected:
                # reference marigold_dc.py:598-603 (with the corrected true
                # latent geometry, see ops/resize.py:latent_size)
                raise ValueError(
                    f"Shape of pred_latents_prev must be {expected}, but got "
                    f"{tuple(pred_latents_prev.shape)}"
                )

        if ensemble_size > 1:
            if pred_latents_prev is not None:
                raise ValueError(
                    "temporal latent carry is not supported with ensembling"
                )
            ens_fn = _jitted_ensemble
            if self._private_programs:
                key = (
                    "ensemble", tuple(images.shape), cfg,
                    ensemble_size, ensemble_reduce, ensemble_mesh,
                    ensemble_uncertainty,
                )
                ens_fn = self._lru_program(
                    key,
                    lambda: jax.jit(
                        _ensemble,
                        static_argnames=(
                            "cfg", "ensemble_size", "reduce", "mesh",
                            "uncertainty",
                        ),
                        compiler_options=self.compiler_options,
                    ),
                )
            out = ens_fn(
                self.bundle,
                images,
                sparses,
                cfg=cfg,
                ensemble_size=ensemble_size,
                reduce=ensemble_reduce,
                mesh=ensemble_mesh,
                uncertainty=ensemble_uncertainty,
            )
            # a single "final latent" is ill-defined across members, so the
            # second return is the per-member denses (diagnostics / custom
            # reduces) instead of latents; with ensemble_uncertainty=True a
            # third output (per-pixel member MAD [N,H,W,1]) is appended
            return out

        fn = _jitted_sample
        if self._private_programs:
            carry_shape = (
                tuple(pred_latents_prev.shape)
                if pred_latents_prev is not None
                else None
            )
            key = ("sample", tuple(images.shape), cfg, carry_shape)
            fn = self._lru_program(
                key,
                lambda: jax.jit(
                    guided_sample,
                    static_argnames=("cfg",),
                    compiler_options=self.compiler_options,
                ),
            )
        return fn(self.bundle, images, sparses, cfg, pred_latents_prev)

    def replace_bundle(self, **changes: Any) -> "DepthCompletionPipeline":
        return DepthCompletionPipeline(
            dataclasses.replace(self.bundle, **changes),
            max_programs=self.max_programs,
            compiler_options=self.compiler_options,
        )
