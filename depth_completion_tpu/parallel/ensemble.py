"""Ensemble sampling: sharded members, collective median/alignment reduce.

New capability over the reference (SURVEY.md §2.4 "Ensemble parallel"): the
reference always samples a single member (``ensemble_size=1`` hard-coded at
marigold_dc.py:696-698), while the BASELINE KITTI-DC config calls for a
5-member ensemble with a median/alignment reduce.

Design: member m of every frame uses init noise_m (common across frames,
preserving the reference's common-noise-per-batch contract within a member).
The [N·E] flattened batch rides the ``data`` mesh axis; after sampling, each
member is already metric (affine-aligned to the anchors), so the reduce is an
elementwise median (or mean) over members — a tiny cross-member collective
that XLA lowers to an all-gather along the sharded axis.

``aligned-median`` / ``aligned-mean`` insert a Marigold-style inter-member
affine alignment before the reduce (the "median/alignment reduce" of the
BASELINE KITTI config): each member is least-squares scale/shift-fitted to
the elementwise member-median over all pixels, which cancels residual
per-member affine drift. Members here are already anchor-aligned by the
guidance itself, so the alignment is usually a small correction — it matters
for anchor-free regions and for any future sparse-anchor-free ensemble.

The optional per-pixel uncertainty output is the member median absolute
deviation around the reduced map (MAD; same family as Marigold's ensemble
uncertainty), computed on the aligned members for aligned-* reduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depth_completion_tpu.guidance.affine import compute_affine_params
from depth_completion_tpu.models.bundle import ModelBundle
from depth_completion_tpu.ops.resize import latent_size
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

ENSEMBLE_REDUCES = ("median", "mean", "aligned-median", "aligned-mean")


def align_members(members: jnp.ndarray) -> jnp.ndarray:
    """Affine-align each ensemble member to the elementwise member-median.

    One closed-form least-squares (scale, shift) fit per (frame, member)
    over all pixels (``compute_affine_params``, the reference's masked
    solver at marigold_dc.py:53-128 with a full mask). Exact property: a
    member that is an affine function of the median target (positive
    scale) is recovered exactly.

    Args: members [N,E,H,W,1] metric depth. Returns aligned [N,E,H,W,1].
    """
    n, e, h, w, c = members.shape
    ref = jnp.median(members, axis=1, keepdims=True)  # [N,1,H,W,1]
    flat = members.reshape(n * e, h, w, c)
    guides = jnp.broadcast_to(ref, members.shape).reshape(n * e, h, w, c)
    masks = jnp.ones(flat.shape, dtype=bool)
    scales, shifts = compute_affine_params(flat, guides, masks)
    aligned = scales.reshape(-1, 1, 1, 1) * flat + shifts.reshape(-1, 1, 1, 1)
    return aligned.reshape(n, e, h, w, c)


def ensemble_sample(
    bundle: ModelBundle,
    images: jnp.ndarray,
    sparses: jnp.ndarray,
    cfg: SamplerConfig,
    ensemble_size: int,
    reduce: str = "median",
    mesh=None,
    return_uncertainty: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """(denses [N,H,W,1], member denses [N,E,H,W,1]) with E-member ensembling.

    With ``return_uncertainty=True`` a third output is appended: the
    per-pixel member MAD around the reduced map, [N,H,W,1].

    Jit-compatible as a whole. The [N·E] member-expanded batch — not the
    N-frame input — is what shards over the data axis; pass ``mesh`` (static)
    to constrain the expanded rows with NamedSharding so E members of a
    single frame still spread across devices.
    """
    if ensemble_size < 1:
        raise ValueError(f"ensemble_size must be >= 1, got {ensemble_size}")
    if reduce not in ENSEMBLE_REDUCES:
        raise ValueError(
            f"Unknown ensemble reduce: {reduce} (choose from {ENSEMBLE_REDUCES})"
        )
    n, h, w, _ = images.shape
    e = ensemble_size
    eh, ew = latent_size((h, w), cfg.resolution, bundle.vae.downsample_factor)

    # Per-member noise, shared across frames within a member. Member 0 uses
    # the exact key the plain (non-ensemble) path derives, so E=1 reproduces
    # guided_sample bit-for-bit; members >0 fold in their index.
    _, noise_key = jax.random.split(jax.random.PRNGKey(cfg.seed))
    member_keys = [noise_key] + [
        jax.random.fold_in(noise_key, m) for m in range(1, e)
    ]
    member_noise = jnp.concatenate(
        [
            jax.random.normal(k, (1, eh, ew, 4), dtype=jnp.float32)
            for k in member_keys
        ],
        axis=0,
    )
    # Row layout: frame-major [n0m0, n0m1, ..., n0m{E-1}, n1m0, ...]
    init_noise = jnp.tile(member_noise, (n, 1, 1, 1))  # [N*E, EH, EW, 4]

    images_rep = jnp.repeat(images, e, axis=0)
    sparses_rep = jnp.repeat(sparses, e, axis=0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from depth_completion_tpu.core.mesh import AXIS_DATA

        def row_sharded(x):
            spec = PartitionSpec(*([AXIS_DATA] + [None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        images_rep = row_sharded(images_rep)
        sparses_rep = row_sharded(sparses_rep)
        init_noise = row_sharded(init_noise)

    denses_flat, latents_flat = guided_sample(
        bundle, images_rep, sparses_rep, cfg, init_noise=init_noise
    )
    members = denses_flat.reshape(n, e, h, w, 1)
    reduced_over = (
        align_members(members) if reduce.startswith("aligned-") else members
    )
    if reduce.endswith("median"):
        denses = jnp.median(reduced_over, axis=1)
    else:  # *mean
        denses = jnp.mean(reduced_over, axis=1)
    if return_uncertainty:
        mad = jnp.median(
            jnp.abs(reduced_over - denses[:, None]), axis=1
        )  # [N,H,W,1]
        return denses, members, mad
    return denses, members
