"""Batch inference CLI — the reference ``predict.py`` equivalent.

Preserves the reference's flag surface, defaults, and cross-flag coercion
rules (reference predict.py:25-343 options; :402-457 coercions):

- invalid vis_order / loss_funcs entries are skipped with an error log
- use_prev_latent forces batch_size=1
- log/log10/inv projection + norm=const falls back to norm=minmax
- lcm forces train_latents=False; ¬train_latents forces closed_form=True

TPU-era differences (documented deviations):
- ``--checkpoint-dir`` / ``--taesd-dir`` point at local HF-layout
  checkpoints instead of hub downloads (no network egress); ``--model
  random`` runs random weights for smoke tests.
- ``--compile-graph/--compile-mode`` are absorbed by XLA: the entire
  sampling loop is always one jit-compiled program. The flags are accepted
  and logged as no-ops for drop-in compatibility.
- batches are padded to a fixed ``--batch-size`` so every batch reuses one
  compiled program (XLA static shapes), with padded outputs discarded.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Any

import click
import numpy as np

from depth_completion_tpu.cli.common import (
    coerce_guidance_options,
    init_bundle,
)
from depth_completion_tpu.cli.options import CommaSeparated
from depth_completion_tpu.logger import LOG_LEVELS, logger


@click.command(help="Predict dense depth maps from sparse depth maps and camera images.")
@click.argument("src_root", type=click.Path(exists=True, path_type=Path, file_okay=False))
@click.argument("dst_root", type=click.Path(exists=False, path_type=Path))
@click.option(
    "--model",
    type=click.Choice(["original", "lcm", "random"]),
    default="original",
    show_default=True,
    help="Marigold model family. original - DDIM Marigold. lcm - LCM Marigold "
    "(forces --train-latents=False). random - randomly initialized weights "
    "(smoke tests only).",
)
@click.option(
    "--checkpoint-dir",
    type=click.Path(path_type=Path),
    default=None,
    help="Local HF-layout checkpoint directory (unet/, vae/, text_encoder/). "
    "Required unless --model=random.",
)
@click.option(
    "--taesd-dir",
    type=click.Path(path_type=Path),
    default=None,
    help="Local TAESD checkpoint directory (safetensors). Required for --vae=light "
    "with real checkpoints.",
)
@click.option(
    "--vae",
    type=click.Choice(["original", "light"]),
    default="light",
    show_default=True,
    help="VAE for decode: original (SD KL VAE) or light (TAESD).",
)
@click.option("-n", "--steps", type=click.IntRange(min=1), default=50, show_default=True,
              help="Number of denoising steps.")
@click.option("-r", "--res", type=click.IntRange(min=1), default=768, show_default=True,
              help="Processing resolution (longest side).")
@click.option(
    "--norm",
    type=click.Choice(["const", "minmax", "percentile"]),
    default="const",
    show_default=True,
    help="Normalization method for input sparse depth maps.",
)
@click.option("--percentile", type=CommaSeparated(float), default="0.01,0.99",
              show_default=True, help="Percentile range for --norm=percentile.")
@click.option("--max-sparse-depth", type=click.FloatRange(min=0, min_open=True),
              default=120.0, show_default=True,
              help="Max distance [m] encoded in sparse depth PNGs.")
@click.option("--max-depth", type=click.FloatRange(min=0, min_open=True), default=120.0,
              show_default=True, help="Max distance [m] of output dense depth maps.")
@click.option("--min-depth", type=click.FloatRange(min=0), default=0.0,
              show_default=True, help="Min distance [m] of output dense depth maps.")
@click.option("-v", "--vis", type=bool, default=True, show_default=True,
              help="Save visualization grids.")
@click.option("-vr", "--vis-res", type=click.Tuple([int, int]), default=(512, -1),
              show_default=True, help="Visualization grid resolution (h, w); -1 keeps aspect.")
@click.option("-vo", "--vis-order", type=CommaSeparated(str), default="image,sparse,dense",
              show_default=True, help="Views in the grid: image,sparse,dense.")
@click.option("--save-dense", type=bool, default=True, show_default=True,
              help="Save dense depth arrays.")
@click.option("--log", type=click.Path(path_type=Path), default=None, show_default=True,
              help="Path to save logs.")
@click.option("--log-level", type=click.Choice(LOG_LEVELS), default="INFO",
              show_default=True, help="Minimum log level.")
@click.option("-p", "--precision", type=click.Choice(["bf16", "fp32"]), default="bf16",
              show_default=True, help="Data precision for inference.")
@click.option("-c", "--compress", type=click.Choice(["npz", "bl2", "npy", "dcz"]),
              default="dcz", show_default=True,
              help="Output array format for dense depth. dcz is the native "
              "shuffle+LZ4 codec (the bl2 analogue; bl2 itself needs blosc2 "
              "installed — the reference's default, predict.py:176-185).")
@click.option("--compile-graph", type=bool, default=False, show_default=True,
              help="Accepted for compatibility; XLA always compiles the full loop.")
@click.option("--compile-mode", type=click.Choice(["max-autotune", "reduce-overhead", "default"]),
              default="reduce-overhead", show_default=True,
              help="Accepted for compatibility (no-op under XLA).")
@click.option("--compile-effort", type=click.FloatRange(min=-1.0, max=1.0),
              default=None,
              help="XLA exec_time_optimization_effort override. Negative "
              "values trade slower steps for a much faster cold compile "
              "(v5e: -1.0 compiles ~5x faster at ~1.9x slower steps — a net "
              "win for one-off jobs under ~90 frames on a cold cache; "
              "PERF.md round-4). Default: XLA's standard effort.")
@click.option("--interp-mode", type=click.Choice(["bilinear", "nearest"]), default="bilinear",
              show_default=True, help="Interpolation mode for resizing.")
@click.option("--loss-funcs", type=CommaSeparated(str), default="l1,l2", show_default=True,
              help="Loss functions: l1, l2, edge, smooth.")
@click.option("--opt", type=click.Choice(["adam", "sgd", "adagrad"]), default="adam",
              show_default=True, help="Optimizer for latent guidance.")
@click.option("--lr-latent", type=click.FloatRange(min=0, min_open=True), default=0.05,
              show_default=True, help="Learning rate for the latent.")
@click.option("--lr-scaling", type=click.FloatRange(min=0, min_open=True), default=0.005,
              show_default=True, help="Learning rate for scale/shift parameters.")
@click.option("--kld", type=bool, default=False, show_default=True,
              help="Apply KL-divergence penalty toward N(0,1).")
@click.option("--kld-mode", type=click.Choice(["simple", "strict"]), default="simple",
              show_default=True, help="KL divergence mode.")
@click.option("--kld-weight", type=click.FloatRange(min=0, min_open=True), default=0.1,
              show_default=True, help="KL penalty weight.")
@click.option("-bs", "--batch-size", type=click.IntRange(min=1), default=1,
              show_default=True, help="Batch size for inference.")
@click.option("--use-prev-latent", type=bool, default=False, show_default=True,
              help="Use previous frame's latents as a temporal prior.")
@click.option("--beta", type=click.FloatRange(min=0, min_open=True), default=0.9,
              show_default=True, help="Temporal blend weight (with --use-prev-latent).")
@click.option("--use-segmask", type=bool, default=False, show_default=True,
              help="Load segmentation masks (parity: loaded but unused downstream, "
              "reference predict.py:660-694).")
@click.option("--closed-form", type=bool, default=False, show_default=True,
              help="Closed-form affine parameters instead of learned.")
@click.option("--projection", type=click.Choice(["linear", "log", "log10"]),
              default="linear", show_default=True, help="Depth projection space.")
@click.option("--inv", type=bool, default=False, show_default=True,
              help="Inverse (disparity) projection.")
@click.option("--train-latents", type=bool, default=True, show_default=True,
              help="Optimize latents during sampling.")
@click.option("--train-method", type=click.Choice(["per-step", "per-input"]),
              default="per-step", show_default=True, help="Latent training method.")
@click.option("--train-steps", type=click.IntRange(min=1), default=10, show_default=True,
              help="Optimization steps for --train-method=per-input.")
@click.option("--resume", type=bool, default=False, show_default=True,
              help="Skip frames whose dense output already exists (idempotent "
              "re-runs; outputs are per-frame files).")
@click.option("--shard-index", type=click.IntRange(min=0), default=0, show_default=True,
              help="This worker's shard of the frame list (multi-host batch "
              "jobs partition work by frame; shards are independent).")
@click.option("--num-shards", type=click.IntRange(min=1), default=1, show_default=True,
              help="Total number of workers sharding the frame list.")
@click.option("--ensemble", type=click.IntRange(min=1), default=1, show_default=True,
              help="Ensemble members per frame (median/alignment reduce; "
              "members shard over the device mesh). New capability beyond "
              "the reference's single-member path (marigold_dc.py:696-698).")
@click.option("--ensemble-reduce",
              type=click.Choice(["median", "mean", "aligned-median", "aligned-mean"]),
              default="median", show_default=True,
              help="Ensemble reduction. aligned-* first least-squares "
              "scale/shift-aligns every member to the elementwise member "
              "median (Marigold-style inter-member alignment; the BASELINE "
              "KITTI config's 'median/alignment reduce').")
@click.option("--ensemble-uncertainty", type=bool, default=False, show_default=True,
              help="Also save a per-pixel ensemble uncertainty map (member "
              "median absolute deviation around the reduced depth) under "
              "uncertainty/ next to dense/. Requires --ensemble>1.")
@click.option("--mesh-model", type=click.IntRange(min=1), default=1, show_default=True,
              help="Tensor-parallel axis size of the device mesh (weights "
              "sharded over attention heads/MLP channels). Remaining devices "
              "form the data axis for frames/ensemble members.")
@click.option("--native-res", type=bool, default=False, show_default=True,
              help="EXPERIMENTAL long-context mode: shard the UNet "
              "self-attention sequence over the mesh data axis (ring "
              "attention, KV rotating over ICI) instead of sharding the "
              "batch — each device holds S/P of the keys/values, lifting "
              "the single-chip memory ceiling on token count. Requires a "
              ">1-device data axis; incompatible with --ensemble>1.")
@click.option("--fast-guidance", type=bool, default=False, show_default=True,
              help="Skip the UNet backward in the guidance gradient (the "
              "standard 'gradient through x̂₀' approximation: grads flow "
              "through the VAE decode head only). ~2× faster steps; off by "
              "default for exact reference-parity gradients "
              "(marigold_dc.py:875-877 differentiates through the UNet).")
@click.option("--profile-dir", type=click.Path(path_type=Path), default=None,
              show_default=True,
              help="Write a jax.profiler trace of the first inference batch "
              "to this directory (TensorBoard format).")
@click.option("--multihost", type=bool, default=False, show_default=True,
              help="Join the multi-host runtime (jax.distributed.initialize; "
              "TPU pod slices autodetect the coordinator). Combine with "
              "--shard-index/--num-shards per host.")
def main(**kw: Any) -> None:
    run_predict(**kw)


def run_predict(
    src_root: Path,
    dst_root: Path,
    model: str,
    checkpoint_dir: Path | None,
    taesd_dir: Path | None,
    vae: str,
    steps: int,
    res: int,
    norm: str,
    percentile: list[float],
    max_sparse_depth: float,
    max_depth: float,
    min_depth: float,
    vis: bool,
    vis_res: tuple[int, int],
    vis_order: list[str],
    save_dense: bool,
    log: Path | None,
    log_level: str,
    precision: str,
    compress: str,
    compile_graph: bool,
    compile_mode: str,
    interp_mode: str,
    loss_funcs: list[str],
    opt: str,
    lr_latent: float,
    lr_scaling: float,
    kld: bool,
    kld_mode: str,
    kld_weight: float,
    batch_size: int,
    use_prev_latent: bool,
    beta: float,
    use_segmask: bool,
    closed_form: bool,
    projection: str,
    inv: bool,
    train_latents: bool,
    train_method: str,
    train_steps: int,
    resume: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
    ensemble: int = 1,
    ensemble_reduce: str = "median",
    ensemble_uncertainty: bool = False,
    mesh_model: int = 1,
    native_res: bool = False,
    fast_guidance: bool = False,
    profile_dir: Path | None = None,
    multihost: bool = False,
    compile_effort: float | None = None,
) -> None:
    import jax

    from depth_completion_tpu.core.compile_cache import enable_compile_cache
    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()

    # Persist compiled programs across invocations: the fused 50-step
    # sampling program takes minutes to build; the cache makes every run
    # after the first start in seconds (per geometry/config signature).
    enable_compile_cache()

    if multihost:
        from depth_completion_tpu.core.distributed import initialize

        initialize()

    from depth_completion_tpu.io import (
        DATASET_DIR_NAME_IMAGE,
        DATASET_DIR_NAME_SEGMASK,
        DATASET_DIR_NAME_SPARSE,
        RESULT_DIR_NAME_DENSE,
        RESULT_DIR_NAME_VIS,
        find_dataset_dirs,
        find_img_paths,
        load_img_arrays,
        save_img_array,
        to_depth,
        to_segmask,
    )
    from depth_completion_tpu.io.codecs import save_array
    from depth_completion_tpu.io.csvio import load_segmap
    from depth_completion_tpu.viz import has_nan, make_grid, visualize_depth

    logger.configure(level=log_level, log_path=log)

    # ----- option validation / coercion (reference predict.py:402-457) -----
    if vis:
        vis_order_ok = []
        for view in vis_order:
            if view not in ("image", "sparse", "dense"):
                logger.error(f"Invalid order (skipped): {view}")
                continue
            vis_order_ok.append(view)
        if not vis_order_ok:
            logger.critical("No valid visualization order specified")
            sys.exit(1)
        vis_order = vis_order_ok

    if use_prev_latent and batch_size > 1:
        logger.warning(
            "batch_size is forced to 1 when use_prev_latent=True"
        )
        batch_size = 1
    if ensemble > 1 and use_prev_latent:
        logger.error(
            "ensembling is not supported with --use-prev-latent. "
            "Falling back to --ensemble=1"
        )
        ensemble = 1
    if ensemble_uncertainty and ensemble <= 1:
        logger.warning(
            "--ensemble-uncertainty requires --ensemble>1; disabled"
        )
        ensemble_uncertainty = False
    loss_funcs, norm, train_latents, closed_form = coerce_guidance_options(
        loss_funcs, norm, projection, inv, model, train_latents, closed_form
    )
    if compile_graph:
        logger.info(
            f"--compile-graph/--compile-mode={compile_mode} noted: XLA always "
            "compiles the full sampling loop; flags are no-ops"
        )

    # ----- model initialization -------------------------------------------
    import jax.numpy as jnp

    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    bundle = init_bundle(model, checkpoint_dir, taesd_dir, vae, precision)
    # Multi-device: shard the bundle over a (data, model) mesh. Frames and
    # ensemble members ride the data axis; the batch is padded to it.
    # Under multihost with per-host work sharding (--num-shards > 1) each
    # process runs DISJOINT frames, so compute stays on local devices (the
    # distributed runtime is still required on pods to enumerate them);
    # without work sharding all processes cooperate on one global mesh.
    if multihost and num_shards > 1:
        mesh_devices = jax.local_devices()
    else:
        mesh_devices = jax.devices()
    n_devices = len(mesh_devices)
    mesh = None
    if n_devices > 1 or mesh_model > 1:
        import math

        from depth_completion_tpu.core.mesh import MeshSpec, make_mesh
        from depth_completion_tpu.parallel.sharding import shard_bundle

        # The data axis must divide batch_size·ensemble; size it to the gcd
        # so uneven configs still run (on fewer devices) instead of failing.
        # Native-res mode shards the attention *sequence*, not the batch, so
        # it takes the full data axis regardless of batch size.
        total_rows = batch_size * ensemble
        if native_res:
            data_axis = max(n_devices // mesh_model, 1)
        else:
            data_axis = math.gcd(total_rows, max(n_devices // mesh_model, 1))
        if not native_res and data_axis * mesh_model < n_devices:
            logger.warning(
                f"Using {data_axis * mesh_model}/{n_devices} devices — make "
                f"batch_size*ensemble ({total_rows}) a multiple of "
                f"{n_devices // mesh_model} to use the full mesh"
            )
        mesh = make_mesh(
            MeshSpec(data=data_axis, model=mesh_model),
            devices=mesh_devices[: data_axis * mesh_model],
        )
        bundle = shard_bundle(mesh, bundle, tensor_parallel=mesh_model > 1)
        logger.info(f"Mesh: data={data_axis} x model={mesh_model}")
    if native_res:
        if ensemble > 1:
            raise click.UsageError("--native-res is incompatible with --ensemble>1")
        if mesh is None or mesh.shape["data"] < 2:
            raise click.UsageError(
                "--native-res needs a multi-device data axis (ring size >= 2)"
            )
        logger.info(
            f"Native-res mode: self-attention sequence sharded over "
            f"data={mesh.shape['data']} (ring attention)"
        )
    compiler_options = (
        {"exec_time_optimization_effort": float(compile_effort)}
        if compile_effort is not None
        else None
    )
    if compiler_options:
        logger.info(
            f"XLA exec_time_optimization_effort={compile_effort} "
            "(faster compile / slower steps; PERF.md round-4)"
        )
    pipe = DepthCompletionPipeline(bundle, compiler_options=compiler_options)
    scheduler = "lcm" if model == "lcm" else "ddim"
    logger.info(f"Devices: {jax.devices()}")

    # ----- dataset scan (reference predict.py:512-576) --------------------
    dataset_dirs = find_dataset_dirs(src_root)
    if not dataset_dirs:
        logger.critical(f"No dataset directories found at {src_root}")
        sys.exit(1)
    logger.info(f"Found {len(dataset_dirs):,} dataset directories")

    img_paths_all: dict[str, list[Path]] = {}
    sparse_paths_all: dict[str, list[Path]] = {}
    segmask_paths_all: dict[str, list[Path]] = {}
    segmaps: dict[str, dict[str, Any]] = {}
    for dataset_dir in dataset_dirs:
        is_segmask_enabled = use_segmask
        segmask_dir = dataset_dir / DATASET_DIR_NAME_SEGMASK
        if use_segmask:
            if not segmask_dir.exists():
                logger.error(
                    f"No segmentation directory found at {segmask_dir}. "
                    f"Segmentation masks will not be used for {dataset_dir.name}"
                )
                is_segmask_enabled = False
            else:
                segmap_path = segmask_dir / "map.csv"
                if not segmap_path.exists():
                    logger.error(
                        f"No segmentation mapping file found at {segmap_path}. "
                        f"Segmentation masks will not be used for {dataset_dir.name}"
                    )
                    is_segmask_enabled = False
                else:
                    segmaps[dataset_dir.name] = load_segmap(segmap_path)

        img_dir = dataset_dir / DATASET_DIR_NAME_IMAGE
        img_paths = sorted(find_img_paths(img_dir), key=lambda x: x.name)
        sparse_dir = dataset_dir / DATASET_DIR_NAME_SPARSE
        img_paths_all[dataset_dir.name] = []
        sparse_paths_all[dataset_dir.name] = []
        segmask_paths_all[dataset_dir.name] = []
        for path in img_paths:
            sparse_path = sparse_dir / path.relative_to(img_dir).with_suffix(".png")
            if not sparse_path.exists():
                logger.warning(f"No sparse depth map found for image {path} (skipped)")
                continue
            segmask_path = segmask_dir / path.relative_to(img_dir).with_suffix(".png")
            if is_segmask_enabled and not segmask_path.exists():
                logger.warning(f"No segmentation mask found for image {path} (skipped)")
                continue
            img_paths_all[dataset_dir.name].append(path)
            sparse_paths_all[dataset_dir.name].append(sparse_path)
            segmask_paths_all[dataset_dir.name].append(
                segmask_path if is_segmask_enabled else None
            )
        n = len(img_paths_all[dataset_dir.name])
        if n == 0:
            logger.critical("No valid input pairs found")
            sys.exit(1)
        logger.info(f"Found {n:,} input pairs for {dataset_dir.name}")

    dst_root.mkdir(parents=True, exist_ok=True)

    # ----- inference loop (reference predict.py:585-777) ------------------
    import tqdm

    for dataset_idx, dataset_dir in enumerate(dataset_dirs):
        out_dir = dst_root / dataset_dir.relative_to(src_root)
        img_dir = dataset_dir / DATASET_DIR_NAME_IMAGE
        sparse_dir = dataset_dir / DATASET_DIR_NAME_SPARSE
        img_paths = img_paths_all[dataset_dir.name]
        sparse_paths = sparse_paths_all[dataset_dir.name]
        segmask_paths = segmask_paths_all[dataset_dir.name]

        # Work sharding: frame j belongs to worker (j mod num_shards).
        # Shards are independent processes writing disjoint per-frame files,
        # so multi-host batch jobs need no coordination (SURVEY.md §5).
        if num_shards > 1:
            keep = [j for j in range(len(img_paths)) if j % num_shards == shard_index]
            img_paths = [img_paths[j] for j in keep]
            sparse_paths = [sparse_paths[j] for j in keep]
            segmask_paths = [segmask_paths[j] for j in keep]
            logger.info(
                f"Shard {shard_index}/{num_shards}: {len(img_paths):,} frames"
            )

        # Idempotent resume: per-frame outputs make re-runs complete only
        # what is missing.
        prev_latents_restored = None
        if resume and not use_prev_latent:
            def _done(sp: Path) -> bool:
                out_path = (
                    out_dir / RESULT_DIR_NAME_DENSE / sp.relative_to(sparse_dir)
                ).with_suffix(f".{compress}")
                return out_path.exists()

            keep = [j for j, sp in enumerate(sparse_paths) if not _done(sp)]
            skipped = len(sparse_paths) - len(keep)
            if skipped:
                logger.info(f"Resume: skipping {skipped:,} completed frames")
            img_paths = [img_paths[j] for j in keep]
            sparse_paths = [sparse_paths[j] for j in keep]
            segmask_paths = [segmask_paths[j] for j in keep]
        elif resume and use_prev_latent:
            # Temporal mode resumes from the on-disk latent carry written
            # after every frame: skip up to the last completed frame, restore
            # its latents (SURVEY.md §5 checkpoint/resume for video jobs).
            state_path = out_dir / "latent_state.npz"
            if state_path.exists():
                state = np.load(state_path, allow_pickle=True)
                last_name = str(state["frame_name"])
                names = [p.name for p in sparse_paths]
                if last_name in names:
                    cut = names.index(last_name) + 1
                    prev_latents_restored = state["latents"]
                    logger.info(
                        f"Resume (temporal): skipping {cut:,} frames, latents "
                        f"restored from {state_path}"
                    )
                    img_paths = img_paths[cut:]
                    sparse_paths = sparse_paths[cut:]
                    segmask_paths = segmask_paths[cut:]

        is_segmask_enabled = any(p is not None for p in segmask_paths)
        progbar = tqdm.tqdm(
            total=len(img_paths),
            dynamic_ncols=True,
            desc=f"{dataset_idx + 1}/{len(dataset_dirs)} - {dataset_dir.name}",
        )
        postfix: dict[str, Any] = {}
        prev_latents = None
        if prev_latents_restored is not None:
            prev_latents = jnp.asarray(prev_latents_restored)

        def load_batch(i: int) -> dict[str, Any]:
            """Threaded decode of one batch (runs ahead of the accelerator)."""
            b_img_paths = img_paths[i : i + batch_size]
            b_sparse_paths = sparse_paths[i : i + batch_size]
            b_segmask_paths = segmask_paths[i : i + batch_size]
            t0 = time.time()
            imgs_list = load_img_arrays(
                b_img_paths, mode="RGB", num_threads=len(b_img_paths)
            )
            sparses_list = load_img_arrays(
                b_sparse_paths, mode="RGB", num_threads=len(b_sparse_paths)
            )
            segmasks_list: list[np.ndarray | None] = []
            if is_segmask_enabled:
                segmasks_list = load_img_arrays(
                    list(b_segmask_paths), mode="RGB", num_threads=len(b_segmask_paths)
                )
            return {
                "i": i,
                "img_paths": b_img_paths,
                "sparse_paths": b_sparse_paths,
                "imgs": imgs_list,
                "sparses": sparses_list,
                "segmasks": segmasks_list,
                "load_s": time.time() - t0,
            }

        # Double-buffered host pipeline: decode batch i+1 while the
        # accelerator runs batch i (the reference's threaded loaders only
        # parallelize within a batch, predict.py:612-633). Prefetch depth is
        # bounded at 2 batches to cap host memory.
        import collections
        import concurrent.futures

        starts = iter(range(0, len(img_paths), batch_size))
        prefetcher = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        pending: collections.deque = collections.deque()
        for _ in range(2):
            s = next(starts, None)
            if s is not None:
                pending.append(prefetcher.submit(load_batch, s))

        while pending:
            fut = pending.popleft()
            s = next(starts, None)
            if s is not None:
                pending.append(prefetcher.submit(load_batch, s))
            batch = fut.result()
            i = batch["i"]
            b_img_paths = batch["img_paths"]
            b_sparse_paths = batch["sparse_paths"]
            imgs_list = batch["imgs"]
            sparses_list = batch["sparses"]
            segmasks_list = batch["segmasks"]
            progbar_n = len(b_img_paths)
            time_io = batch["load_s"]
            stime = time.time()

            flags = []
            for j in range(len(imgs_list)):
                ok = imgs_list[j] is not None and sparses_list[j] is not None
                if is_segmask_enabled:
                    ok = ok and segmasks_list[j] is not None
                flags.append(ok)
            if not any(flags):
                logger.error(f"All images in batch {i + 1} failed to load (skipped)")
                progbar.update(progbar_n)
                continue
            b_img_paths = [p for p, f in zip(b_img_paths, flags) if f]
            b_sparse_paths = [p for p, f in zip(b_sparse_paths, flags) if f]
            imgs_list = [x for x, f in zip(imgs_list, flags) if f]
            sparses_list = [x for x, f in zip(sparses_list, flags) if f]
            if is_segmask_enabled:
                segmasks_list = [x for x, f in zip(segmasks_list, flags) if f]

            # Pad to the static batch size so one compiled program serves
            # every batch (XLA static shapes). Padded rows are discarded.
            n_real = len(imgs_list)
            while len(imgs_list) < batch_size:
                imgs_list.append(imgs_list[-1])
                sparses_list.append(sparses_list[-1])
            batch_imgs = np.stack(imgs_list).astype(np.float32)
            batch_sparses = to_depth(
                np.stack(sparses_list), max_distance=max_sparse_depth
            )
            if is_segmask_enabled:
                segmap = segmaps[dataset_dir.name]
                _ = to_segmask(np.stack(segmasks_list), segmap["color"])
                # parity note: the reference computes segmasks but never
                # passes them to the pipeline (predict.py:660-694)
            time_io += time.time() - stime

            if mesh is not None and ensemble == 1 and not native_res:
                # plain batches shard at the input; ensemble runs shard the
                # member-expanded rows inside the jitted program instead
                # (native-res replicates the batch and shards the sequence)
                from depth_completion_tpu.parallel.sharding import shard_batch

                batch_imgs, batch_sparses = shard_batch(
                    mesh, batch_imgs, batch_sparses
                )

            profiling = profile_dir is not None and i == 0
            if profiling:
                jax.profiler.start_trace(str(profile_dir))
            stime_infer = time.time()
            out = pipe(
                batch_imgs,
                batch_sparses,
                max_depth,
                min_depth=min_depth,
                projection=projection,
                inv=inv,
                norm=norm,
                percentile=tuple(percentile),
                pred_latents_prev=prev_latents,
                beta=beta,
                steps=steps,
                resolution=res,
                interp_mode=interp_mode,
                loss_funcs=tuple(loss_funcs),
                opt=opt,
                lr=(lr_latent, lr_scaling),
                kld=kld,
                kld_mode=kld_mode,
                kld_weight=kld_weight,
                closed_form=closed_form if train_latents else True,
                train_latents=train_latents,
                train_method=train_method,
                train_steps=train_steps,
                scheduler=scheduler,
                ensemble_size=ensemble,
                ensemble_reduce=ensemble_reduce,
                ensemble_uncertainty=ensemble_uncertainty,
                ensemble_mesh=mesh,
                ring_mesh=mesh if native_res else None,
                detach_unet_grad=fast_guidance,
            )
            denses, latents = out[0], out[1]
            uncs_np = (
                np.asarray(out[2], dtype=np.float32)[:n_real]
                if len(out) == 3
                else None
            )
            denses_np = np.asarray(denses, dtype=np.float32)[:n_real]
            if profiling:
                jax.profiler.stop_trace()
                logger.info(f"Saved profiler trace to {profile_dir}")
            if use_prev_latent:
                prev_latents = latents
                # on-disk latent carry → temporal jobs are resumable
                out_dir.mkdir(parents=True, exist_ok=True)
                np.savez(
                    out_dir / "latent_state.npz",
                    frame_name=b_sparse_paths[-1].name,
                    latents=np.asarray(latents, dtype=np.float32),
                )
            postfix["time/infer"] = time.time() - stime_infer

            time_vis = 0.0
            for fi, (dense, sparse, sparse_path, img, img_path) in enumerate(
                zip(
                    denses_np,
                    batch_sparses[:n_real],
                    b_sparse_paths,
                    batch_imgs[:n_real],
                    b_img_paths,
                )
            ):
                if has_nan(dense):
                    logger.error("NaN values found in dense depth map (skipped)")
                    continue
                if save_dense:
                    stime = time.time()
                    save_dir = (
                        out_dir / RESULT_DIR_NAME_DENSE / sparse_path.relative_to(sparse_dir)
                    ).parent
                    save_path = save_dir / sparse_path.with_suffix(f".{compress}").name
                    save_array(dense, save_path, compress=compress)
                    if uncs_np is not None:
                        unc_dir = (
                            out_dir / "uncertainty" / sparse_path.relative_to(sparse_dir)
                        ).parent
                        save_array(
                            uncs_np[fi],
                            unc_dir / sparse_path.with_suffix(f".{compress}").name,
                            compress=compress,
                        )
                    time_io += time.time() - stime
                if vis:
                    stime = time.time()
                    to_vis = []
                    for order in vis_order:
                        if order == "image":
                            to_vis.append(img.astype(np.uint8))
                        elif order == "sparse":
                            sparse_vis = visualize_depth(
                                sparse[np.newaxis], min_depth=min_depth, max_depth=max_depth
                            )[0]
                            sparse_vis[sparse[..., 0] <= 0.0] = 0
                            to_vis.append(sparse_vis)
                        elif order == "dense":
                            to_vis.append(
                                visualize_depth(
                                    dense[np.newaxis],
                                    min_depth=min_depth,
                                    max_depth=max_depth,
                                )[0]
                            )
                    grid = make_grid(to_vis, resize=vis_res)
                    time_vis += time.time() - stime
                    stime = time.time()
                    save_dir = (
                        out_dir / RESULT_DIR_NAME_VIS / img_path.relative_to(img_dir)
                    ).parent
                    save_img_array(grid, save_dir / f"{img_path.stem}_vis.jpg")
                    time_io += time.time() - stime

            postfix["time/io"] = time_io
            postfix["time/vis"] = time_vis
            progbar.set_postfix(postfix)
            progbar.update(progbar_n)
        prefetcher.shutdown(wait=True)
        progbar.close()
        logger.success(f"Finished processing {dataset_dir.name}")
    # Device-memory high-water mark (TPU PJRT exposes it; absent on CPU).
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            logger.info(f"HBM high-water: {peak / 2**30:.2f} GiB")
    except Exception:  # noqa: BLE001 — diagnostics only
        pass
    logger.success(f"Finished processing all {len(dataset_dirs):,} datasets")


if __name__ == "__main__":
    main()
