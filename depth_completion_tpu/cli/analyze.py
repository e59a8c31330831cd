"""Evaluation CLI — the reference ``analyze.py`` equivalent.

Same flag surface and defaults (reference analyze.py:20-109). Deviation: the
reference's ``--cuda`` accelerator toggle is ``--accel`` here. By default
metrics run on host numpy; ``--accel`` selects the jitted device scorer
(`eval.analyzer`: one compiled program per batch computing overall + binned
masked MAE/RMSE), equivalence-tested against the host path.
"""

from __future__ import annotations

import sys
from pathlib import Path

import click
import tqdm

from depth_completion_tpu.cli.options import CommaSeparated
from depth_completion_tpu.eval.analyzer import METRICS, analyze_datasets
from depth_completion_tpu.logger import LOG_LEVELS, logger


@click.command(help="Analyze results of depth completion.")
@click.argument("dataset_root", type=click.Path(exists=True, path_type=Path, file_okay=False))
@click.argument("result_root", type=click.Path(exists=True, path_type=Path, file_okay=False))
@click.option("--log", type=click.Path(path_type=Path), default=None, show_default=True,
              help="Path to save logs.")
@click.option("--log-level", type=click.Choice(LOG_LEVELS), default="INFO",
              show_default=True, help="Minimum log level.")
@click.option("--metrics", type=CommaSeparated(str), default="mae,rmse",
              show_default=True, help="Metrics: mae, rmse.")
@click.option("--calc-binned-scores", type=bool, default=True, show_default=True,
              help="Compute per-depth-bin scores.")
@click.option("--bin-size", type=click.FloatRange(min=0, min_open=True), default=10.0,
              show_default=True, help="Bin size in meters.")
@click.option("--max-sparse-depth", type=click.FloatRange(min=0, min_open=True),
              default=120.0, show_default=True, help="Max distance [m] of sparse maps.")
@click.option("--max-depth", type=click.FloatRange(min=0, min_open=True), default=120.0,
              show_default=True, help="Max distance [m] of dense maps.")
@click.option("--min-depth", type=click.FloatRange(min=0), default=0.0,
              show_default=True, help="Min distance [m] of dense maps.")
@click.option("-bs", "--batch-size", type=click.IntRange(min=1), default=32,
              show_default=True, help="Batch size for loading depth maps.")
@click.option("-nt", "--num-threads", type=click.IntRange(min=1), default=8,
              show_default=True, help="IO threads.")
@click.option("--accel", type=bool, default=True, show_default=True,
              help="Compute metrics on the accelerator via one jitted program "
              "per batch (the reference's --cuda analogue); falls back to "
              "host numpy when no device is available.")
@click.option("--gt-dir", type=str, default=None, show_default=True,
              help="Ground-truth subdirectory name inside each dataset dir "
              "(e.g. 'groundtruth' for KITTI-DC). Default: self-consistency "
              "vs the sparse input, as the reference does.")
@click.option("--gt-format", type=click.Choice(["png8", "png16", "array"]),
              default="png16", show_default=True,
              help="Ground-truth encoding: png16 = KITTI v/256 m; png8 = "
              "8-bit channel-0 v/255*max; array = metric npy/npz/bl2/dcz.")
def main(
    dataset_root: Path,
    result_root: Path,
    log: Path | None,
    log_level: str,
    metrics: list[str],
    calc_binned_scores: bool,
    bin_size: float,
    max_sparse_depth: float,
    max_depth: float,
    min_depth: float,
    batch_size: int,
    num_threads: int,
    accel: bool,
    gt_dir: str | None,
    gt_format: str,
) -> None:
    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    logger.configure(level=log_level, log_path=log)

    metrics_ok = []
    for m in metrics:
        if m not in METRICS:
            logger.error(f"Invalid metric: {m} (skipped)")
        else:
            metrics_ok.append(m)
    if not metrics_ok:
        logger.critical("No valid metrics provided")
        sys.exit(1)

    progress = tqdm.tqdm(dynamic_ncols=True, desc="analyze")
    try:
        analyze_datasets(
            dataset_root,
            result_root,
            metrics=metrics_ok,
            calc_binned_scores=calc_binned_scores,
            bin_size=bin_size,
            max_sparse_depth=max_sparse_depth,
            max_depth=max_depth,
            min_depth=min_depth,
            batch_size=batch_size,
            num_threads=num_threads,
            gt_dir=gt_dir,
            gt_format=gt_format,
            accel=accel,
            progress=progress,
        )
    except FileNotFoundError as e:
        logger.critical(str(e))
        sys.exit(1)
    finally:
        progress.close()


if __name__ == "__main__":
    main()
