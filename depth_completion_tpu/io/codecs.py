"""Array codecs: .npy / .npz / .bl2 load/save with threaded batch loaders.

Format-compatible with the reference (utils.py:326-367,592-689): `.npz`
stores under ``arr_0``; `.bl2` is blosc2's frame format; non-fp32/fp64 floats
(e.g. bfloat16) are converted to float32 on save.

The `.bl2` path prefers the real python-blosc2 when importable and otherwise
uses the from-scratch frame codec in ``io/bl2.py`` (built on the system
c-blosc1 library); it raises a clear error only when neither is available.
"""

from __future__ import annotations

import concurrent.futures
from pathlib import Path

import numpy as np

try:  # optional C codec
    import blosc2  # type: ignore

    HAVE_BLOSC2 = True
except ImportError:  # pragma: no cover - environment dependent
    blosc2 = None
    HAVE_BLOSC2 = False

NPARRAY_EXTS = [".npy", ".npz", ".bl2", ".dcz"]


def _is_nonnative_float(dtype: np.dtype) -> bool:
    """True for floats numpy can't portably store (bf16, fp16, fp8, ...).

    ml_dtypes extension floats report kind 'V', so check via issubdtype too.
    Mirrors the reference's bf16→fp32-on-save rule (utils.py:633-636).
    """
    if dtype in (np.float32, np.float64):
        return False
    try:
        import ml_dtypes  # noqa: F401

        if dtype in (
            np.dtype(ml_dtypes.bfloat16),
            np.dtype(ml_dtypes.float8_e4m3fn),
            np.dtype(ml_dtypes.float8_e5m2),
        ):
            return True
    except ImportError:  # pragma: no cover
        pass
    return dtype.kind == "f"  # float16 and other native floats


def is_array_path(path: Path) -> bool:
    return path.is_file() and path.suffix in NPARRAY_EXTS


def _require_bl2() -> None:
    from depth_completion_tpu.io.bl2 import blosc1_available

    if not HAVE_BLOSC2 and not blosc1_available():
        raise RuntimeError(
            "neither python-blosc2 nor the system libblosc is available; "
            "use .npy or .npz for compressed arrays"
        )


def load_array(path: Path) -> np.ndarray:
    """Load .npy/.npz/.bl2 (reference utils.py:338-367)."""
    path = Path(path)
    if not is_array_path(path):
        raise ValueError(
            f"Invalid extension: {path.suffix} (must be one of {NPARRAY_EXTS})"
        )
    if path.suffix == ".bl2":
        _require_bl2()
        if HAVE_BLOSC2:
            return blosc2.load_array(str(path))
        from depth_completion_tpu.io.bl2 import load_bl2

        return load_bl2(path)
    if path.suffix == ".dcz":
        from depth_completion_tpu.io.dcz import load_dcz

        return load_dcz(path)
    if path.suffix == ".npz":
        return np.load(path)["arr_0"]
    return np.load(path)


def save_array(x: np.ndarray, path: Path, compress: str | None = None) -> None:
    """Save with the reference's extension/compression contract
    (utils.py:644-689); bf16 etc. are upcast to float32 first."""
    path = Path(path)
    expected = {
        None: ".npy",
        "npy": ".npy",
        "npz": ".npz",
        "bl2": ".bl2",
        "dcz": ".dcz",
    }
    if compress not in expected:
        raise ValueError(f"Unknown compression: {compress}")
    if path.suffix != expected[compress]:
        raise ValueError(
            f"Invalid extension: {path.suffix} (must be {expected[compress]})"
        )
    if _is_nonnative_float(x.dtype):
        x = x.astype(np.float32)
    path.parent.mkdir(parents=True, exist_ok=True)
    if compress == "npz":
        np.savez_compressed(path, x)
    elif compress == "bl2":
        _require_bl2()
        if HAVE_BLOSC2:
            blosc2.save_array(x, str(path), mode="w")
        else:
            from depth_completion_tpu.io.bl2 import save_bl2

            save_bl2(x, path)
    elif compress == "dcz":
        from depth_completion_tpu.io.dcz import save_dcz

        save_dcz(x, path)
    else:
        np.save(path, x)


def load_arrays(paths: list[Path], num_threads: int = 1) -> list[np.ndarray]:
    """Order-preserving threaded batch load (reference utils.py:490-530)."""
    if not paths:
        return []
    if num_threads == 1:
        return [load_array(p) for p in paths]
    with concurrent.futures.ThreadPoolExecutor(max_workers=num_threads) as ex:
        return list(ex.map(load_array, paths))
