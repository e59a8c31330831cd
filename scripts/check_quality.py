"""Quality gates: format + lint + types, degrading honestly by environment.

The reference gates with black + pyright + ruff (reference
pyproject.toml:18-49); this repo configures the TPU-era equivalents
(ruff check, ruff format, pyright — see pyproject.toml). This runner
executes whichever of those tools the environment provides, and ALWAYS
runs two built-in gates that need nothing beyond the stdlib:

1. syntax: ``compileall`` over the package, scripts, tests, bench/entry.
2. import sweep: import every module of ``depth_completion_tpu`` on the
   CPU backend — catches unresolved imports, module-level typos, and
   import-time regressions (e.g. env-knob parsing) that a pure syntax
   pass misses.

Exit code is non-zero if any executed gate fails. Missing tools are
reported as SKIPPED (this image ships no ruff/black/pyright and installs
are prohibited), not silently ignored.

Usage: python scripts/check_quality.py
"""

from __future__ import annotations

import compileall
import importlib
import os
import pkgutil
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

results: list[tuple[str, str]] = []  # (gate, status)
failed = False


def record(gate: str, ok: bool | None, detail: str = "") -> None:
    global failed
    status = "SKIPPED" if ok is None else ("OK" if ok else "FAIL")
    if ok is False:
        failed = True
    results.append((gate, status + (f" ({detail})" if detail else "")))


def run_tool(gate: str, argv: list[str]) -> None:
    """Run an external gate if its binary exists; SKIP otherwise."""
    if shutil.which(argv[0]) is None:
        record(gate, None, f"{argv[0]} not installed in this environment")
        return
    proc = subprocess.run(argv, cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout + proc.stderr)
    record(gate, proc.returncode == 0)


def main() -> int:
    # ---- built-in gate 1: syntax ------------------------------------------
    targets = [
        os.path.join(REPO, "depth_completion_tpu"),
        os.path.join(REPO, "scripts"),
        os.path.join(REPO, "tests"),
    ]
    files = [os.path.join(REPO, f) for f in ("bench.py", "__graft_entry__.py")]
    ok = all(
        compileall.compile_dir(t, quiet=2, force=True) for t in targets
    ) and all(compileall.compile_file(f, quiet=2, force=True) for f in files)
    record("syntax (compileall)", bool(ok))

    # ---- built-in gate 2: import sweep ------------------------------------
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, REPO)
    import depth_completion_tpu as pkg

    bad: list[str] = []
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001 - report, don't crash
            bad.append(f"{mod.name}: {type(exc).__name__}: {exc}")
    if bad:
        sys.stderr.write("\n".join(bad) + "\n")
    record("import sweep (all package modules)", not bad, f"{len(bad)} failed" if bad else "")

    # ---- external gates (run when available) ------------------------------
    run_tool("ruff check", ["ruff", "check", "depth_completion_tpu", "tests", "scripts"])
    run_tool("ruff format --check", ["ruff", "format", "--check", "depth_completion_tpu"])
    run_tool("pyright", ["pyright"])

    width = max(len(g) for g, _ in results)
    for gate, status in results:
        print(f"{gate:<{width}}  {status}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
