"""Warm-model serving for depth completion.

The reference is a batch CLI only (`/root/reference/predict.py`); a
production deployment wants the opposite lifecycle: load + compile once,
then answer a stream of requests at steady-state latency. This package
keeps a `DepthCompletionPipeline` resident and serves it:

- `ServingEngine` — request queue, same-geometry micro-batching with a
  static padded batch (one XLA program per input geometry, zero
  steady-state recompiles), per-session temporal latent carry for video
  streams, warmup, and latency/batching stats.
- `server` — a stdlib HTTP front end (npz in, npy out).

TPU-first notes: everything under jit is traced once per (geometry,
config) signature; the engine's job is to keep request shapes inside the
set of compiled programs (static batch padding, fixed server-level
sampler config) and to keep the single compute thread hot while HTTP
threads only enqueue.
"""

from depth_completion_tpu.serving.engine import (
    OverloadedError,
    ServeRequest,
    ServingEngine,
)

__all__ = ["ServingEngine", "ServeRequest", "OverloadedError"]
