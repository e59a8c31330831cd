"""Serving engine: micro-batching, geometry program cache, session carry.

Design (TPU-first):

- One compute thread owns all device DISPATCH; HTTP/caller threads only
  enqueue. A separate finisher thread materializes results (JAX returns
  async device arrays), so host-side result fetch overlaps the next
  batch's device compute instead of idling the chip between batches
  (up to two batches in flight).
- Same-geometry micro-batching: requests whose frames share (H, W) are
  stacked and padded to the smallest STATIC batch bucket that fits
  (default buckets {1, max_batch}), so each (geometry, bucket) compiles
  exactly one XLA program regardless of how many requests arrive together
  (the same static-batch trick as the predict CLI) while a lone request
  pays bucket-1 latency, not max_batch's padded device time. Padded rows
  are computed and discarded — at guided-diffusion cost per frame
  (~seconds), waiting `max_delay_ms` for batchmates is cheap and batch
  amortization is measured (+12% at batch 8, PERF.md round-3).
- Multi-geometry streams: each geometry has its own FIFO queue and batch
  rounds are dispatched round-robin across non-empty queues, so a
  KITTI+NYU mixed stream interleaves at the batch level instead of one
  geometry head-of-line blocking the other. Pair with a pipeline built
  with ``max_programs=N`` to hold N warm compiled programs with LRU
  eviction (pipeline/pipeline.py) when geometry diversity would otherwise
  grow program memory without bound.
- Sessions: a video stream passes `session=<id>` and the engine carries
  the previous frame's final latent into the next request
  (`beta*common_noise + (1-beta)*prev`, reference marigold_dc.py:699-704,
  predict.py:697-699). Carry requests run unbatched (the carry is a
  whole-batch input, mirroring the reference's use_prev_latent =>
  batch_size=1 coercion, predict.py:423-430).
- The sampler config (steps, resolution, losses, max_depth, ...) is fixed
  at server construction: every SamplerConfig field is part of the jit
  cache key, so per-request config would mean per-request recompiles.
  Requests asking for a different max_depth are rejected up front.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any

import numpy as np


class OverloadedError(RuntimeError):
    """Raised by submit() when the request queue is at max_queue depth."""


@dataclass
class ServeRequest:
    """One depth-completion request (host arrays, NHWC semantics)."""

    image: np.ndarray  # [H,W,3] RGB, 0..255
    sparse: np.ndarray  # [H,W] or [H,W,1] metric depth, 0 = missing
    session: str | None = None
    # filled by the engine:
    _done: threading.Event = field(default_factory=threading.Event, repr=False)
    _result: np.ndarray | None = field(default=None, repr=False)
    _error: Exception | None = field(default=None, repr=False)
    _enqueued_at: float = 0.0
    _batch_size: int = 0
    _cancelled: bool = False
    # one bounded retry per request: a transient backend error (tunnel
    # hiccup) must not fail a whole micro-batch (VERDICT r4 #5b)
    _retried: bool = False

    def wait(self, timeout: float | None = None) -> np.ndarray:
        if not self._done.wait(timeout):
            raise TimeoutError("depth completion request timed out")
        if self._error is not None:
            raise self._error
        assert self._result is not None
        return self._result

    def cancel(self) -> None:
        """Mark the request abandoned: if it has not started computing,
        the worker drops it instead of burning ~seconds of device time on
        a result nobody will read. A request already inside a batch
        completes normally (its result is simply discarded)."""
        self._cancelled = True


class ServingEngine:
    """Keeps a DepthCompletionPipeline warm and serves requests.

    Args:
        pipe: a `DepthCompletionPipeline` (bundle already sharded if a
            mesh is in play).
        call_kwargs: fixed sampler kwargs passed to every `pipe(...)` call
            (steps, resolution, loss_funcs, norm, ... and `max_depth`,
            which is required).
        max_batch: micro-batch size; also the largest static batch bucket.
        max_delay_ms: how long the batcher waits for same-geometry
            batchmates after the first request of a batch arrives.
        session_ttl_s: idle seconds after which a session's carry latent
            is dropped.
        batch_buckets: static padded batch sizes (one XLA program each per
            geometry); a coalesced batch runs the smallest bucket that
            fits. Default {1, max_batch}. max_batch is always included;
            buckets above it are dropped.
    """

    def __init__(
        self,
        pipe: Any,
        call_kwargs: dict[str, Any],
        *,
        max_batch: int = 4,
        max_delay_ms: float = 25.0,
        session_ttl_s: float = 300.0,
        beta: float | None = None,
        max_queue: int = 256,
        batch_buckets: tuple[int, ...] | None = None,
    ) -> None:
        if "max_depth" not in call_kwargs:
            raise ValueError("call_kwargs must include max_depth")
        self.pipe = pipe
        self.call_kwargs = dict(call_kwargs)
        self.max_batch = int(max_batch)
        self.max_delay_ms = float(max_delay_ms)
        self.session_ttl_s = float(session_ttl_s)
        self.max_queue = int(max_queue)
        # Static padded-batch sizes: a coalesced batch of n rows runs the
        # smallest bucket >= n. One XLA program per (geometry, bucket), so
        # a lone request pays bucket-1 device time instead of a full
        # max_batch row's worth of padding. Default {1, max_batch}.
        if batch_buckets is None:
            buckets = {1, self.max_batch}
        else:
            buckets = {int(b) for b in batch_buckets}
            if any(b < 1 for b in buckets):
                raise ValueError(f"batch buckets must be >= 1: {batch_buckets}")
            buckets.add(self.max_batch)  # largest bucket must fit max_batch
            buckets = {b for b in buckets if b <= self.max_batch}
        self.batch_buckets = tuple(sorted(buckets))
        if beta is not None:
            self.call_kwargs["beta"] = float(beta)

        # Per-geometry FIFO queues with round-robin dispatch: each batch
        # round serves the next non-empty geometry, so a steady stream of
        # one geometry cannot head-of-line block another (KITTI+NYU mixed
        # streams interleave 1:1 at the batch level), and batch collection
        # never skips over foreign-geometry requests. Guarded by _cv;
        # lock nesting is always _cv → _lock (submit touches them
        # disjointly), never the reverse.
        self._cv = threading.Condition()
        self._queues: dict[tuple[int, int], deque[ServeRequest]] = {}
        self._rr: deque[tuple[int, int]] = deque()  # round-robin key order
        # Admitted-but-unresolved requests. Admission is gated on this
        # exact counter — queued, collected, and in-flight work all count.
        self._pending = 0
        self._sessions: dict[str, tuple[np.ndarray, float]] = {}
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "completed": 0,
            "errors": 0,
            "rejected": 0,
            "cancelled": 0,
            "retried_batches": 0,
            "batches": 0,
            "batched_rows": 0,
            "padded_rows": 0,
            "compiled_geometries": [],
            "compiled_programs": [],  # (h, w, bucket) triples seen live
        }
        self._latencies: deque[float] = deque(maxlen=512)
        self._warm = False
        self._stop = False
        # pause before the one bounded batch retry after a transient
        # dispatch/materialize error (tests shrink it)
        self.dispatch_retry_backoff_s = 0.5
        # bounded re-tries of failed full-effort tier promotions
        # (ADVICE r4: a transient compile failure must not pin a signature
        # to tier-0 forever); tests shrink the backoff
        self.promote_retries = 2
        self.promote_backoff_s = 5.0
        # Tiered warmup state (see warmup(tiered=True)): while _tier0_pipe
        # is set, signatures not yet in _full_ready dispatch to the fast
        # low-effort-compiled programs; the background thread compiles the
        # full-effort program per signature and flips it here.
        self._tier0_pipe: Any = None
        self._tier0_ready: set[tuple] = set()
        self._full_ready: set[tuple] = set()
        self._tier_lock = threading.Lock()
        # Dispatch/finish pipelining: the worker enqueues each dispatched
        # batch (JAX returns async device arrays) and immediately collects
        # the next one, while the finisher thread materializes results —
        # so host-side result fetch overlaps device compute instead of
        # idling the chip between batches. maxsize bounds in-flight
        # batches (double buffering).
        self._finish: queue.Queue[tuple | None] = queue.Queue(maxsize=2)
        self._thread = threading.Thread(
            target=self._worker, name="dct-serving-worker", daemon=True
        )
        self._finisher = threading.Thread(
            target=self._finisher_loop, name="dct-serving-finisher", daemon=True
        )
        self._thread.start()
        self._finisher.start()

    # ------------------------------------------------------------- public

    def submit(self, req: ServeRequest) -> ServeRequest:
        req.sparse = np.asarray(req.sparse)
        if req.sparse.ndim == 2:
            req.sparse = req.sparse[..., None]
        req.image = np.asarray(req.image)
        if req.image.ndim != 3 or req.image.shape[-1] != 3:
            raise ValueError(f"image must be [H,W,3], got {req.image.shape}")
        if req.sparse.shape[:2] != req.image.shape[:2]:
            raise ValueError(
                f"sparse {req.sparse.shape} does not match image "
                f"{req.image.shape}"
            )
        # Per-request validity at admission (the pipeline's empty-sparse
        # contract, pipeline.py:86-110): checking here keeps one invalid
        # request from failing the whole micro-batch it would share.
        if not (req.sparse > 0).any():
            raise ValueError(
                "No valid values found in mask for some positions. Ensure "
                "that mask has at least one True value along the specified "
                "dimensions. (sparse frame has no points > 0)"
            )
        # Degenerate-range guard (mirrors pipeline/pipeline.py): under
        # minmax/percentile normalization a constant-valued sparse frame
        # divides by zero in the normalizer; reject it at admission so it
        # cannot 422 a shared micro-batch.
        norm = self.call_kwargs.get("norm", "minmax")
        if norm in ("minmax", "percentile"):
            vals = req.sparse[req.sparse > 0]
            if norm == "minmax":
                lo, hi = float(vals.min()), float(vals.max())
            else:
                pct = self.call_kwargs.get("percentile", (0.01, 0.99))
                lo, hi = (float(q) for q in np.quantile(vals, pct))
            lo = max(lo, float(self.call_kwargs.get("min_depth", 0.0)))
            hi = min(hi, float(self.call_kwargs["max_depth"]))
            if not hi > lo:
                raise ValueError(
                    f"Degenerate sparse depth range: norm={norm!r} "
                    f"estimated [{lo}, {hi}] — all valid points share one "
                    "value (or the range collapses after clamping). Use "
                    "norm='const' or provide varied sparse points."
                )
        # bounded admission: shed load instead of growing an unbounded
        # backlog (each queued request is ~seconds of device time). Gate on
        # the pending counter, which also covers worker-deferred requests.
        with self._lock:
            if self._pending >= self.max_queue:
                self._stats["rejected"] += 1
                raise OverloadedError(
                    f"request queue full ({self.max_queue} pending)"
                )
            self._pending += 1
            self._stats["requests"] += 1
        req._enqueued_at = time.monotonic()
        with self._cv:
            key = tuple(req.image.shape[:2])
            q = self._queues.get(key)
            if q is None:
                q = self._queues[key] = deque()
                self._rr.append(key)
            q.append(req)
            self._cv.notify()
        return req

    def complete(
        self,
        image: np.ndarray,
        sparse: np.ndarray,
        session: str | None = None,
        timeout: float | None = None,
    ) -> np.ndarray:
        """Synchronous convenience wrapper: submit and wait."""
        return self.submit(
            ServeRequest(image=image, sparse=sparse, session=session)
        ).wait(timeout)

    def _make_tier0_pipe(self, effort: float) -> Any:
        """Low-compile-effort twin of self.pipe sharing its bundle (weights
        are shared device arrays — no extra parameter memory)."""
        from depth_completion_tpu.pipeline import DepthCompletionPipeline

        return DepthCompletionPipeline(
            self.pipe.bundle,
            max_programs=getattr(self.pipe, "max_programs", None),
            compiler_options={"exec_time_optimization_effort": float(effort)},
        )

    def warmup(
        self,
        geometries: list[tuple[int, int]],
        parallel: int | None = None,
        tiered: bool = False,
        tier_effort: float = -1.0,
    ) -> None:
        """Compile (or cache-load) every (geometry, batch-bucket) program,
        plus the session-carry variant per geometry.

        Calls the pipeline directly (no traffic is flowing yet, so the
        single-compute-thread invariant is not at stake) so each bucket
        size compiles before the first live request can hit it cold. The
        carry program (``pred_latents_prev`` supplied — second frame of any
        session) is a distinct jit signature; without warming it, the first
        carry frame would trigger a cold compile (minutes at production
        geometry) on the compute thread, stalling all traffic behind it.

        ``parallel``: compile up to this many programs concurrently. XLA
        backend compilation releases the GIL, so *distinct* programs
        overlap on host cores while their single executions still
        serialize on the device; with G geometries × B buckets the
        compile wall-clock approaches the slowest single program instead
        of the sum (measured in PERF.md round-4). Default (None/1) keeps
        the serial order. The pipeline's program LRU is lock-guarded, so
        concurrent warmup calls are safe even with ``max_programs`` set —
        but keep ``parallel <= max_programs`` or eviction can race ahead
        of the warm set.

        ``tiered``: serve first, optimize later. Compiles every program at
        low XLA effort first (``tier_effort``; -1.0 cuts the measured v5e
        cold start ~5× at ~1.9× slower steps, PERF.md round-4), opens for
        traffic on those tier-0 programs, then recompiles each signature
        at full effort on a background thread and atomically swaps
        dispatch to the full program as it becomes ready. Steady-state
        throughput is untouched; only the first minutes of traffic run on
        the slower tier. Numerics: both tiers run the same math — XLA
        optimization level may reorder reductions, so results can differ
        in low-order bits between tiers (same class as any recompile).
        Promotion inherits ``parallel`` (full-effort compiles overlap) and
        retries failed signatures (``promote_retries``/``promote_backoff_s``
        attributes). With ``max_programs`` smaller than the warmed
        signature count, later promotions can LRU-evict earlier full
        programs; dispatch detects the eviction and keeps serving the
        still-warm tier-0 program instead of cold-compiling on the compute
        thread — but prefer ``max_programs >= len(geometries) *
        (len(batch_buckets) + 1)`` so every promoted program stays live.
        """
        if tiered:
            with self._tier_lock:
                self._tier0_pipe = self._make_tier0_pipe(tier_effort)
                self._tier0_ready = set()
                self._full_ready = set()
        rng = np.random.default_rng(0)
        # job = (signature key, images, sparses, carry); key mirrors the
        # dispatch-side _program_key so tier swaps match live batches
        jobs: list[tuple[tuple, np.ndarray, np.ndarray, np.ndarray | None]] = []
        from depth_completion_tpu.ops.resize import latent_size

        resolution = int(self.call_kwargs.get("resolution", 768))
        for h, w in geometries:
            img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
            sparse = np.zeros((h, w, 1), np.float32)
            sparse[h // 2, w // 2, 0] = 1.0
            sparse[h // 4, w // 4, 0] = self.call_kwargs["max_depth"] / 2
            for b in self.batch_buckets:
                jobs.append(
                    (
                        ((h, w), b, False),
                        np.repeat(img[None], b, 0),
                        np.repeat(sparse[None], b, 0),
                        None,
                    )
                )
            # carry variant (sessions run unbatched, so batch 1 suffices);
            # shape-only for compilation — zeros are a valid prior latent,
            # and computing the shape up front keeps the job independent
            # so it can compile concurrently with the bucket programs
            vae = getattr(getattr(self.pipe, "bundle", None), "vae", None)
            factor = getattr(
                vae, "downsample_factor",
                8,  # the SD/TAESD constant; only test fakes lack a bundle
            )
            # latent channel count from the bundle, not a hard-coded 4: a
            # VAE with a different latent width would otherwise warm a
            # phantom carry signature and the real second session frame
            # would cold-compile on the compute thread (ADVICE r4)
            channels = getattr(
                getattr(vae, "config", None), "latent_channels", 4
            )
            eh, ew = latent_size((h, w), resolution, factor)
            jobs.append(
                (
                    ((h, w), 1, True),
                    img[None],
                    sparse[None],
                    np.zeros((1, eh, ew, channels), np.float32),
                )
            )

        def run(pipe: Any, job: tuple) -> None:
            _, images, sparses, carry = job
            kwargs = dict(self.call_kwargs)
            if carry is not None:
                kwargs["pred_latents_prev"] = carry
            pipe(images, sparses, **kwargs)

        first_pipe = self._tier0_pipe if tiered else self.pipe
        if parallel is not None and parallel > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=parallel) as ex:
                # list() re-raises the first failure, like the serial path
                list(ex.map(lambda j: run(first_pipe, j), jobs))
        else:
            for job in jobs:
                run(first_pipe, job)
        if tiered:
            with self._tier_lock:
                # only signatures warmed at tier-0 may dispatch there;
                # anything else (new geometry mid-flight) goes straight to
                # the full pipe, exactly as without tiering
                self._tier0_ready = {j[0] for j in jobs}
            threading.Thread(
                target=self._promote_full_programs,
                args=(jobs, parallel),
                name="dct-serving-tier-promote",
                daemon=True,
            ).start()
        self._warm = True

    def _promote_full_programs(
        self,
        jobs: list[tuple],
        parallel: int | None = None,
        retries: int | None = None,
        backoff_s: float | None = None,
    ) -> None:
        """Background full-effort compiles, flipping dispatch per signature
        as each lands; tier-0 executables are dropped once every signature
        is promoted.

        ``parallel`` (inherited from warmup): distinct signatures compile
        concurrently — XLA compilation releases the GIL, so with N workers
        the promotion wall-clock approaches the slowest single compile
        instead of the sum, shrinking the window where traffic pays the
        ~1.9× tier-0 step cost (VERDICT r4 #5a). Each program's single
        post-compile execution still serializes on the device (seconds,
        noise next to the compiles).

        Failed signatures are retried ``retries`` times with linear backoff
        (a transient tunnel error must not pin a signature to tier-0 for
        the process lifetime — ADVICE r4); signatures still unpromoted
        after the last pass are logged and keep serving from tier-0, and
        the tier-0 pipe is retained for exactly that purpose.
        """
        if retries is None:
            retries = self.promote_retries
        if backoff_s is None:
            backoff_s = self.promote_backoff_s
        pending = list(jobs)
        for attempt in range(retries + 1):
            failed: list[tuple] = []

            def promote(job: tuple) -> None:
                if self._stop:
                    return
                try:
                    kwargs = dict(self.call_kwargs)
                    if job[3] is not None:
                        kwargs["pred_latents_prev"] = job[3]
                    self.pipe(job[1], job[2], **kwargs)
                except Exception:
                    failed.append(job)  # list.append is thread-safe
                    return
                with self._tier_lock:
                    self._full_ready.add(job[0])

            if parallel is not None and parallel > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=parallel) as ex:
                    list(ex.map(promote, pending))
            else:
                for job in pending:
                    promote(job)
            pending = failed
            if not pending or self._stop:
                break
            time.sleep(backoff_s * (attempt + 1))
        with self._tier_lock:
            if self._full_ready >= self._tier0_ready:
                self._tier0_pipe = None  # frees tier-0 executables
            elif pending:
                from depth_completion_tpu.logger import logger

                logger.warning(
                    "tiered warmup: %d signature(s) failed full-effort "
                    "promotion after %d attempt(s) and stay on tier-0: %s"
                    % (len(pending), retries + 1, [j[0] for j in pending])
                )

    @property
    def warm(self) -> bool:
        return self._warm

    def stats(self) -> dict[str, Any]:
        with self._lock:
            out = dict(self._stats)
            out["compiled_geometries"] = list(out["compiled_geometries"])
            out["compiled_programs"] = list(out["compiled_programs"])
            lats = sorted(self._latencies)
            out["sessions_active"] = len(self._sessions)
        if lats:
            out["latency_s_p50"] = round(lats[len(lats) // 2], 4)
            out["latency_s_p95"] = round(lats[int(len(lats) * 0.95)], 4)
        with self._cv:
            out["queue_depth"] = sum(len(q) for q in self._queues.values())
            out["geometry_queues"] = {
                f"{h}x{w}": len(q) for (h, w), q in self._queues.items() if q
            }
        with self._lock:
            out["pending"] = self._pending
        if hasattr(self.pipe, "program_keys"):
            out["pipe_programs"] = len(self.pipe.program_keys())
        with self._tier_lock:
            if self._tier0_pipe is not None:
                out["tier0_active"] = True
                out["tier_promoted"] = (
                    f"{len(self._full_ready)}/{len(self._tier0_ready)}"
                )
        return out

    def reset_session(self, session: str) -> bool:
        with self._lock:
            return self._sessions.pop(session, None) is not None

    def shutdown(self, timeout: float = 10.0) -> None:
        self._stop = True
        with self._cv:
            self._cv.notify_all()
        self._thread.join(timeout)
        self._finish.put(None)
        self._finisher.join(timeout)
        # Final drain: a retry requeue racing the worker's own leftover
        # cleanup (finisher checks _stop, then _stop flips, worker exits)
        # could strand requests in a queue nobody reads — fail them now so
        # their waiters never hang until timeout.
        exc = RuntimeError("serving engine shut down")
        with self._cv:
            leftovers = [r for q in self._queues.values() for r in q]
            for q in self._queues.values():
                q.clear()
        for r in leftovers:
            self._resolve(r, exc)

    # ------------------------------------------------------------- worker

    def _resolve(self, req: ServeRequest, error: Exception | None = None) -> None:
        """Resolve a request (success fields already set, or an error) and
        release its admission slot. Every _done.set() goes through here so
        the pending counter stays exact."""
        if error is not None:
            req._error = error
        with self._lock:
            self._pending -= 1
        req._done.set()

    def _reap_cancelled(self, req: ServeRequest) -> bool:
        """True if the request was abandoned by its waiter; resolve it
        without device work."""
        if not req._cancelled:
            return False
        with self._lock:
            self._stats["cancelled"] += 1
        self._resolve(req, RuntimeError("request cancelled by caller"))
        return True

    def _next_request(self) -> ServeRequest | None:
        """Next request, round-robin across geometry queues; blocks until
        one is available or shutdown (returns None)."""
        with self._cv:
            while True:
                for _ in range(len(self._rr)):
                    key = self._rr[0]
                    self._rr.rotate(-1)  # next round starts after this key
                    q = self._queues.get(key)
                    if q:
                        return q.popleft()
                if self._stop:
                    return None
                self._cv.wait(timeout=0.5)

    def _collect_batch(self, first: ServeRequest) -> list[ServeRequest]:
        """Greedily gather same-geometry, sessionless batchmates from the
        geometry's own queue until max_batch or the delay deadline.
        Session (carry) requests always run alone — the carry latent is a
        whole-batch input — and keep their FIFO slot: collection stops at
        a session head rather than jumping past it."""
        batch = [first]
        if first.session is not None or self.max_batch <= 1:
            return batch
        key = tuple(first.image.shape[:2])
        deadline = time.monotonic() + self.max_delay_ms / 1e3
        with self._cv:
            q = self._queues[key]
            while len(batch) < self.max_batch:
                while q and len(batch) < self.max_batch:
                    nxt = q[0]
                    if nxt._cancelled:
                        q.popleft()
                        self._reap_cancelled(nxt)
                        continue
                    if nxt.session is not None:
                        return batch  # runs alone next round, in order
                    batch.append(q.popleft())
                if len(batch) >= self.max_batch or self._stop:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
        return batch

    def _worker(self) -> None:
        while True:
            first = self._next_request()
            if first is None:
                break
            if self._reap_cancelled(first):
                continue
            batch = self._collect_batch(first)
            try:
                self._run_batch(batch)
            except Exception as exc:
                # One bounded retry PER REQUEST: a transient backend error
                # (e.g. a tunnel FailedPrecondition) must not fail a
                # micro-batch of ~seconds-each requests (VERDICT r4 #5b).
                # A batch can mix fresh requests with one already-retried
                # requeued request — only the already-retried ones fail;
                # fresh batchmates still get their own retry. Deterministic
                # errors simply fail again — one extra bounded attempt.
                fresh = [r for r in batch if not r._retried]
                stale = [r for r in batch if r._retried]
                if stale:
                    with self._lock:
                        self._stats["errors"] += len(stale)
                    for r in stale:
                        self._resolve(r, exc)
                if fresh:
                    for r in fresh:
                        r._retried = True
                    with self._lock:
                        self._stats["retried_batches"] += 1
                    time.sleep(self.dispatch_retry_backoff_s)
                    try:
                        self._run_batch(fresh)
                    except Exception as exc2:
                        with self._lock:
                            self._stats["errors"] += len(fresh)
                        for r in fresh:
                            self._resolve(r, exc2)
            self._sweep_sessions()
        # fail any requests still queued at shutdown instead of letting
        # their waiters hang until timeout
        exc_ = RuntimeError("serving engine shut down")
        with self._cv:
            leftovers = [r for q in self._queues.values() for r in q]
            for q in self._queues.values():
                q.clear()
        for r in leftovers:
            self._resolve(r, exc_)

    def _sweep_sessions(self) -> None:
        """Drop expired carry latents for ALL sessions (not only re-used
        keys) — one O(sessions) scan per multi-second batch; without it a
        stream of fresh session ids would grow the dict without bound."""
        now = time.monotonic()
        with self._lock:
            dead = [
                k
                for k, (_, ts) in self._sessions.items()
                if now - ts > self.session_ttl_s
            ]
            for k in dead:
                del self._sessions[k]

    def _run_batch(self, batch: list[ServeRequest]) -> None:
        """Dispatch one batch (async device arrays) and hand it to the
        finisher; blocks only when two batches are already in flight."""
        n = len(batch)
        geo = tuple(batch[0].image.shape[:2])
        images = np.stack([r.image for r in batch]).astype(np.float32)
        sparses = np.stack([r.sparse for r in batch]).astype(np.float32)
        # Static batch: pad to the smallest bucket >= n so each
        # (geometry, bucket) is ONE program and a lone request does not
        # pay a full max_batch of padded device time.
        if batch[0].session is None:
            bucket = min(b for b in self.batch_buckets if b >= n)
            pad = bucket - n
        else:
            pad = 0
        if pad:
            images = np.concatenate([images, images[:1].repeat(pad, 0)])
            sparses = np.concatenate([sparses, sparses[:1].repeat(pad, 0)])

        kwargs = dict(self.call_kwargs)
        session = batch[0].session
        prev_held = None
        if session is not None:
            now = time.monotonic()
            with self._lock:
                held = self._sessions.get(session)
                if held is not None and now - held[1] > self.session_ttl_s:
                    held = None
                    self._sessions.pop(session, None)
            prev_held = held  # restored if this dispatch fails (retry path)
            if held is not None:
                kwargs["pred_latents_prev"] = held[0]

        # Tiered warmup: while a signature's full-effort program is still
        # compiling in the background, dispatch to its tier-0 (fast-compile,
        # slower-step) twin; everything else takes the full pipe.
        key = (geo, n + pad, "pred_latents_prev" in kwargs)
        with self._tier_lock:
            use_tier0 = (
                self._tier0_pipe is not None
                and key in self._tier0_ready
                and key not in self._full_ready
            )
            if (
                not use_tier0
                and self._tier0_pipe is not None
                and key in self._tier0_ready
                and getattr(self.pipe, "max_programs", None) is not None
            ):
                # the promoted full program may have been LRU-evicted by
                # later promotions (max_programs < warmed signatures);
                # dispatching to the full pipe would then cold-compile at
                # full effort ON the compute thread — prefer the still-warm
                # tier-0 program instead (ADVICE r4)
                carry = key[2]
                want = (n + pad,) + geo + (3,)
                alive = any(
                    pk[0] == "sample"
                    and tuple(pk[1]) == want
                    and (pk[3] is not None) == carry
                    for pk in self.pipe.program_keys()
                )
                if not alive:
                    use_tier0 = True
            pipe = self._tier0_pipe if use_tier0 else self.pipe

        denses, latents = pipe(images, sparses, **kwargs)

        if session is not None:
            # store the (possibly still-executing) device array; JAX
            # chains the dependency if the session's next frame dispatches
            # before this one materializes
            with self._lock:
                self._sessions[session] = (latents, time.monotonic())

        self._finish.put((batch, n, pad, geo, denses, session, prev_held))

    def _requeue_batch(self, batch: list[ServeRequest], geo: tuple) -> None:
        """Put a failed batch back near the FRONT of its geometry queue so
        the compute thread redispatches it — the finisher must never
        dispatch device work itself (single-dispatch-thread invariant).
        Inserted AFTER any already-requeued (retried) requests at the
        front: with two batches in flight, the earlier-failed batch was
        requeued first and must redispatch first, or FIFO inverts and a
        session's frame N+1 could recompute before frame N."""
        with self._cv:
            q = self._queues.get(geo)
            if q is None:
                q = self._queues[geo] = deque()
                self._rr.append(geo)
            idx = 0
            while idx < len(q) and q[idx]._retried:
                idx += 1
            for i, r in enumerate(batch):
                q.insert(idx + i, r)
            self._cv.notify()

    def _finisher_loop(self) -> None:
        """Materialize dispatched batches and resolve their waiters, off
        the dispatch thread so result fetch overlaps device compute."""
        while True:
            item = self._finish.get()
            if item is None:
                break
            batch, n, pad, geo, denses, session, prev_held = item
            try:
                denses = np.asarray(denses)[:n]
            except Exception as exc:  # async device failure surfaces here
                # a transient backend error (tunnel hiccup) shows up at
                # materialization on async backends; restore the session
                # carry the failed dispatch overwrote, then hand the batch
                # back to the compute thread for ONE bounded retry
                if session is not None:
                    restored = False
                    if prev_held is not None:
                        # with two session frames in flight, prev_held can
                        # itself be the un-materialized output of an
                        # earlier dispatch that ALSO failed — validate
                        # before reinstating so the retry never chains off
                        # a poisoned buffer (it re-seeds instead)
                        try:
                            np.asarray(prev_held[0])
                            restored = True
                        except Exception:
                            restored = False
                    with self._lock:
                        if restored:
                            self._sessions[session] = prev_held
                        else:
                            self._sessions.pop(session, None)
                # one bounded retry PER REQUEST (mirrors the worker path):
                # already-retried requests fail; fresh ones requeue once
                fresh = [r for r in batch if not r._retried]
                stale = [r for r in batch if r._retried]
                if self._stop:
                    stale, fresh = batch, []
                if stale:
                    with self._lock:
                        self._stats["errors"] += len(stale)
                    for r in stale:
                        self._resolve(r, exc)
                if fresh:
                    for r in fresh:
                        r._retried = True
                    with self._lock:
                        self._stats["retried_batches"] += 1
                    time.sleep(self.dispatch_retry_backoff_s)
                    self._requeue_batch(fresh, geo)
                continue
            done_at = time.monotonic()
            with self._lock:
                self._stats["completed"] += n
                self._stats["batches"] += 1
                self._stats["batched_rows"] += n
                self._stats["padded_rows"] += pad
                if geo not in self._stats["compiled_geometries"]:
                    self._stats["compiled_geometries"].append(geo)
                prog = (geo[0], geo[1], n + pad)
                if prog not in self._stats["compiled_programs"]:
                    self._stats["compiled_programs"].append(prog)
                for r in batch:
                    self._latencies.append(done_at - r._enqueued_at)
            for i, r in enumerate(batch):
                r._result = denses[i]
                r._batch_size = n
                self._resolve(r)
