"""Serving layer: micro-batching engine + HTTP front end.

Tiny random model on CPU (same smoke geometry as the CLI tests). The
engine fixture uses a generous batching window so concurrency tests are
deterministic: requests enqueued back-to-back always coalesce.
"""

from __future__ import annotations

import io
import json
import threading

import numpy as np
import pytest

from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.pipeline import DepthCompletionPipeline
from depth_completion_tpu.serving import ServeRequest, ServingEngine
from depth_completion_tpu.serving.server import make_server

H, W = 48, 64


def _frame(seed: int = 0, h: int = H, w: int = W):
    rng = np.random.default_rng(seed)
    image = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    sparse = np.zeros((h, w, 1), np.float32)
    idx = rng.choice(h * w, size=40, replace=False)
    sparse.reshape(-1)[idx] = rng.uniform(2.0, 100.0, 40)
    return image, sparse


CALL_KWARGS = dict(
    max_depth=120.0,
    steps=2,
    resolution=64,
    norm="const",
    loss_funcs=("l1", "l2"),
)


@pytest.fixture(scope="module")
def engine():
    bundle = make_random_bundle(seed=0, vae_kind="tiny", dtype=np.float32)
    eng = ServingEngine(
        DepthCompletionPipeline(bundle),
        CALL_KWARGS,
        max_batch=4,
        max_delay_ms=1000.0,
        beta=0.9,
    )
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def httpd(engine):
    srv = make_server(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _post(srv, path: str, body: bytes):
    import http.client

    host, port = srv.server_address
    conn = http.client.HTTPConnection(host, port, timeout=300)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, data, headers


def _get(srv, path: str):
    import http.client

    host, port = srv.server_address
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _npz_payload(image, sparse) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, image=image, sparse=sparse)
    return buf.getvalue()


def test_engine_micro_batching(engine):
    """Three back-to-back submissions coalesce into ONE padded batch."""
    before = engine.stats()
    reqs = [
        engine.submit(ServeRequest(image=img, sparse=sp))
        for img, sp in (_frame(i) for i in range(3))
    ]
    outs = [r.wait(timeout=600) for r in reqs]
    for out in outs:
        assert out.shape == (H, W, 1) and np.isfinite(out).all()
    assert not np.allclose(outs[0], outs[1])  # distinct inputs -> distinct rows
    after = engine.stats()
    assert after["completed"] - before["completed"] == 3
    assert after["batches"] - before["batches"] == 1
    assert after["padded_rows"] - before["padded_rows"] == 1  # 3 -> pad to 4
    assert (H, W) in [tuple(g) for g in after["compiled_geometries"]]


def test_engine_batched_row_matches_solo(engine):
    """Static-batch padding must not perturb a request's own result: the
    same frame completed alone (padded 1->4) and inside a full batch of
    its own copies returns the same depth."""
    img, sp = _frame(7)
    solo = engine.complete(img, sp, timeout=600)
    reqs = [
        engine.submit(ServeRequest(image=img.copy(), sparse=sp.copy()))
        for _ in range(4)
    ]
    outs = [r.wait(timeout=600) for r in reqs]
    for out in outs:
        np.testing.assert_allclose(out, solo, rtol=1e-5, atol=1e-5)


def test_engine_session_carry(engine):
    img, sp = _frame(1)
    first = engine.complete(img, sp, session="cam0", timeout=600)
    assert engine.stats()["sessions_active"] >= 1
    second = engine.complete(img, sp, session="cam0", timeout=600)
    assert second.shape == first.shape and np.isfinite(second).all()
    # the carried latent changes the trajectory vs a fresh run
    fresh = engine.complete(img, sp, timeout=600)
    assert not np.allclose(second, fresh)
    assert engine.reset_session("cam0") is True
    assert engine.reset_session("cam0") is False


def test_engine_geometry_isolation(engine):
    """A second input geometry compiles its own program and both serve."""
    img, sp = _frame(2, h=W, w=H)  # transposed geometry
    out = engine.complete(img, sp, timeout=600)
    assert out.shape == (W, H, 1) and np.isfinite(out).all()
    geos = [tuple(g) for g in engine.stats()["compiled_geometries"]]
    assert (H, W) in geos and (W, H) in geos


def test_engine_empty_sparse_error(engine):
    img, sp = _frame(3)
    with pytest.raises(ValueError, match="No valid values found in mask"):
        engine.complete(img, np.zeros_like(sp), timeout=600)


def test_http_complete_and_health(httpd, engine):
    status, data = _get(httpd, "/healthz")
    assert status == 200 and json.loads(data)["status"] == "ok"

    img, sp = _frame(4)
    status, data, headers = _post(
        httpd, "/v1/complete", _npz_payload(img, sp)
    )
    assert status == 200, data
    dense = np.load(io.BytesIO(data))
    assert dense.shape == (H, W, 1) and np.isfinite(dense).all()
    assert float(headers["X-DCT-Latency-S"]) > 0
    assert int(headers["X-DCT-Batch-Size"]) >= 1

    status, data = _get(httpd, "/v1/stats")
    stats = json.loads(data)
    assert status == 200 and stats["completed"] >= 1
    assert "latency_s_p50" in stats


def test_http_concurrent_requests_batch(httpd, engine):
    """Concurrent HTTP posts ride one device batch."""
    results: dict[int, tuple] = {}

    def do(i: int) -> None:
        img, sp = _frame(10 + i)
        results[i] = _post(httpd, "/v1/complete", _npz_payload(img, sp))

    threads = [threading.Thread(target=do, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results.values())
    batch_sizes = [int(r[2]["X-DCT-Batch-Size"]) for r in results.values()]
    assert max(batch_sizes) >= 2  # at least two coalesced


def test_http_session_and_reset(httpd, engine):
    img, sp = _frame(5)
    status, _, _ = _post(
        httpd, "/v1/complete?session=vid1", _npz_payload(img, sp)
    )
    assert status == 200
    status, data, _ = _post(httpd, "/v1/session/vid1/reset", b"")
    assert status == 200 and json.loads(data)["dropped"] is True


def test_http_error_paths(httpd, engine):
    status, data, _ = _post(httpd, "/v1/complete", b"not an npz")
    assert status == 400 and b"bad npz" in data

    img, sp = _frame(6)
    status, data, _ = _post(
        httpd, "/v1/complete", _npz_payload(img, np.zeros_like(sp))
    )
    assert status == 422 and b"No valid values" in data

    status, data = _get(httpd, "/nope")
    assert status == 404


def test_serve_cli_surface():
    """The click command parses; geometry parser validates."""
    import click
    from click.testing import CliRunner

    from depth_completion_tpu.cli.serve import _parse_geometry, main

    res = CliRunner().invoke(main, ["--help"])
    assert res.exit_code == 0
    for flag in ("--max-batch", "--max-delay-ms", "--warmup", "--session-ttl"):
        assert flag in res.output

    assert _parse_geometry("480x640") == (480, 640)
    with pytest.raises(click.BadParameter):
        _parse_geometry("480")


def test_engine_rejects_invalid_sparse_at_admission(engine):
    """A sparse map with no points > 0 (all-zero OR negative-only) is
    rejected in submit(), before it can poison a shared micro-batch."""
    img, sp = _frame(8)
    before = engine.stats()["requests"]
    with pytest.raises(ValueError, match="No valid values found in mask"):
        engine.submit(ServeRequest(image=img, sparse=np.zeros_like(sp)))
    with pytest.raises(ValueError, match="No valid values found in mask"):
        engine.submit(ServeRequest(image=img, sparse=-np.abs(sp) - 1.0))
    assert engine.stats()["requests"] == before  # nothing was enqueued


def test_engine_rejects_degenerate_range_at_admission():
    """A constant-valued sparse frame under minmax normalization is
    rejected in submit() (degenerate range; mirrors the pipeline guard)."""
    class _Pipe:
        def __call__(self, images, sparses, **k):
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0, norm="minmax"), max_batch=1
    )
    try:
        img, sp = _frame(11)
        const_sp = np.where(sp > 0, 7.0, 0.0).astype(np.float32)
        with pytest.raises(ValueError, match="Degenerate sparse depth range"):
            eng.submit(ServeRequest(image=img, sparse=const_sp))
        # const normalization accepts the same frame
        eng2 = ServingEngine(
            _Pipe(), dict(max_depth=120.0, norm="const"), max_batch=1
        )
        try:
            eng2.complete(img, const_sp, timeout=30)
        finally:
            eng2.shutdown()
    finally:
        eng.shutdown()


def _fake_pipe_result(images):
    n, h, w = images.shape[:3]
    return (
        np.zeros((n, h, w, 1), np.float32),
        np.zeros((n, 4, 4, 4), np.float32),
    )


def test_engine_session_sweep_expired():
    """Expired carry latents are dropped for ALL session ids, not only
    re-used keys — a stream of fresh ids must not grow memory forever."""
    import time

    class _Pipe:
        def __call__(self, images, sparses, **k):
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=1, session_ttl_s=1.0
    )
    try:
        img, sp = _frame(9)
        eng.complete(img, sp, session="s1", timeout=30)
        eng.complete(img, sp, session="s2", timeout=30)
        assert eng.stats()["sessions_active"] == 2
        time.sleep(1.1)  # let both sessions expire
        eng.complete(img, sp, timeout=30)  # any round triggers the sweep
        deadline = time.monotonic() + 5
        while (
            eng.stats()["sessions_active"] > 0
            and time.monotonic() < deadline
        ):
            time.sleep(0.01)
        assert eng.stats()["sessions_active"] == 0
    finally:
        eng.shutdown()


def test_engine_backlog_priority():
    """A minority-geometry request deferred out of a batch round is served
    BEFORE same-geometry requests that arrived after it (re-queueing
    leftovers at the queue tail starved it under sustained load)."""
    entered = threading.Event()
    release = threading.Event()
    calls: list[tuple[int, int]] = []

    class _Pipe:
        def __call__(self, images, sparses, **k):
            calls.append(tuple(images.shape[1:3]))
            if len(calls) == 1:
                entered.set()
                release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=2, max_delay_ms=200.0
    )
    try:
        img_a, sp_a = _frame(0)
        img_b, sp_b = _frame(1, h=W, w=H)  # transposed geometry
        reqs = [eng.submit(ServeRequest(image=img_a, sparse=sp_a))]
        assert entered.wait(10)  # worker busy; the rest queue deterministically
        reqs.append(eng.submit(ServeRequest(image=img_a, sparse=sp_a)))  # A2
        reqs.append(eng.submit(ServeRequest(image=img_b, sparse=sp_b)))  # B1
        reqs.append(eng.submit(ServeRequest(image=img_a, sparse=sp_a)))  # A3
        reqs.append(eng.submit(ServeRequest(image=img_a, sparse=sp_a)))  # A4
        release.set()
        for r in reqs:
            r.wait(30)
        idx_b = calls.index((W, H))
        idx_a_last = max(i for i, g in enumerate(calls) if g == (H, W))
        assert idx_b < idx_a_last, calls  # B1 must not be starved behind A4
    finally:
        release.set()
        eng.shutdown()


def test_engine_batch_buckets():
    """A lone request runs the bucket-1 program (no padded rows); a
    coalesced batch pads to the smallest bucket that fits; warmup
    compiles every bucket."""
    entered = threading.Event()
    release = threading.Event()
    batch_dims: list[int] = []

    carry_calls: list[int] = []

    class _Pipe:
        def __call__(self, images, sparses, **k):
            batch_dims.append(images.shape[0])
            if "pred_latents_prev" in k:
                carry_calls.append(images.shape[0])
            if len(batch_dims) == 1:  # only the first call blocks
                entered.set()
                release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=4, max_delay_ms=200.0
    )
    try:
        assert eng.batch_buckets == (1, 4)
        img, sp = _frame(0)
        # lone request: worker picks it up alone -> bucket 1, blocks in pipe
        first = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)
        # three enqueued while blocked -> coalesce -> bucket 4 (1 padded)
        rest = [
            eng.submit(ServeRequest(image=img, sparse=sp)) for _ in range(3)
        ]
        release.set()
        first.wait(30)
        for r in rest:
            r.wait(30)
        assert batch_dims == [1, 4]
        stats = eng.stats()
        assert stats["padded_rows"] == 1
        progs = [tuple(p) for p in stats["compiled_programs"]]
        assert (H, W, 1) in progs and (H, W, 4) in progs
        # warmup compiles every bucket for the geometry, plus the
        # session-carry variant (batch 1 with pred_latents_prev) so the
        # second frame of the first live session never compiles cold on
        # the compute thread
        batch_dims.clear()
        eng.warmup([(H, W)])
        assert batch_dims == [1, 4, 1]
        assert carry_calls == [1]
    finally:
        release.set()
        eng.shutdown()


def test_engine_cancel_skips_device_work():
    """A request cancelled while queued (e.g. its HTTP client timed out)
    is reaped by the worker without a pipeline call."""
    entered = threading.Event()
    release = threading.Event()
    calls = []

    class _Pipe:
        def __call__(self, images, sparses, **k):
            calls.append(images.shape[0])
            if len(calls) == 1:
                entered.set()
                release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(_Pipe(), dict(max_depth=120.0), max_batch=1)
    try:
        img, sp = _frame(0)
        first = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)
        doomed = eng.submit(ServeRequest(image=img, sparse=sp))
        tail = eng.submit(ServeRequest(image=img, sparse=sp))
        doomed.cancel()
        release.set()
        first.wait(30)
        tail.wait(30)
        with pytest.raises(RuntimeError, match="cancelled"):
            doomed.wait(10)
        assert eng.stats()["cancelled"] == 1
        assert len(calls) == 2  # first + tail; doomed never hit the pipe
    finally:
        release.set()
        eng.shutdown()


def test_http_engine_error_returns_500():
    """Unexpected engine exceptions surface as HTTP 500, not a dropped
    connection (the handler used to re-raise and kill its thread)."""

    class _Boom:
        def __call__(self, images, sparses, **k):
            raise RuntimeError("device exploded")

    eng = ServingEngine(_Boom(), dict(max_depth=120.0), max_batch=1)
    srv = make_server(eng, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img, sp = _frame(7)
        status, data, _ = _post(srv, "/v1/complete", _npz_payload(img, sp))
        assert status == 500 and b"device exploded" in data
    finally:
        srv.shutdown()
        eng.shutdown()


def test_engine_load_shedding():
    """Beyond max_queue PENDING requests (admitted and unresolved —
    in-flight, queued, or worker-deferred), submit() sheds with
    OverloadedError (HTTP 503 at the server layer); slots free as
    requests resolve."""
    from depth_completion_tpu.serving import OverloadedError

    entered = threading.Event()
    release = threading.Event()

    class _BlockingPipe:
        def __call__(self, images, sparses, **k):
            entered.set()
            release.wait(60)
            n = images.shape[0]
            return np.zeros((n, H, W, 1), np.float32), np.zeros(
                (n, 4, 4, 4), np.float32
            )

    eng = ServingEngine(
        _BlockingPipe(), dict(max_depth=120.0), max_batch=1, max_queue=2
    )
    try:
        img, sp = _frame(0)
        first = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)  # worker is now inside the pipe call
        queued = eng.submit(ServeRequest(image=img, sparse=sp))  # pending 2
        with pytest.raises(OverloadedError, match="queue full"):
            eng.submit(ServeRequest(image=img, sparse=sp))
        assert eng.stats()["rejected"] == 1
        assert eng.stats()["pending"] == 2
        release.set()
        first.wait(30)
        queued.wait(30)
        # resolved requests release their admission slots
        deadline = __import__("time").monotonic() + 5
        while eng.stats()["pending"] and __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.01)
        assert eng.stats()["pending"] == 0
        eng.complete(img, sp, timeout=30)  # admitted again
    finally:
        release.set()
        eng.shutdown()


def test_engine_pending_counts_backlog():
    """Worker-deferred (minority-geometry) requests still hold admission
    slots: total pending work cannot exceed max_queue even though they
    left the queue for the worker-local backlog."""
    from depth_completion_tpu.serving import OverloadedError

    entered = threading.Event()
    release = threading.Event()

    class _Pipe:
        def __call__(self, images, sparses, **k):
            entered.set()
            release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(),
        dict(max_depth=120.0),
        max_batch=2,
        max_delay_ms=2000.0,  # wide window: b is deterministically deferred
        max_queue=3,
    )
    try:
        img_a, sp_a = _frame(0)
        img_b, sp_b = _frame(1, h=W, w=H)  # minority geometry
        # worker takes `first`, then collects batchmates for its geometry:
        # b is popped and deferred to the backlog, a2 fills the batch, the
        # pipe call blocks. Now qsize()==0, backlog==[b], in-flight==2.
        first = eng.submit(ServeRequest(image=img_a, sparse=sp_a))
        b_req = eng.submit(ServeRequest(image=img_b, sparse=sp_b))
        a2 = eng.submit(ServeRequest(image=img_a, sparse=sp_a))
        assert entered.wait(10)
        assert eng.stats()["pending"] == 3
        # the old qsize() gate saw 0 here and would have over-admitted
        with pytest.raises(OverloadedError, match="queue full"):
            eng.submit(ServeRequest(image=img_a, sparse=sp_a))
        release.set()
        for r in (first, b_req, a2):
            r.wait(30)
    finally:
        release.set()
        eng.shutdown()


def test_engine_round_robin_across_geometries():
    """A sustained majority-geometry stream cannot head-of-line block a
    minority geometry: batch rounds alternate across non-empty geometry
    queues (per-geometry queues + round-robin dispatch)."""
    entered = threading.Event()
    release = threading.Event()
    calls: list[tuple[int, int]] = []

    class _Pipe:
        def __call__(self, images, sparses, **k):
            calls.append(tuple(images.shape[1:3]))
            if len(calls) == 1:
                entered.set()
                release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=2, max_delay_ms=5.0
    )
    try:
        img_a, sp_a = _frame(0)
        img_b, sp_b = _frame(1, h=W, w=H)
        first = eng.submit(ServeRequest(image=img_a, sparse=sp_a))
        assert entered.wait(10)
        # 4 more A's and 2 B's while the worker is blocked
        reqs = [
            eng.submit(ServeRequest(image=img_a, sparse=sp_a))
            for _ in range(4)
        ] + [
            eng.submit(ServeRequest(image=img_b, sparse=sp_b))
            for _ in range(2)
        ]
        release.set()
        first.wait(30)
        for r in reqs:
            r.wait(30)
        # batches after the first: A-pair, B-pair, A-pair (round-robin) —
        # the B batch must not be last
        assert calls[0] == (H, W)
        assert (W, H) in calls[1:3], calls
    finally:
        release.set()
        eng.shutdown()


def test_pipeline_lru_program_cache():
    """max_programs bounds live compiled programs with LRU eviction; an
    evicted signature recompiles on next use and stays correct."""
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    bundle = make_random_bundle(seed=0, vae_kind="tiny", dtype=np.float32)
    pipe = DepthCompletionPipeline(bundle, max_programs=2)
    kw = dict(CALL_KWARGS)
    del kw["max_depth"]

    img_a, sp_a = _frame(0)                 # 48x64
    img_b, sp_b = _frame(1, h=W, w=H)       # 64x48
    img_c, sp_c = _frame(2, h=32, w=48)     # 32x48
    out_a1, _ = pipe(img_a[None], sp_a[None], 120.0, **kw)
    assert len(pipe.program_keys()) == 1
    pipe(img_b[None], sp_b[None], 120.0, **kw)
    assert len(pipe.program_keys()) == 2
    pipe(img_c[None], sp_c[None], 120.0, **kw)  # evicts A (oldest)
    keys = pipe.program_keys()
    assert len(keys) == 2
    assert not any(k[1][1:3] == (48, 64) for k in keys), keys
    # evicted signature recompiles and reproduces the original result
    out_a2, _ = pipe(img_a[None], sp_a[None], 120.0, **kw)
    np.testing.assert_allclose(
        np.asarray(out_a1), np.asarray(out_a2), rtol=1e-5, atol=1e-5
    )
    # LRU order: A is newest now; touching B keeps it alive over C
    pipe(img_b[None], sp_b[None], 120.0, **kw)
    pipe(img_a[None], sp_a[None], 120.0, **kw)
    assert len(pipe.program_keys()) == 2


def test_engine_warmup_parallel():
    """warmup(parallel=N) compiles the same program set as the serial
    path (every bucket + the carry variant per geometry) with jobs
    genuinely overlapping in threads."""
    import time as _time

    calls: list[tuple[int, bool]] = []
    inflight = [0]
    peak = [0]
    lock = threading.Lock()

    class _Pipe:
        def __call__(self, images, sparses, **k):
            with lock:
                inflight[0] += 1
                peak[0] = max(peak[0], inflight[0])
                calls.append((images.shape[0], "pred_latents_prev" in k))
            _time.sleep(0.2)  # hold the slot so overlap is observable
            with lock:
                inflight[0] -= 1
            return _fake_pipe_result(images)

    eng = ServingEngine(_Pipe(), dict(max_depth=120.0), max_batch=4)
    try:
        eng.warmup([(H, W), (W, H)], parallel=3)
        assert eng.warm
        # per geometry: bucket 1, bucket 4, and the batch-1 carry variant
        assert sorted(calls) == sorted(
            [(1, False), (4, False), (1, True)] * 2
        )
        assert peak[0] > 1, "parallel warmup jobs never overlapped"
    finally:
        eng.shutdown()


def test_engine_tiered_warmup_promotes():
    """Tiered warmup: traffic flows on tier-0 programs while full-effort
    programs compile in the background; each signature flips to the full
    pipe as it lands, and tier-0 is dropped once all are promoted."""
    import time as _time

    tier0_calls: list[tuple[int, bool]] = []
    full_calls: list[tuple[int, bool]] = []
    promote_gate = threading.Event()  # holds the background full compiles

    class _FullPipe:
        def __call__(self, images, sparses, **k):
            full_calls.append((images.shape[0], "pred_latents_prev" in k))
            promote_gate.wait(60)
            return _fake_pipe_result(images)

    class _Tier0Pipe:
        def __call__(self, images, sparses, **k):
            tier0_calls.append((images.shape[0], "pred_latents_prev" in k))
            return _fake_pipe_result(images)

    eng = ServingEngine(_FullPipe(), dict(max_depth=120.0), max_batch=2)
    eng._make_tier0_pipe = lambda effort: _Tier0Pipe()
    try:
        eng.warmup([(H, W)], tiered=True)
        # tier-0 warmed every bucket + the carry variant; warmup returned
        # without waiting for any full-effort compile
        assert sorted(tier0_calls) == sorted(
            [(1, False), (2, False), (1, True)]
        )
        st = eng.stats()
        assert st.get("tier0_active") is True
        assert st.get("tier_promoted") == "0/3"
        # live traffic during promotion dispatches to tier-0
        img, sp = _frame(0)
        n0 = len(tier0_calls)
        out = eng.complete(img, sp, timeout=30)
        assert out.shape == (H, W, 1)
        assert len(tier0_calls) == n0 + 1
        # release the background compiles; tier-0 drops when all promote
        promote_gate.set()
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            with eng._tier_lock:
                if eng._tier0_pipe is None:
                    break
            _time.sleep(0.05)
        with eng._tier_lock:
            assert eng._tier0_pipe is None
        # traffic now takes the full pipe
        n_full = len(full_calls)
        eng.complete(img, sp, timeout=30)
        assert len(full_calls) == n_full + 1
        assert len(tier0_calls) == n0 + 1  # tier-0 saw nothing new
    finally:
        promote_gate.set()
        eng.shutdown()


def test_pipeline_lru_thread_safety():
    """Concurrent callers hammering the LRU program cache (the parallel
    warmup path) never corrupt it: the bound holds and every caller gets
    a working program."""
    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    pipe = DepthCompletionPipeline.__new__(DepthCompletionPipeline)
    pipe.max_programs = 3
    from collections import OrderedDict

    pipe._programs = OrderedDict()
    pipe._programs_lock = threading.Lock()

    errors: list[Exception] = []

    def worker(seed: int) -> None:
        rng = np.random.default_rng(seed)
        try:
            for _ in range(200):
                key = ("sample", int(rng.integers(0, 8)))
                fn = pipe._lru_program(key, lambda: (lambda: key))
                assert callable(fn)
                assert len(pipe.program_keys()) <= 3
        except Exception as exc:  # surfaced after join
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not errors, errors
    assert len(pipe.program_keys()) <= 3


def test_http_timeout_returns_504():
    """A client-side wait timeout is 504 (work may still complete), NOT
    503 (load shedding, retry-now) — load balancers treat them differently."""
    entered = threading.Event()
    release = threading.Event()

    class _SlowPipe:
        def __call__(self, images, sparses, **k):
            entered.set()
            release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(_SlowPipe(), dict(max_depth=120.0), max_batch=1)
    srv = make_server(eng, host="127.0.0.1", port=0, request_timeout_s=0.2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img, sp = _frame(0)
        status, data, _ = _post(srv, "/v1/complete", _npz_payload(img, sp))
        assert status == 504 and b"timed out" in data
    finally:
        release.set()
        srv.shutdown()
        eng.shutdown()


def test_engine_session_keeps_fifo_slot():
    """Batch collection stops at a session request instead of jumping past
    it: [plain, session, plain] on one geometry runs as three batches in
    arrival order (sessions run alone; later plain requests must not
    overtake the session frame)."""
    entered = threading.Event()
    release = threading.Event()
    batches: list[tuple[int, str | None]] = []

    class _Pipe:
        def __call__(self, images, sparses, **k):
            batches.append(
                (images.shape[0], "carry" if "pred_latents_prev" in k else None)
            )
            if len(batches) == 1:
                entered.set()
                release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=4, max_delay_ms=50.0
    )
    try:
        img, sp = _frame(0)
        first = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)
        plain_a = eng.submit(ServeRequest(image=img, sparse=sp))
        sess = eng.submit(ServeRequest(image=img, sparse=sp, session="v1"))
        plain_b = eng.submit(ServeRequest(image=img, sparse=sp))
        release.set()
        for r in (first, plain_a, sess, plain_b):
            r.wait(30)
        # batch 2 = [plain_a] (stops at the session head), batch 3 = [sess]
        # alone, batch 4 = [plain_b]
        assert [b[0] for b in batches] == [1, 1, 1, 1], batches
        assert eng.stats()["batches"] == 4
    finally:
        release.set()
        eng.shutdown()


# ---------------------------------------------------------------- round 5:
# transient-error resilience (VERDICT r4 #5b) and promotion hardening
# (VERDICT r4 #5a + ADVICE r4)


def test_engine_batch_retry_on_transient_dispatch_error():
    """A pipeline call that fails once with a backend error and then works
    (the tunnel-hiccup scenario) completes the batch on the bounded retry
    instead of failing every waiter."""
    calls = []

    class _FlakyPipe:
        def __call__(self, images, sparses, **k):
            calls.append(images.shape[0])
            if len(calls) == 1:
                raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
            return _fake_pipe_result(images)

    eng = ServingEngine(_FlakyPipe(), dict(max_depth=120.0), max_batch=2)
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        out = eng.complete(img, sp, timeout=30)
        assert out.shape == (H, W, 1)
        assert calls == [1, 1]
        st = eng.stats()
        assert st["retried_batches"] == 1
        assert st["errors"] == 0
    finally:
        eng.shutdown()


def test_engine_batch_retry_on_materialize_error():
    """On async backends a transient device error surfaces at result
    materialization (the finisher's np.asarray), not at dispatch: the
    batch is requeued to the compute thread once and completes."""

    class _Poisoned:
        """Array-like whose materialization raises (async device failure)."""

        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    calls = []

    class _FlakyPipe:
        def __call__(self, images, sparses, **k):
            calls.append(images.shape[0])
            if len(calls) == 1:
                n, h, w = images.shape[:3]
                return _Poisoned(), np.zeros((n, 4, 4, 4), np.float32)
            return _fake_pipe_result(images)

    eng = ServingEngine(_FlakyPipe(), dict(max_depth=120.0), max_batch=2)
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        out = eng.complete(img, sp, timeout=30)
        assert out.shape == (H, W, 1)
        assert calls == [1, 1]
        assert eng.stats()["retried_batches"] == 1
        assert eng.stats()["errors"] == 0
    finally:
        eng.shutdown()


def test_engine_deterministic_error_fails_after_one_retry():
    """A persistent error still fails the batch — exactly one retry, no
    infinite loop, error surfaced to the waiter."""
    calls = []

    class _DeadPipe:
        def __call__(self, images, sparses, **k):
            calls.append(1)
            raise RuntimeError("shape mismatch: deterministic bug")

    eng = ServingEngine(_DeadPipe(), dict(max_depth=120.0), max_batch=1)
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        with pytest.raises(RuntimeError, match="deterministic bug"):
            eng.complete(img, sp, timeout=30)
        assert len(calls) == 2  # original + one bounded retry
        assert eng.stats()["errors"] == 1
        assert eng.stats()["retried_batches"] == 1
    finally:
        eng.shutdown()


def test_engine_materialize_retry_restores_session_carry():
    """A failed session dispatch must not leave the poisoned latents as the
    session's carry: the retry restores the previous carry state so the
    redispatch (and any later frame) chains off a valid latent."""
    seen_carries = []

    class _Poisoned:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("transient")

    calls = []

    class _FlakyPipe:
        def __call__(self, images, sparses, **k):
            calls.append(1)
            seen_carries.append(k.get("pred_latents_prev"))
            if len(calls) == 2:  # fail the SECOND session frame once
                n = images.shape[0]
                return _Poisoned(), np.full((n, 4, 4, 4), 99.0, np.float32)
            n = images.shape[0]
            return (
                np.zeros((n, H, W, 1), np.float32),
                np.full((n, 4, 4, 4), float(len(calls)), np.float32),
            )

    eng = ServingEngine(_FlakyPipe(), dict(max_depth=120.0), max_batch=1)
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        eng.complete(img, sp, session="v", timeout=30)  # call 1: carry=None
        eng.complete(img, sp, session="v", timeout=30)  # call 2 fails -> retry
        assert len(calls) == 3
        assert seen_carries[0] is None
        # both the failed attempt and its retry must chain off call 1's
        # latents (value 1.0), NOT the poisoned 99.0 result
        assert float(np.asarray(seen_carries[1])[0, 0, 0, 0]) == 1.0
        assert float(np.asarray(seen_carries[2])[0, 0, 0, 0]) == 1.0
    finally:
        eng.shutdown()


def test_tier_promotion_retries_failed_signature():
    """A signature whose full-effort compile fails transiently is retried
    (bounded) instead of being pinned to tier-0 for the process lifetime;
    once every signature promotes, tier-0 drops."""
    import time as _time

    full_calls: list[int] = []
    fail_once = {"done": False}

    class _FullPipe:
        def __call__(self, images, sparses, **k):
            full_calls.append(images.shape[0])
            if not fail_once["done"]:
                fail_once["done"] = True
                raise RuntimeError("transient compile-service error")
            return _fake_pipe_result(images)

    class _Tier0Pipe:
        def __call__(self, images, sparses, **k):
            return _fake_pipe_result(images)

    eng = ServingEngine(_FullPipe(), dict(max_depth=120.0), max_batch=2)
    eng._make_tier0_pipe = lambda effort: _Tier0Pipe()
    eng.promote_backoff_s = 0.01
    try:
        eng.warmup([(H, W)], tiered=True)
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            with eng._tier_lock:
                if eng._tier0_pipe is None:
                    break
            _time.sleep(0.05)
        with eng._tier_lock:
            assert eng._tier0_pipe is None, "failed signature never promoted"
            assert len(eng._full_ready) == 3
    finally:
        eng.shutdown()


def test_tier_promotion_parallel_overlaps():
    """warmup(tiered=True, parallel=N) promotes full-effort programs
    concurrently (VERDICT r4 #5a): distinct signatures overlap instead of
    compiling one at a time."""
    import time as _time

    inflight = [0]
    peak = [0]
    lock = threading.Lock()

    class _FullPipe:
        def __call__(self, images, sparses, **k):
            with lock:
                inflight[0] += 1
                peak[0] = max(peak[0], inflight[0])
            _time.sleep(0.2)
            with lock:
                inflight[0] -= 1
            return _fake_pipe_result(images)

    class _Tier0Pipe:
        def __call__(self, images, sparses, **k):
            return _fake_pipe_result(images)

    eng = ServingEngine(_FullPipe(), dict(max_depth=120.0), max_batch=4)
    eng._make_tier0_pipe = lambda effort: _Tier0Pipe()
    try:
        eng.warmup([(H, W), (W, H)], parallel=3, tiered=True)
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            with eng._tier_lock:
                if eng._tier0_pipe is None:
                    break
            _time.sleep(0.05)
        with eng._tier_lock:
            assert eng._tier0_pipe is None
        assert peak[0] > 1, "full-effort promotions never overlapped"
    finally:
        eng.shutdown()


def test_tier_promotion_exhausted_keeps_tier0():
    """A signature that NEVER promotes keeps serving from tier-0 (logged),
    and the tier-0 pipe is retained for it instead of being dropped."""
    import time as _time

    class _FullPipe:
        def __call__(self, images, sparses, **k):
            if images.shape[0] == 2:  # the bucket-2 signature never compiles
                raise RuntimeError("persistent compile failure")
            return _fake_pipe_result(images)

    tier0_calls: list[int] = []

    class _Tier0Pipe:
        def __call__(self, images, sparses, **k):
            tier0_calls.append(images.shape[0])
            return _fake_pipe_result(images)

    eng = ServingEngine(_FullPipe(), dict(max_depth=120.0), max_batch=2)
    eng._make_tier0_pipe = lambda effort: _Tier0Pipe()
    eng.promote_retries = 1
    eng.promote_backoff_s = 0.01
    try:
        eng.warmup([(H, W)], tiered=True)
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            with eng._tier_lock:
                if len(eng._full_ready) == 2:
                    break
            _time.sleep(0.05)
        _time.sleep(0.2)  # let the promotion thread finish its last pass
        with eng._tier_lock:
            assert eng._tier0_pipe is not None  # kept for the failed signature
            assert ((H, W), 2, False) not in eng._full_ready
        # a 2-row batch still serves — from tier-0
        img, sp = _frame(0)
        n0 = len(tier0_calls)
        reqs = [
            eng.submit(ServeRequest(image=img, sparse=sp)) for _ in range(2)
        ]
        for r in reqs:
            r.wait(30)
        assert len(tier0_calls) > n0
    finally:
        eng.shutdown()


def test_tiered_dispatch_detects_full_program_eviction():
    """With max_programs < warmed signatures, a promoted full program can
    be LRU-evicted while its key stays in _full_ready; dispatch must fall
    back to the still-warm tier-0 program instead of cold-compiling at
    full effort on the compute thread (ADVICE r4)."""
    full_calls: list[int] = []
    tier0_calls: list[int] = []

    class _FullPipe:
        max_programs = 1

        def __call__(self, images, sparses, **k):
            full_calls.append(images.shape[0])
            return _fake_pipe_result(images)

        def program_keys(self):
            # pretend only the bucket-2 program survived the LRU
            return [("sample", (2, H, W, 3), None, None)]

    class _Tier0Pipe:
        def __call__(self, images, sparses, **k):
            tier0_calls.append(images.shape[0])
            return _fake_pipe_result(images)

    eng = ServingEngine(_FullPipe(), dict(max_depth=120.0), max_batch=2)
    eng._make_tier0_pipe = lambda effort: _Tier0Pipe()
    try:
        img, sp = _frame(0)
        with eng._tier_lock:
            eng._tier0_pipe = _Tier0Pipe()
            eng._tier0_ready = {((H, W), 1, False), ((H, W), 2, False)}
            eng._full_ready = set(eng._tier0_ready)  # both "promoted"
        tier0 = eng._tier0_pipe
        # bucket-1 full program was evicted -> tier-0 serves it
        eng.complete(img, sp, timeout=30)
        assert len(tier0._calls if hasattr(tier0, "_calls") else tier0_calls) >= 1
        assert full_calls == []
        # bucket-2 program is alive -> full pipe serves it
        reqs = [
            eng.submit(ServeRequest(image=img, sparse=sp)) for _ in range(2)
        ]
        for r in reqs:
            r.wait(30)
        assert 2 in full_calls
    finally:
        eng.shutdown()


def test_warmup_carry_channels_follow_bundle():
    """The warmed carry signature derives its latent channel count from the
    bundle's VAE instead of hard-coding 4 (ADVICE r4): a 16-channel VAE
    must warm a 16-channel carry program."""

    class _Cfg:
        latent_channels = 16

    class _Vae:
        config = _Cfg()
        downsample_factor = 8

    class _Bundle:
        vae = _Vae()

    carry_shapes: list[tuple] = []

    class _Pipe:
        bundle = _Bundle()

        def __call__(self, images, sparses, **k):
            if "pred_latents_prev" in k:
                carry_shapes.append(np.asarray(k["pred_latents_prev"]).shape)
            return _fake_pipe_result(images)

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0, resolution=64), max_batch=2
    )
    try:
        eng.warmup([(H, W)])
        assert len(carry_shapes) == 1
        assert carry_shapes[0][-1] == 16, carry_shapes
    finally:
        eng.shutdown()


def test_engine_mixed_batch_retry_only_fresh():
    """A batch mixing an already-retried (requeued) request with a fresh
    one: on failure only the stale request fails; the fresh batchmate
    still gets its own bounded retry (round-5 review finding)."""
    calls = []
    entered = threading.Event()
    release = threading.Event()

    class _Pipe:
        def __call__(self, images, sparses, **k):
            calls.append(images.shape[0])
            if len(calls) == 1:  # blocker: succeed slowly
                entered.set()
                release.wait(60)
                return _fake_pipe_result(images)
            if len(calls) == 2:  # the mixed batch: transient failure
                raise RuntimeError("transient backend error")
            return _fake_pipe_result(images)  # the fresh request's retry

    eng = ServingEngine(
        _Pipe(), dict(max_depth=120.0), max_batch=2, max_delay_ms=200.0
    )
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        blocker = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)
        ra = eng.submit(ServeRequest(image=img, sparse=sp))
        ra._retried = True  # as if already requeued once
        rb = eng.submit(ServeRequest(image=img, sparse=sp))
        release.set()
        blocker.wait(30)
        with pytest.raises(RuntimeError, match="transient"):
            ra.wait(30)
        out = rb.wait(30)  # fresh batchmate survives via its own retry
        assert out.shape == (H, W, 1)
        assert calls == [1, 2, 1]  # blocker, failed pair, retried single
        assert eng.stats()["errors"] == 1
        assert eng.stats()["retried_batches"] == 1
    finally:
        release.set()
        eng.shutdown()


def test_requeue_batch_inserts_after_retried_front():
    """_requeue_batch must not jump a later-failed batch ahead of an
    earlier-failed one already requeued at the queue front (FIFO and
    session frame order would invert)."""
    entered = threading.Event()
    release = threading.Event()

    class _Pipe:
        def __call__(self, images, sparses, **k):
            entered.set()
            release.wait(60)
            return _fake_pipe_result(images)

    eng = ServingEngine(_Pipe(), dict(max_depth=120.0), max_batch=1)
    try:
        img, sp = _frame(0)
        blocker = eng.submit(ServeRequest(image=img, sparse=sp))
        assert entered.wait(10)
        ra = eng.submit(ServeRequest(image=img, sparse=sp))  # earlier retry
        ra._retried = True
        rb = eng.submit(ServeRequest(image=img, sparse=sp))  # later-failed
        geo = (H, W)
        with eng._cv:
            eng._queues[geo].remove(rb)  # as if collected then failed
        rb._retried = True
        eng._requeue_batch([rb], geo)
        with eng._cv:
            order = list(eng._queues[geo])
        assert order == [ra, rb], "later retry must slot AFTER earlier one"
    finally:
        release.set()
        eng.shutdown()


def test_finisher_restores_only_materializable_carry():
    """The finisher's session-carry restore validates prev_held: a good
    previous latent is reinstated; a poisoned one (an earlier in-flight
    dispatch that also failed) is dropped so the retry re-seeds instead
    of chaining off a dead buffer (round-5 review finding)."""
    import time as _time

    class _Poisoned:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("transient")

    class _Pipe:
        def __call__(self, images, sparses, **k):
            return _fake_pipe_result(images)

    eng = ServingEngine(_Pipe(), dict(max_depth=120.0), max_batch=1)
    eng.dispatch_retry_backoff_s = 0.0
    try:
        img, sp = _frame(0)
        geo = tuple(img.shape[:2])

        def feed(prev_held, session):
            req = ServeRequest(image=img, sparse=sp, session=session)
            req._retried = True  # exhausted: finisher fails, no requeue
            with eng._lock:
                eng._pending += 1
            eng._sessions[session] = (_Poisoned(), _time.monotonic())
            eng._finish.put(
                ([req], 1, 0, geo, _Poisoned(), session, prev_held)
            )
            with pytest.raises(RuntimeError):
                req.wait(10)

        good = (np.ones((1, 4, 4, 4), np.float32), _time.monotonic())
        feed(good, "good")
        deadline = _time.monotonic() + 5
        while _time.monotonic() < deadline and "good" not in eng._sessions:
            _time.sleep(0.01)
        with eng._lock:
            assert eng._sessions.get("good") == good  # reinstated

        feed((_Poisoned(), _time.monotonic()), "bad")
        deadline = _time.monotonic() + 5
        while _time.monotonic() < deadline and "bad" in eng._sessions:
            _time.sleep(0.01)
        with eng._lock:
            assert "bad" not in eng._sessions  # poisoned restore dropped
    finally:
        eng.shutdown()
