"""SolverService: microbatching serving front end (ilqr_tpu/serve.py).

CPU tests drive the vmap path (the fused path off-TPU is the Pallas
interpreter — covered by test_fused_solver.py, far too slow to serve).
Batching logic is tested deterministically via the autostart=False hooks;
the threaded integration test asserts correctness only (never timing).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.serve import SolverService
from ilqr_tpu.solver import solve

T = 40
CFG = SolverConfig(deriv_mode="analytic", max_iter=20)


def _service(**kw):
    model = get_model("double_integrator")
    return model, SolverService(
        model, di.default_params(), CFG, dt=0.05, horizon=T,
        max_batch=8, max_wait_ms=0.0, path="vmap", **kw)


def test_single_request_matches_direct_solve():
    model, svc = _service()
    with svc:
        x0 = np.array([1.0, -2.0, 0.3, 0.0], np.float32)
        sol = svc.solve(x0, timeout=120)
        ref = solve(model, di.default_params(), CFG, 0.05,
                    x0, np.zeros((T, model.m), np.float32))
        assert sol.us.shape == (T, model.m)          # batch axis stripped
        assert sol.xs.shape == (T + 1, model.n)
        np.testing.assert_allclose(
            float(sol.cost), float(ref.cost), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sol.us), np.asarray(ref.us), rtol=1e-4, atol=1e-5)


def test_coalescing_is_one_dispatch():
    # autostart=False: enqueue N requests, then run exactly one worker
    # step — all N must coalesce into a single batched solve.
    model, svc = _service(autostart=False)
    rng = np.random.default_rng(0)
    futs = [svc.submit(rng.normal(size=4).astype(np.float32))
            for _ in range(5)]
    assert svc._run_once(block=False)
    assert svc.stats["batches"] == 1
    assert svc.stats["lanes"] == 5
    assert svc.stats["requests"] == 5
    costs = [float(f.result(timeout=0).cost) for f in futs]
    assert np.all(np.isfinite(costs))


def test_lane_scatter_order():
    # distinct targets -> distinct costs; each future gets ITS lane back.
    model, svc = _service(autostart=False)
    x0s = [np.array([float(i + 1), 0.0, 0.0, 0.0], np.float32)
           for i in range(4)]
    futs = [svc.submit(x) for x in x0s]
    svc._run_once(block=False)
    for x0, f in zip(x0s, futs):
        ref = solve(model, di.default_params(), CFG, 0.05,
                    x0, np.zeros((T, model.m), np.float32))
        np.testing.assert_allclose(
            float(f.result(timeout=0).cost), float(ref.cost),
            rtol=1e-5, atol=1e-6)


def test_max_batch_splits_dispatches():
    model, svc = _service(autostart=False)
    rng = np.random.default_rng(1)
    futs = [svc.submit(rng.normal(size=4).astype(np.float32))
            for _ in range(11)]          # max_batch=8 -> 8 + 3
    svc._run_once(block=False)
    svc._run_once(block=False)
    assert svc.stats["batches"] == 2
    assert svc.stats["lanes"] == 11
    for f in futs:
        assert np.isfinite(float(f.result(timeout=0).cost))


def test_threaded_clients_all_get_answers():
    model, svc = _service()
    rng = np.random.default_rng(2)
    x0s = rng.normal(size=(12, 4)).astype(np.float32)
    results = [None] * len(x0s)

    def client(i):
        results[i] = svc.solve(x0s[i], timeout=300)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(x0s))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    svc.close()
    assert svc.stats["requests"] == 12
    assert svc.stats["lanes"] == 12
    for i, sol in enumerate(results):
        assert sol is not None
        ref = solve(model, di.default_params(), CFG, 0.05,
                    x0s[i], np.zeros((T, model.m), np.float32))
        np.testing.assert_allclose(
            float(sol.cost), float(ref.cost), rtol=1e-5, atol=1e-6)


def test_bad_shapes_and_closed_service():
    model, svc = _service(autostart=False)
    with pytest.raises(ValueError):
        svc.submit(np.zeros(3, np.float32))          # wrong n
    with pytest.raises(ValueError):
        svc.submit(np.zeros(4, np.float32),
                   np.zeros((T + 1, 1), np.float32))  # wrong T
    svc.close(timeout=1)
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(4, np.float32))


def test_cancelled_future_does_not_kill_worker():
    # A client that cancels its future (e.g. after a result(timeout)
    # expiry) must not crash delivery for the rest of the batch — the
    # worker claims futures before solving and skips cancelled ones.
    model, svc = _service(autostart=False)
    futs = [svc.submit(np.array([float(i), 0, 0, 0], np.float32))
            for i in range(3)]
    assert futs[1].cancel()
    assert svc._run_once(block=False)
    assert np.isfinite(float(futs[0].result(timeout=0).cost))
    assert np.isfinite(float(futs[2].result(timeout=0).cost))
    assert futs[1].cancelled()
    assert svc.stats["lanes"] == 2  # the cancelled lane never dispatched
    # an all-cancelled batch skips the solve entirely
    f = svc.submit(np.zeros(4, np.float32))
    assert f.cancel()
    assert svc._run_once(block=False)
    assert svc.stats["batches"] == 1


def test_close_returns_join_status_and_blocks_post_close_submit():
    model, svc = _service()
    assert svc.close() is True              # default: full drain
    assert svc.close() is True              # idempotent
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(4, np.float32))


def test_fused_path_fails_fast_on_unsupported_model():
    import dataclasses

    model = get_model("double_integrator")
    big_m = dataclasses.replace(model, name="m25", m=25)
    with pytest.raises(ValueError, match="m <= 24"):
        SolverService(big_m, di.default_params(), CFG, dt=0.05, horizon=T,
                      path="fused", autostart=False)
    no_soa = dataclasses.replace(model, name="nosoa", dynamics_soa=None)
    with pytest.raises(ValueError, match="SoA"):
        SolverService(no_soa, di.default_params(), CFG, dt=0.05, horizon=T,
                      path="fused", autostart=False)


def test_worker_crash_fails_queued_futures(monkeypatch):
    # An unexpected error OUTSIDE the solve (worker-loop level) must fail
    # queued futures rather than leaving callers hanging forever. The
    # worker deliberately re-raises after failing the futures; swallow the
    # excepthook here so pytest doesn't report the designed crash.
    seen = []
    monkeypatch.setattr(threading, "excepthook", lambda a: seen.append(a))
    model, svc = _service()

    def boom(batch):
        raise RuntimeError("collect exploded")

    svc._process = boom
    fut = svc.submit(np.zeros(4, np.float32))
    with pytest.raises(RuntimeError):
        fut.result(timeout=60)
    svc._worker.join(60)
    assert seen and seen[0].exc_type is RuntimeError


def test_solver_exception_propagates_to_all_futures():
    model, svc = _service(autostart=False)

    def boom(x0b, u0b):
        raise RuntimeError("kernel exploded")

    svc._solve = boom
    futs = [svc.submit(np.zeros(4, np.float32)) for _ in range(3)]
    svc._run_once(block=False)
    for f in futs:
        with pytest.raises(RuntimeError, match="kernel exploded"):
            f.result(timeout=0)


def test_packed_d2h_roundtrip_dtypes():
    """The single-transfer D2H pack bitcasts i32 leaves through f32;
    integer fields must come back bit-exact, and the packed path must
    actually be engaged (all solver output leaves are 32-bit)."""
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    cfg = SolverConfig(deriv_mode="analytic", max_iter=6)
    svc = SolverService(model, di.default_params(), cfg, 0.05, 12,
                        max_batch=4, path="vmap", autostart=False)
    assert svc._pack is not None, "packing should engage (32-bit leaves)"
    fut = svc.submit(np.array([0.5, -0.2, 0.0, 0.1], np.float32))
    assert svc._run_once(block=True)
    sol = fut.result(timeout=0)
    assert sol.iterations.dtype == np.int32
    assert 1 <= int(sol.iterations) <= 6
    assert sol.reason.dtype == np.int32
    assert int(sol.reason) in (1, 2, 3, 4)
    assert sol.xs.dtype == np.float32 and sol.xs.shape == (13, 4)
    svc.close()


def test_service_over_mesh():
    """Multi-device serving: the service dispatches each padded batch
    through the sharded solver over the 8-virtual-device CPU mesh; the
    per-request results must match the direct single-device solve."""
    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model, solve
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
    mesh = make_mesh()
    svc = SolverService(model, params, cfg, 0.05, 15, max_batch=8,
                        path="vmap", mesh=mesh, autostart=False)
    rng = np.random.default_rng(5)
    x0s = [rng.normal(size=4).astype(np.float32) for _ in range(3)]
    futs = [svc.submit(x) for x in x0s]
    assert svc._run_once(block=True)
    p32 = __import__("jax").tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    for x, f in zip(x0s, futs):
        s = f.result(timeout=0)
        ref = solve(model, p32, cfg, 0.05, jnp.asarray(x),
                    jnp.zeros((15, 2), jnp.float32))
        np.testing.assert_allclose(s.cost, np.asarray(ref.cost), rtol=1e-5)
    svc.close()


def test_service_mesh_validation():
    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    cfg = SolverConfig(deriv_mode="analytic")
    with pytest.raises(ValueError, match="divisible by the mesh"):
        SolverService(model, di.default_params(), cfg, 0.05, 10,
                      max_batch=9, path="vmap", mesh=make_mesh(),
                      autostart=False)


def test_fields_selective_payload():
    """fields=: the dispatch packs only the requested Solution leaves;
    unrequested fields come back None, requested ones match the full
    solve bit-for-bit."""
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=6)
    x0 = np.array([0.4, -0.1, 0.2, 0.0], np.float32)

    full = SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                         path="vmap", autostart=False)
    sel = SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                        path="vmap",
                        fields=("us", "cost", "iterations"),
                        autostart=False)
    assert sel._pack is not None  # packed path engaged with selection

    f_full, f_sel = full.submit(x0), sel.submit(x0)
    assert full._run_once(block=True) and sel._run_once(block=True)
    a, b = f_full.result(timeout=0), f_sel.result(timeout=0)
    np.testing.assert_array_equal(a.us, b.us)
    np.testing.assert_array_equal(a.cost, b.cost)
    assert int(a.iterations) == int(b.iterations)
    assert b.xs is None and b.K is None and b.k is None
    full.close(); sel.close()

    with pytest.raises(ValueError, match="unknown Solution fields"):
        SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                      path="vmap", fields=("nope",), autostart=False)


class TestWarmService:
    def _mk(self, **kw):
        from ilqr_tpu.models import double_integrator as _di

        model = get_model("double_integrator")
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        return model, _di.default_params(), cfg, SolverService(
            model, _di.default_params(), cfg, 0.05, 14, max_batch=4,
            path="vmap", autostart=False, **kw)

    def test_cold_lane_matches_cold_service(self):
        import numpy as np

        _, _, _, warm_svc = self._mk(warm=True)
        _, _, _, cold_svc = self._mk()
        x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
        fw, fc = warm_svc.submit(x0), cold_svc.submit(x0)
        assert warm_svc._run_once(block=True)
        assert cold_svc._run_once(block=True)
        a, b = fw.result(timeout=0), fc.result(timeout=0)
        np.testing.assert_array_equal(a.cost, b.cost)
        np.testing.assert_array_equal(a.us, b.us)
        warm_svc.close(); cold_svc.close()

    def test_warm_start_from_prev(self):
        import numpy as np

        _, _, _, svc = self._mk(warm=True)
        x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
        f1 = svc.submit(x0)
        assert svc._run_once(block=True)
        first = f1.result(timeout=0)
        # re-plan from a nearby state, warm-started from the solution
        f2 = svc.submit(x0 + np.float32(0.01), prev=first)
        assert svc._run_once(block=True)
        second = f2.result(timeout=0)
        assert np.isfinite(second.cost)
        # the warm replan should converge at least as fast as cold
        f3 = svc.submit(x0 + np.float32(0.01))
        assert svc._run_once(block=True)
        cold2 = f3.result(timeout=0)
        assert int(second.iterations) <= int(cold2.iterations)
        svc.close()

    def test_prev_validation(self):
        import numpy as np

        _, _, _, cold_svc = self._mk()
        _, _, _, warm_svc = self._mk(warm=True)
        x0 = np.zeros(4, np.float32)
        dummy = warm_svc.submit(x0)
        assert warm_svc._run_once(block=True)
        sol = dummy.result(timeout=0)
        with pytest.raises(ValueError, match="warm=True"):
            cold_svc.submit(x0, prev=sol)
        bad = sol._replace(K=None)
        with pytest.raises(ValueError, match="prev.K is None"):
            warm_svc.submit(x0, prev=bad)
        cold_svc.close(); warm_svc.close()


def test_submit_after_worker_crash_raises(monkeypatch):
    """A worker-loop crash closes the service (ADVICE r4): a submit()
    after the crash must raise 'closed' instead of enqueueing a request
    no worker will ever process (hanging the caller's future forever)."""
    seen = []
    monkeypatch.setattr(threading, "excepthook", lambda a: seen.append(a))
    model, svc = _service()

    def boom(batch):
        raise RuntimeError("worker exploded")

    svc._process = boom
    fut = svc.submit(np.zeros(4, np.float32))
    with pytest.raises(RuntimeError):
        fut.result(timeout=60)
    svc._worker.join(60)
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(np.zeros(4, np.float32))


def test_warm_service_over_mesh():
    """warm=True + mesh= (VERDICT r4 item 3): the MPC fleet re-plan
    dispatched through the sharded warm solver over the 8-virtual-device
    CPU mesh. Cold lanes (synthesized payload) and prev= warm lanes must
    both match the unsharded warm service."""
    from ilqr_tpu.parallel.mesh import make_mesh

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
    mk = lambda **kw: SolverService(  # noqa: E731
        model, params, cfg, 0.05, 14, max_batch=8, path="vmap",
        warm=True, autostart=False, **kw)
    mesh_svc = mk(mesh=make_mesh())
    flat_svc = mk()

    x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
    fm, ff = mesh_svc.submit(x0), flat_svc.submit(x0)
    assert mesh_svc._run_once(block=True)
    assert flat_svc._run_once(block=True)
    cold_m, cold_f = fm.result(timeout=0), ff.result(timeout=0)
    np.testing.assert_allclose(cold_m.cost, cold_f.cost, rtol=1e-6)
    np.testing.assert_allclose(cold_m.us, cold_f.us, rtol=1e-5, atol=1e-6)

    x1 = x0 + np.float32(0.01)
    fm2 = mesh_svc.submit(x1, prev=cold_m)
    ff2 = flat_svc.submit(x1, prev=cold_f)
    assert mesh_svc._run_once(block=True)
    assert flat_svc._run_once(block=True)
    warm_m, warm_f = fm2.result(timeout=0), ff2.result(timeout=0)
    np.testing.assert_allclose(warm_m.cost, warm_f.cost, rtol=1e-6)
    assert int(warm_m.iterations) == int(warm_f.iterations)
    mesh_svc.close(); flat_svc.close()


def test_eager_chunked_dispatch_for_wide_m(monkeypatch):
    """On TPU, vmap serving for m > MAX_STAGE_KERNEL_M routes through the
    host-driven iteration-chunked solve (the monolithic program can crash
    the TPU worker — BENCH_NOTES round 5). Exercised here by patching the
    backend check at construction; the chunked solve itself runs on CPU."""
    import jax as _jax

    from ilqr_tpu.batch import solve_batch_chunked
    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    params = tr.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=5, boxqp_mode="pn_fixed",
                       backward_kernel="xla", rollout_kernel="xla",
                       deriv_kernel="xla")
    with monkeypatch.context() as mp:
        mp.setattr(_jax, "default_backend", lambda: "tpu")
        svc = SolverService(model, params, cfg, 0.05, 8, max_batch=4,
                            path="vmap", autostart=False)
        with pytest.raises(ValueError, match="chunked warm dispatch"):
            SolverService(model, params, cfg, 0.05, 8, max_batch=4,
                          path="vmap", warm=True, autostart=False)
        from ilqr_tpu.aot import compile_solver
        with pytest.raises(ValueError, match="cannot be AOT-compiled"):
            compile_solver(model, params, cfg, 0.05, 4, 8, path="vmap")
    rng = np.random.default_rng(9)
    x0 = (0.2 * rng.normal(size=6)).astype(np.float32)
    fut = svc.submit(x0)
    assert svc._run_once(block=True)
    s = fut.result(timeout=0)
    ref = solve_batch_chunked(model, params, cfg, 0.05,
                              jnp.asarray(x0)[None],
                              jnp.zeros((1, 8, 12), jnp.float32))
    np.testing.assert_allclose(s.cost, np.asarray(ref.cost)[0], rtol=1e-6)
    svc.close()


def test_solve_batch_auto_chunk_guard_under_jit(monkeypatch):
    """iter_chunk='auto' in the dangerous TPU region must raise under an
    outer jit trace instead of compiling the worker-killing program."""
    import jax as _jax

    from ilqr_tpu.batch import solve_batch
    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    params = tr.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=40, boxqp_mode="pn_fixed",
                       backward_kernel="xla", rollout_kernel="xla",
                       deriv_kernel="xla")
    with monkeypatch.context() as mp:
        mp.setattr(_jax, "default_backend", lambda: "tpu")
        fn = jax.jit(lambda x, u: solve_batch(model, params, cfg, 0.05,
                                              x, u))
        with pytest.raises(ValueError, match="iteration chunks"):
            fn(jnp.zeros((4, 6), jnp.float32),
               jnp.zeros((4, 8, 12), jnp.float32))


class TestResidentFleet:
    """Device-resident warm serving (round 5): controller state lives in
    device slots; requests carry only (x0, slot)."""

    def _mk(self, slots=6, **kw):
        model = get_model("double_integrator")
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        return model, di.default_params(), cfg, SolverService(
            model, di.default_params(), cfg, 0.05, 14, max_batch=4,
            path="vmap", warm=True, resident_slots=slots,
            autostart=False, **kw)

    def test_cold_matches_cold_service(self):
        """First use of a slot == a cold solve from zero controls."""
        model, params, cfg, res = self._mk()
        cold = SolverService(model, params, cfg, 0.05, 14, max_batch=4,
                             path="vmap", autostart=False)
        x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
        fr, fc = res.submit(x0, slot=3), cold.submit(x0)
        assert res._run_once(block=True)
        assert cold._run_once(block=True)
        a, b = fr.result(timeout=0), fc.result(timeout=0)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-6)
        np.testing.assert_allclose(a.us, b.us, rtol=1e-5, atol=1e-6)
        assert a.xs is None and a.K is None  # stays on device
        res.close(); cold.close()

    def test_warm_matches_prev_service(self):
        """Second use of a slot == the explicit prev= warm replan."""
        model, params, cfg, res = self._mk()
        prv = SolverService(model, params, cfg, 0.05, 14, max_batch=4,
                            path="vmap", warm=True, autostart=False)
        x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
        fr, fp = res.submit(x0, slot=0), prv.submit(x0)
        assert res._run_once(block=True) and prv._run_once(block=True)
        first_r, first_p = fr.result(timeout=0), fp.result(timeout=0)
        x1 = x0 + np.float32(0.01)
        fr2 = res.submit(x1, slot=0)
        fp2 = prv.submit(x1, prev=first_p)
        assert res._run_once(block=True) and prv._run_once(block=True)
        a, b = fr2.result(timeout=0), fp2.result(timeout=0)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-6)
        assert int(a.iterations) == int(b.iterations)
        res.close(); prv.close()

    def test_slot_isolation_and_dup_deferral(self):
        """Different slots are independent; duplicate slots in one batch
        defer (both futures still resolve)."""
        model, params, cfg, res = self._mk()
        x0 = np.array([0.5, 0.2, 0.0, 0.0], np.float32)
        f1 = res.submit(x0, slot=1)
        f2 = res.submit(x0 + np.float32(0.2), slot=2)
        f3 = res.submit(x0 + np.float32(0.1), slot=1)  # dup of slot 1
        assert res._run_once(block=True)   # solves slots {1,2}, defers f3
        assert f1.done() and f2.done() and not f3.done()
        assert res._run_once(block=False)  # the deferred dup (now warm)
        assert f3.done()
        assert np.isfinite(f3.result(timeout=0).cost)
        res.close()

    def test_validation(self):
        model, params, cfg, res = self._mk()
        x0 = np.zeros(4, np.float32)
        with pytest.raises(ValueError, match="pass slot="):
            res.submit(x0)
        with pytest.raises(ValueError, match="slot must be in"):
            res.submit(x0, slot=99)
        with pytest.raises(ValueError, match="prev= does not apply"):
            res.submit(x0, slot=0, prev="x")
        with pytest.raises(ValueError, match="u0= does not apply"):
            res.submit(x0, np.zeros((14, 2), np.float32), slot=0)
        res.close()
        _, _, _, cold = (*[None] * 3, SolverService(
            model, params, cfg, 0.05, 14, max_batch=4, path="vmap",
            autostart=False))
        with pytest.raises(ValueError, match="requires a resident"):
            cold.submit(x0, slot=0)
        cold.close()
        with pytest.raises(ValueError, match="requires warm=True"):
            SolverService(model, params, cfg, 0.05, 14, max_batch=4,
                          path="vmap", resident_slots=4, autostart=False)
        with pytest.raises(ValueError, match="cannot return"):
            SolverService(model, params, cfg, 0.05, 14, max_batch=4,
                          path="vmap", warm=True, resident_slots=4,
                          fields=("us", "xs"), autostart=False)


class TestResidentMesh:
    """resident_slots + mesh=: the fleet state sharded over the
    8-virtual-device CPU mesh by slot (slot s on device s % D)."""

    def _mk(self, slots=16, mesh=None, **kw):
        from ilqr_tpu.parallel.mesh import make_mesh

        model = get_model("double_integrator")
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        return model, di.default_params(), cfg, SolverService(
            model, di.default_params(), cfg, 0.05, 14,
            max_batch=16, path="vmap", warm=True, resident_slots=slots,
            mesh=(make_mesh() if mesh is None else mesh),
            autostart=False, **kw)

    def test_matches_unsharded_resident(self):
        model, params, cfg, msvc = self._mk()
        flat = SolverService(model, params, cfg, 0.05, 14, max_batch=16,
                             path="vmap", warm=True, resident_slots=16,
                             autostart=False)
        rng = np.random.default_rng(11)
        x0s = rng.normal(size=(5, 4)).astype(np.float32) * 0.4
        # slots spread across devices (0..4 live on devices 0..4)
        fm = [msvc.submit(x0s[i], slot=i) for i in range(5)]
        ff = [flat.submit(x0s[i], slot=i) for i in range(5)]
        assert msvc._run_once(block=True) and flat._run_once(block=True)
        for a, b in zip(fm, ff):
            sa, sb = a.result(timeout=0), b.result(timeout=0)
            np.testing.assert_allclose(sa.cost, sb.cost, rtol=1e-5)
            np.testing.assert_allclose(sa.us, sb.us, rtol=1e-4,
                                       atol=1e-6)
        # warm replans through the sharded state
        fm2 = [msvc.submit(x0s[i] + np.float32(0.01), slot=i)
               for i in range(5)]
        ff2 = [flat.submit(x0s[i] + np.float32(0.01), slot=i)
               for i in range(5)]
        assert msvc._run_once(block=True) and flat._run_once(block=True)
        for a, b in zip(fm2, ff2):
            sa, sb = a.result(timeout=0), b.result(timeout=0)
            np.testing.assert_allclose(sa.cost, sb.cost, rtol=1e-5)
            assert int(sa.iterations) == int(sb.iterations)
        msvc.close(); flat.close()

    def test_bucket_overflow_defers(self):
        """mbs = max_batch/D = 2 lanes per device: a third same-device
        slot in one batch is deferred, not dropped."""
        model, params, cfg, svc = self._mk(slots=32)
        # slots 0, 8, 16 all live on device 0 (s % 8 == 0); mbs = 2
        x0 = np.array([0.4, 0.1, 0.0, 0.0], np.float32)
        f0 = svc.submit(x0, slot=0)
        f8 = svc.submit(x0 + np.float32(0.1), slot=8)
        f16 = svc.submit(x0 + np.float32(0.2), slot=16)
        assert svc._run_once(block=True)
        assert f0.done() and f8.done() and not f16.done()
        assert svc._run_once(block=False)
        assert f16.done()
        assert np.isfinite(f16.result(timeout=0).cost)
        svc.close()

    def test_wrong_blob_kind_refused(self):
        """A plain (non-resident, non-mesh) blob into a resident+mesh
        service must be refused with a clear error (resident+mesh+aot
        itself is supported — tests/test_aot.py::test_resident_mesh_aot
        _blob)."""
        from ilqr_tpu.parallel.mesh import make_mesh

        from ilqr_tpu.aot import compile_solver

        model = get_model("double_integrator")
        params = di.default_params()
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        flat_blob = compile_solver(model, params, cfg, 0.05, 16, 14,
                                   path="vmap")
        with pytest.raises(ValueError, match="not a sharded resident"):
            SolverService(model, params, cfg, 0.05, 14,
                          max_batch=16, path="vmap", warm=True,
                          resident_slots=16, mesh=make_mesh(),
                          aot=flat_blob, autostart=False)


def test_eager_wide_m_budget_validation(monkeypatch):
    """A wide-m service whose max_iter can never fit the per-process
    worker-fault budget must fail AT CONSTRUCTION, not on the first
    request (round-5 review finding)."""
    import jax as _jax

    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    params = tr.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=100, boxqp_mode="pn_fixed",
                       backward_kernel="xla", rollout_kernel="xla",
                       deriv_kernel="xla")
    with monkeypatch.context() as mp:
        mp.setattr(_jax, "default_backend", lambda: "tpu")
        # max_batch=256 x max_iter=100 = 25600 > the 20480 budget: the
        # smallest possible dispatch can never fit — refuse upfront
        with pytest.raises(ValueError, match="lane-iterations per"):
            SolverService(model, params, cfg, 0.05, 8, max_batch=256,
                          path="vmap", autostart=False)
        # a SMALL fleet at the same max_iter is fine: dispatches pad to
        # max_batch (4 lanes), spending 400 lane-iters per batch — the
        # old check wrongly priced it at MAX_WIDE_DISPATCH_B lanes
        # (round-5 review finding)
        svc = SolverService(model, params, cfg, 0.05, 8, max_batch=4,
                            path="vmap", autostart=False)
        svc.close()
        # max_batch > MAX_WIDE_DISPATCH_B must be a multiple of it:
        # a ragged tail dispatch would compile a NEW program shape
        # mid-serving (round-5 review finding)
        small_cfg = SolverConfig(
            deriv_mode="analytic", clamp_forward=True, max_iter=10,
            boxqp_mode="pn_fixed", backward_kernel="xla",
            rollout_kernel="xla", deriv_kernel="xla")
        with pytest.raises(ValueError, match="multiple of it"):
            SolverService(model, params, small_cfg, 0.05, 8,
                          max_batch=300, path="vmap", autostart=False)
        # sharded vmap serving in the fault region is refused too
        from ilqr_tpu.parallel.mesh import make_mesh
        with pytest.raises(ValueError, match="worker-fault region"):
            SolverService(model, params, cfg, 0.05, 8, max_batch=8,
                          path="vmap", mesh=make_mesh(), autostart=False)


def test_explicit_iter_chunk_keeps_containment(monkeypatch):
    """iter_chunk=<int> inside the fault region still routes through the
    full containment (ledger + batch chunking) — iteration chunking
    alone is a proven crash at B=1024 (round-5 review finding)."""
    import jax as _jax

    import ilqr_tpu.batch as batch_mod
    from ilqr_tpu.batch import solve_batch
    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    params = tr.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=40, boxqp_mode="pn_fixed",
                       backward_kernel="xla", rollout_kernel="xla",
                       deriv_kernel="xla")
    monkeypatch.setitem(batch_mod._WIDE_M_LEDGER, "lane_iters", 0)
    with monkeypatch.context() as mp:
        mp.setattr(_jax, "default_backend", lambda: "tpu")
        with pytest.raises(ValueError, match="refusing a wide-m"):
            solve_batch(model, params, cfg, 0.05,
                        jnp.zeros((1024, 6), jnp.float32),
                        jnp.zeros((1024, 8, 12), jnp.float32),
                        iter_chunk=4)
