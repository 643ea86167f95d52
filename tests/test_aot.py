"""AOT executable save/load (ilqr_tpu/aot.py).

CPU tests use the vmap path at tiny shapes; the TPU evidence for the
fused path (lower 293.9 s + compile 6.3 s once, then ~0.5 s cold start
from the 49.5 MB blob) lives in experiments/aot_probe.py rows in
experiments/secondary_results.jsonl.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_tpu import SolverConfig, get_model, solve
from ilqr_tpu.aot import AotSolver, compile_solver, load
from ilqr_tpu.models import double_integrator as di

B, T = 3, 30


@pytest.fixture(scope="module")
def aot_pair(tmp_path_factory):
    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=15)
    aot = compile_solver(model, params, cfg, 0.05, B, T, path="vmap")
    path = str(tmp_path_factory.mktemp("aot") / "di.aotexec")
    aot.save(path)
    return aot, path, (model, params, cfg)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 2), jnp.float32)
    return x0, u0


def test_aot_matches_direct_solve(aot_pair):
    aot, _, (model, params, cfg) = aot_pair
    x0, u0 = _inputs()
    sol = aot(x0, u0)
    for i in range(B):
        ref = solve(model, params, cfg, 0.05, x0[i], u0[i])
        np.testing.assert_allclose(np.asarray(sol.cost)[i],
                                   np.asarray(ref.cost), rtol=1e-5)


def test_roundtrip_same_process(aot_pair):
    aot, path, _ = aot_pair
    restored = load(path)
    x0, u0 = _inputs(seed=1)
    np.testing.assert_array_equal(np.asarray(aot(x0, u0).cost),
                                  np.asarray(restored(x0, u0).cost))
    assert restored.meta["path"] == "vmap"
    assert tuple(restored.meta["x0_shape"]) == (B, 4)


def test_shape_pinning(aot_pair):
    aot, _, _ = aot_pair
    with pytest.raises(ValueError, match="shape-pinned"):
        aot(jnp.zeros((B + 1, 4), jnp.float32),
            jnp.zeros((B + 1, T, 2), jnp.float32))
    with pytest.raises(ValueError, match="float32"):
        aot(jnp.zeros((B, 4), jnp.float64), jnp.zeros((B, T, 2), jnp.float32))


def test_env_mismatch_refused(aot_pair, tmp_path, monkeypatch):
    aot, path, _ = aot_pair
    import pickle

    blob = pickle.loads(open(path, "rb").read())
    blob["meta"]["backend"] = "tpu"
    blob["meta"]["device_kind"] = "TPU v5 lite"
    bad = tmp_path / "wrong_backend.aotexec"
    bad.write_bytes(pickle.dumps(blob))
    with pytest.raises(RuntimeError, match="backend"):
        load(str(bad))


def test_not_an_aot_file(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x80\x04N.")  # pickle of None
    with pytest.raises(ValueError, match="not an ilqr_tpu AOT"):
        load(str(p))


def test_fused_path_guards():
    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig()
    with pytest.raises(ValueError, match="batch <= 1024"):
        compile_solver(model, params, cfg, 0.05, 2048, T, path="fused")


def test_service_with_aot(aot_pair):
    """SolverService dispatching through a pre-compiled executable."""
    from ilqr_tpu.serve import SolverService

    aot, path, (model, params, cfg) = aot_pair
    svc = SolverService(model, params, cfg, 0.05, T, max_batch=B,
                        path="vmap", aot=path, autostart=False)
    rng = np.random.default_rng(3)
    futs = [svc.submit(rng.normal(size=4).astype(np.float32))
            for _ in range(2)]
    assert svc._run_once(block=True)
    for f in futs:
        s = f.result(timeout=0)
        ref = solve(model, params, cfg, 0.05,
                    jnp.asarray(f_x0 := s.xs[0], jnp.float32),
                    jnp.zeros((T, 2), jnp.float32))
        np.testing.assert_allclose(s.cost, np.asarray(ref.cost), rtol=1e-5)
    svc.close()


def test_service_aot_shape_mismatch(aot_pair):
    from ilqr_tpu.serve import SolverService

    aot, path, (model, params, cfg) = aot_pair
    with pytest.raises(ValueError, match="pinned to x0"):
        SolverService(model, params, cfg, 0.05, T, max_batch=B + 1,
                      path="vmap", aot=path, autostart=False)


def test_pack_unpack_roundtrip_helpers():
    """pack_leaves/unpack_flat (the single-transfer D2H layout used by
    the TPU AOT executables and SolverService) round-trip a Solution-like
    tree bit-exactly, including i32 leaves bitcast through f32."""
    import jax

    from ilqr_tpu.aot import pack_leaves, pack_specs, unpack_flat

    rng = np.random.default_rng(0)
    tree = {
        "xs": jnp.asarray(rng.normal(size=(3, 5, 4)), jnp.float32),
        "iters": jnp.asarray([[7, -1, 2**30]], jnp.int32),
        "cost": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
    }
    specs = pack_specs(jax.eval_shape(lambda: tree))
    flat = jax.jit(pack_leaves)(tree)
    assert flat.ndim == 1 and flat.dtype == jnp.float32
    arrs = unpack_flat(np.asarray(flat), specs)
    leaves = jax.tree_util.tree_leaves(tree)
    for got, want in zip(arrs, leaves):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, np.asarray(want))


def test_pack_specs_refuses_64bit():
    import jax

    from ilqr_tpu.aot import pack_specs

    tree = {"a": jnp.zeros((2,), jnp.float32),
            "b": jnp.zeros((2,), jnp.float64)}
    assert pack_specs(jax.eval_shape(lambda: tree)) is None


def test_warm_aot_blob_in_service(tmp_path):
    """compile_solver(warm=True) blob drops into SolverService(warm=True,
    aot=...): the whole warm MPC serving program, precompiled."""
    from ilqr_tpu.aot import compile_solver
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=6)
    blob = str(tmp_path / "warm.aotexec")
    compile_solver(model, params, cfg, 0.05, 4, 12, path="vmap",
                   warm=True).save(blob)

    svc = SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                        path="vmap", warm=True, aot=blob,
                        autostart=False)
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=4).astype(np.float32)
    f1 = svc.submit(x0)                      # cold lane
    assert svc._run_once(block=True)
    first = f1.result(timeout=0)
    # warm replan chained from the reply
    f2 = svc.submit(np.asarray(first.xs[1], np.float32), prev=first)
    assert svc._run_once(block=True)
    second = f2.result(timeout=0)
    assert np.isfinite(float(second.cost))
    svc.close()

    # cold lane must equal the plain cold service bit-for-bit
    ref = SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                        path="vmap", autostart=False)
    fr = ref.submit(x0)
    assert ref._run_once(block=True)
    np.testing.assert_array_equal(np.asarray(first.cost),
                                  np.asarray(fr.result(timeout=0).cost))
    ref.close()


def test_aot_blob_warm_mismatch_refused(tmp_path):
    from ilqr_tpu.aot import compile_solver
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=6)
    blob = str(tmp_path / "cold.aotexec")
    compile_solver(model, params, cfg, 0.05, 4, 12, path="vmap").save(blob)
    with pytest.raises(ValueError, match="warm"):
        SolverService(model, params, cfg, 0.05, 12, max_batch=4,
                      path="vmap", warm=True, aot=blob, autostart=False)


def test_warm_aot_direct_call_arity():
    from ilqr_tpu.aot import compile_solver

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=4)
    warm = compile_solver(model, params, cfg, 0.05, 2, 8, path="vmap",
                          warm=True)
    with pytest.raises(ValueError, match="expected 6 arrays"):
        warm(np.zeros((2, 4), np.float32), np.zeros((2, 8, 2), np.float32))
    sol = warm(np.zeros((2, 4), np.float32),          # x0
               np.zeros((2, 8, 2), np.float32),        # us
               np.zeros((2, 9, 4), np.float32),        # xs
               np.zeros((2, 8, 2, 4), np.float32),     # K
               np.full((2,), cfg.lambda_init, np.float32),
               np.full((2,), cfg.dlambda_init, np.float32))
    assert np.all(np.isfinite(np.asarray(sol.cost)))


def test_aot_problem_digest_mismatch_refused(aot_pair):
    """The blob bakes in params values + the full SolverConfig; a service
    constructed with different ones must be refused (ADVICE r4: shape
    checks alone would silently serve wrong solutions)."""
    import dataclasses

    from ilqr_tpu.serve import SolverService

    aot, path, (model, params, cfg) = aot_pair
    # different goal -> different baked-in program
    bad_params = params._replace(goal=params.goal + 1.0)
    with pytest.raises(ValueError, match="problem_digest"):
        SolverService(model, bad_params, cfg, 0.05, T, max_batch=B,
                      path="vmap", aot=path, autostart=False)
    # same max_iter (the shallow check) but a different lambda schedule
    bad_cfg = dataclasses.replace(cfg, lambda_factor=2.0)
    with pytest.raises(ValueError, match="problem_digest"):
        SolverService(model, params, bad_cfg, 0.05, T, max_batch=B,
                      path="vmap", aot=path, autostart=False)


def test_problem_digest_dtype_insensitive():
    """f64 numpy params and f32 jnp params digest identically (both are
    cast to the f32 solve dtype before hashing)."""
    import jax

    from ilqr_tpu.aot import problem_digest

    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=15)
    p64 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), params)
    p32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    assert problem_digest(p64, cfg) == problem_digest(p32, cfg)
    changed = params._replace(goal=params.goal + 1e-3)
    assert problem_digest(changed, cfg) != problem_digest(params, cfg)


class TestShardedAot:
    """compile_solver(mesh=) — the sharded dispatch as a serialized
    executable (VERDICT r4 item 2). CPU blobs are same-process only
    (cross-process CPU AOT SIGILLs — module docstring); the cross-process
    TPU evidence lives in experiments/mesh_aot_tpu.py result rows."""

    @pytest.fixture(scope="class")
    def sharded_aot(self, tmp_path_factory):
        from ilqr_tpu.parallel.mesh import make_mesh

        model = get_model("double_integrator")
        params = di.default_params()
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        mesh = make_mesh()
        aot = compile_solver(model, params, cfg, 0.05, 8, 12,
                             path="vmap", mesh=mesh)
        path = str(tmp_path_factory.mktemp("aot") / "sharded.aotexec")
        aot.save(path)
        return aot, path, mesh, (model, params, cfg)

    def _x(self, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.normal(size=(8, 4)).astype(np.float32),
                np.zeros((8, 12, 2), np.float32))

    def test_matches_unsharded_vmap(self, sharded_aot):
        import jax

        aot, _, _, (model, params, cfg) = sharded_aot
        x0, u0 = self._x()
        sol = aot(x0, u0)
        ref = jax.jit(jax.vmap(
            lambda x, u: solve(model, params, cfg, 0.05, x, u)
        ))(jnp.asarray(x0), jnp.asarray(u0))
        np.testing.assert_allclose(np.asarray(sol.cost),
                                   np.asarray(ref.cost), rtol=1e-5)
        assert aot.meta["mesh"]["size"] == 8

    def test_roundtrip_same_process(self, sharded_aot):
        aot, path, _, _ = sharded_aot
        restored = load(path)
        x0, u0 = self._x(seed=1)
        np.testing.assert_array_equal(np.asarray(aot(x0, u0).cost),
                                      np.asarray(restored(x0, u0).cost))
        assert restored.meta["num_devices"] == 8

    def test_service_mesh_aot(self, sharded_aot):
        from ilqr_tpu.serve import SolverService

        aot, path, mesh, (model, params, cfg) = sharded_aot
        svc = SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                            path="vmap", mesh=mesh, aot=path,
                            autostart=False)
        rng = np.random.default_rng(7)
        x0 = rng.normal(size=4).astype(np.float32)
        fut = svc.submit(x0)
        assert svc._run_once(block=True)
        s = fut.result(timeout=0)
        ref = solve(model, params, cfg, 0.05, jnp.asarray(x0),
                    jnp.zeros((12, 2), jnp.float32))
        np.testing.assert_allclose(s.cost, np.asarray(ref.cost), rtol=1e-5)
        svc.close()

    def test_mesh_mismatch_refused(self, sharded_aot):
        from jax.sharding import Mesh
        import jax

        from ilqr_tpu.serve import SolverService

        aot, path, mesh, (model, params, cfg) = sharded_aot
        with pytest.raises(ValueError, match="sharded program"):
            SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                          path="vmap", aot=path, autostart=False)
        half = Mesh(np.array(jax.devices()[:4]).reshape(-1), ("batch",))
        with pytest.raises(ValueError, match="does not match"):
            SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                          path="vmap", mesh=half, aot=path,
                          autostart=False)

    def test_single_device_blob_with_mesh_refused(self, sharded_aot):
        from ilqr_tpu.serve import SolverService

        _, _, mesh, (model, params, cfg) = sharded_aot
        flat = compile_solver(model, params, cfg, 0.05, 8, 12,
                              path="vmap")
        with pytest.raises(ValueError, match="single-device AOT blob"):
            SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                          path="vmap", mesh=mesh, aot=flat,
                          autostart=False)

    def test_warm_sharded_aot(self, tmp_path):
        """warm=True + mesh= as one serialized executable."""
        from ilqr_tpu.parallel.mesh import make_mesh
        from ilqr_tpu.serve import SolverService

        model = get_model("double_integrator")
        params = di.default_params()
        cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
        mesh = make_mesh()
        aot = compile_solver(model, params, cfg, 0.05, 8, 12,
                             path="vmap", warm=True, mesh=mesh)
        svc = SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                            path="vmap", warm=True, mesh=mesh, aot=aot,
                            autostart=False)
        flat = SolverService(model, params, cfg, 0.05, 12, max_batch=8,
                             path="vmap", warm=True, autostart=False)
        x0 = np.array([0.5, -0.3, 0.1, 0.0], np.float32)
        fa, fb = svc.submit(x0), flat.submit(x0)
        assert svc._run_once(block=True) and flat._run_once(block=True)
        a, b = fa.result(timeout=0), fb.result(timeout=0)
        np.testing.assert_allclose(a.cost, b.cost, rtol=1e-6)
        # warm replan through the sharded executable
        f2 = svc.submit(x0 + np.float32(0.01), prev=a)
        assert svc._run_once(block=True)
        assert np.isfinite(f2.result(timeout=0).cost)
        svc.close(); flat.close()


def test_resident_aot_blob_in_service(tmp_path):
    """compile_solver(resident_slots=) → SolverService(resident_slots=,
    aot=): the donated-state fleet program as a serialized executable.
    Same-process on CPU (the cross-process CPU SIGILL trap)."""
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
    C, MB, T_ = 6, 4, 14
    aot = compile_solver(model, params, cfg, 0.05, MB, T_, path="vmap",
                         resident_slots=C)
    blob = str(tmp_path / "res.aotexec")
    aot.save(blob)
    restored = load(blob)
    with pytest.raises(ValueError, match="resident-fleet executable"):
        restored(np.zeros((MB, 4), np.float32))

    svc = SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                        path="vmap", warm=True, resident_slots=C,
                        aot=restored, autostart=False)
    ref = SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                        path="vmap", warm=True, resident_slots=C,
                        autostart=False)
    x0 = np.array([0.6, -0.2, 0.1, 0.0], np.float32)
    fa, fb = svc.submit(x0, slot=2), ref.submit(x0, slot=2)
    assert svc._run_once(block=True) and ref._run_once(block=True)
    a, b = fa.result(timeout=0), fb.result(timeout=0)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-6)
    # warm replan through the blob
    fa2 = svc.submit(x0 + np.float32(0.01), slot=2)
    fb2 = ref.submit(x0 + np.float32(0.01), slot=2)
    assert svc._run_once(block=True) and ref._run_once(block=True)
    a2, b2 = fa2.result(timeout=0), fb2.result(timeout=0)
    np.testing.assert_allclose(a2.cost, b2.cost, rtol=1e-6)
    assert int(a2.iterations) == int(b2.iterations)
    svc.close(); ref.close()

    # capacity mismatch refused
    with pytest.raises(ValueError, match="capacity"):
        SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                      path="vmap", warm=True, resident_slots=C + 1,
                      aot=blob, autostart=False)
    # resident blob into a non-resident warm service refused
    with pytest.raises(ValueError, match="resident"):
        SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                      path="vmap", warm=True,
                      fields=("us", "cost", "iterations", "reason"),
                      aot=blob, autostart=False)


def test_resident_mesh_aot_blob(tmp_path):
    """The full matrix cell: resident_slots + mesh= + aot= — the sharded
    donated-state executable serialized and reloaded (same-process on
    CPU; cross-process sharded evidence is TPU-side)."""
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
    C, MB, T_ = 16, 16, 14
    mesh = make_mesh()
    aot = compile_solver(model, params, cfg, 0.05, MB, T_, path="vmap",
                         resident_slots=C, mesh=mesh)
    blob = str(tmp_path / "resmesh.aotexec")
    aot.save(blob)
    svc = SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                        path="vmap", warm=True, resident_slots=C,
                        mesh=mesh, aot=blob, autostart=False)
    ref = SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                        path="vmap", warm=True, resident_slots=C,
                        mesh=mesh, autostart=False)
    rng = np.random.default_rng(13)
    x0s = rng.normal(size=(5, 4)).astype(np.float32) * 0.4
    fa = [svc.submit(x0s[i], slot=i) for i in range(5)]
    fb = [ref.submit(x0s[i], slot=i) for i in range(5)]
    assert svc._run_once(block=True) and ref._run_once(block=True)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(a.result(timeout=0).cost,
                                   b.result(timeout=0).cost, rtol=1e-6)
    # warm replans through the deserialized sharded state program
    fa2 = [svc.submit(x0s[i] + np.float32(0.01), slot=i)
           for i in range(5)]
    fb2 = [ref.submit(x0s[i] + np.float32(0.01), slot=i)
           for i in range(5)]
    assert svc._run_once(block=True) and ref._run_once(block=True)
    for a, b in zip(fa2, fb2):
        sa, sb = a.result(timeout=0), b.result(timeout=0)
        np.testing.assert_allclose(sa.cost, sb.cost, rtol=1e-6)
        assert int(sa.iterations) == int(sb.iterations)
    svc.close(); ref.close()

    # capacity mismatch refused
    with pytest.raises(ValueError, match="capacity"):
        SolverService(model, params, cfg, 0.05, T_, max_batch=MB,
                      path="vmap", warm=True, resident_slots=C * 2,
                      mesh=mesh, aot=blob, autostart=False)
    # dt mismatch refused (round-5 review: this branch initially ran
    # only the digest check, which does not cover dt — a dt-mismatched
    # sharded resident blob would have silently served wrong solutions)
    with pytest.raises(ValueError, match="compiled with"):
        SolverService(model, params, cfg, 0.1, T_, max_batch=MB,
                      path="vmap", warm=True, resident_slots=C,
                      mesh=mesh, aot=blob, autostart=False)
    # params mismatch refused through the shared digest leg
    with pytest.raises(ValueError, match="problem_digest"):
        SolverService(model, params._replace(goal=params.goal + 1.0),
                      cfg, 0.05, T_, max_batch=MB, path="vmap",
                      warm=True, resident_slots=C, mesh=mesh, aot=blob,
                      autostart=False)
