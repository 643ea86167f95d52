"""Smoke tests for every example script (VERDICT r3 item 5): each runs
end-to-end at tiny shapes on CPU in a subprocess (the scripts configure
jax themselves), so an API change that breaks an example fails the fast
suite instead of rotting silently. examples/custom_model.py is covered
separately (and more deeply) by tests/test_custom_model.py."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EX = os.path.join(_ROOT, "examples")


def _run(script, *argv, cache=True):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # share the repo-local persistent compile cache with the main suite
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(_ROOT, ".jax_cache")
    if not cache:
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    res = subprocess.run(
        [sys.executable, os.path.join(_EX, script), *argv],
        capture_output=True, text=True, timeout=600, env=env, cwd=_ROOT)
    assert res.returncode == 0, (
        f"{script} failed\nstdout:\n{res.stdout}\nstderr:\n{res.stderr}")
    return res.stdout


def test_free_flyer_docking_smoke():
    out = _run("free_flyer_docking.py", "--cpu", "--vmap",
               "--batch", "2", "--horizon", "8", "--max-iter", "2")
    assert "solves/s" in out
    assert "per-craft peak thrust within own ceiling" in out


def test_quadrotor_waypoints_smoke():
    out = _run("quadrotor_waypoints.py", "--cpu", "--vmap",
               "--batch", "2", "--horizon", "8", "--max-iter", "2")
    assert "solves/s" in out
    assert "median final position error" in out


def test_mpc_fleet_smoke():
    out = _run("mpc_fleet.py", "--cpu", "--fleet", "2", "--steps", "2",
               "--horizon", "8")
    assert "replans/s" in out


@pytest.mark.slow
def test_custom_model_script_runs():
    # the script itself (its objects are imported by test_custom_model.py;
    # this runs its __main__ demo path)
    out = _run("custom_model.py")
    assert out.strip()


def test_aot_serving_smoke(tmp_path):
    # Two separate processes — the actual AOT workflow (precompile once,
    # serve from the blob in fresh processes). cache=False: executing a
    # DESERIALIZED executable in a process that also rehydrates eager
    # programs from a persistent compilation cache dies inside XLA:CPU
    # ("NOT_FOUND: Buffer Definition Event: Function wrapped_broadcast.N
    # not found") — an XLA:CPU runtime defect; the TPU backend and
    # cacheless CPU runs are fine (see ilqr_tpu/aot.py docstring).
    blob = str(tmp_path / "s.aotexec")
    out = _run("aot_serving.py", "--precompile", "--cpu", "--blob", blob,
               "--max-batch", "4", "--horizon", "10", "--max-iter", "3",
               "--path", "vmap", cache=False)
    assert "precompiled cold [vmap]" in out
    out = _run("aot_serving.py", "--serve", "--cpu", "--blob", blob,
               "--max-batch", "4", "--horizon", "10", "--max-iter", "3",
               "--requests", "3", "--path", "vmap", cache=False)
    assert "service cold-start" in out
    assert "served 3 requests" in out


def test_aot_serving_warm_smoke(tmp_path):
    """The warm MPC deployment recipe end-to-end at tiny shapes
    (precompile the warm program, fresh process serves + chains
    replans). cache=False per the XLA:CPU blob-loading caveat."""
    blob = str(tmp_path / "w.aotexec")
    out = _run("aot_serving.py", "--precompile", "--cpu", "--warm",
               "--blob", blob, "--max-batch", "4", "--horizon", "10",
               "--max-iter", "3", "--path", "vmap", cache=False)
    assert "precompiled warm [vmap]" in out
    out = _run("aot_serving.py", "--serve", "--cpu", "--warm",
               "--blob", blob, "--max-batch", "4", "--horizon", "10",
               "--max-iter", "3", "--requests", "3", "--path", "vmap",
               cache=False)
    assert "chained 3 warm replans" in out


def test_aot_serving_mesh_smoke(tmp_path):
    """--mesh: the sharded dispatch as one blob, compiled and served over
    the 8-virtual-device CPU mesh. CPU blobs are same-process-fragile
    (aot.py trap triad), so precompile+serve run in ONE process here;
    the cross-process evidence is TPU-side (experiments/mesh_aot_tpu.py)."""
    env_flags = os.environ.get("XLA_FLAGS", "")
    blob = str(tmp_path / "mesh.aotexec")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env_flags
                        + " --xla_force_host_platform_device_count=8")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    res = subprocess.run(
        [sys.executable, os.path.join(_EX, "aot_serving.py"),
         "--precompile", "--serve", "--cpu", "--mesh", "8",
         "--blob", blob, "--max-batch", "8", "--horizon", "10",
         "--max-iter", "4", "--requests", "4", "--path", "vmap"],
        capture_output=True, text=True, timeout=600, env=env, cwd=_ROOT)
    assert res.returncode == 0, (
        f"mesh serving failed\nstdout:\n{res.stdout}\n"
        f"stderr:\n{res.stderr}")
    assert "sharded(8dev)" in res.stdout
    assert "first solution" in res.stdout


def test_resident_serving_smoke():
    out = _run("resident_serving.py", "--cpu", "--controllers", "4",
               "--steps", "3", "--horizon", "10", "--max-batch", "4",
               "--max-iter", "4", "--path", "vmap")
    assert "resident controllers" in out
    assert "replans/s" in out
