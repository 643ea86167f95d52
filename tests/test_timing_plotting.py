"""Coverage for the profiling report and plotting helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.utils.timing import PhaseTimer, profile_phases


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("alpha"):
        pass
    with t.phase("alpha"):
        pass
    with t.phase("beta"):
        pass
    rep = t.report()
    assert "alpha" in rep and "(2 calls)" in rep
    assert "beta" in rep and "total" in rep


def test_profile_phases_reports_reference_breakdown():
    """The report carries the reference's TIMESTUFF phases
    (ilqr_core.cpp:290-298): derivatives / backward / forward / other."""
    m = get_model("double_integrator")
    p = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=10)
    timer, report = profile_phases(
        m, p, cfg, 0.05, jnp.zeros(4), jnp.zeros((15, 2)), n_iters=2)
    for phase in ("derivatives", "backward_pass", "forward_pass", "other"):
        assert phase in report
        assert timer.counts[phase] == 2


def test_plot_trajectory_writes_png(tmp_path):
    pytest.importorskip("matplotlib")
    from ilqr_tpu.utils.plotting import plot_trajectory

    rng = np.random.default_rng(0)
    path = str(tmp_path / "traj.png")
    fig = plot_trajectory(rng.normal(size=(21, 4)), rng.normal(size=(20, 1)),
                          dt=0.05, save_path=path)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    assert len(fig.axes) == 2


def test_plot_csv_roundtrip(tmp_path):
    pytest.importorskip("matplotlib")
    from ilqr_tpu.utils.io import write_trajectory_csv
    from ilqr_tpu.utils.plotting import plot_csv

    rng = np.random.default_rng(1)
    csv = str(tmp_path / "t.csv")
    png = str(tmp_path / "t.png")
    write_trajectory_csv(csv, rng.normal(size=(11, 4)),
                         rng.normal(size=(10, 2)))
    plot_csv(csv, 4, 2, dt=0.02, save_path=png)
    assert os.path.exists(png)


def test_summarize_trace_roundtrip(tmp_path):
    """Capture a tiny CPU trace with profile() and reduce it with
    summarize_trace — the same pipeline that produced the committed
    fused-iteration device table (BENCH_NOTES round 4)."""
    import jax
    import jax.numpy as jnp

    pytest.importorskip("tensorflow", reason="summarize_trace parses the "
                        "xplane protobuf via tensorflow's bundled proto")
    from ilqr_tpu.utils.timing import profile, summarize_trace

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    f(x).block_until_ready()  # compile outside the trace
    logdir = str(tmp_path / "trace")
    with profile(logdir):
        f(x).block_until_ready()
    planes, path = summarize_trace(logdir, top=5)
    assert path.endswith(".xplane.pb")
    host = planes.get("/host:CPU")
    assert host is not None and host["n_events"] > 0
    ev = host["top_events"][0]
    assert ev["total_us"] > 0 and ev["count"] >= 1
    assert len(host["top_events"]) <= 5


def test_summarize_trace_missing_dir(tmp_path):
    import pytest as _pytest

    _pytest.importorskip("tensorflow")
    from ilqr_tpu.utils.timing import summarize_trace

    with _pytest.raises(FileNotFoundError):
        summarize_trace(str(tmp_path / "nope"))
