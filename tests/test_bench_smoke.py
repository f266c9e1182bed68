"""bench.py smoke: every section runs on CPU at toy size and emits the
fields the driver records (protects the end-of-round bench run from
regressions — it only executes on the real chip otherwise)."""

import numpy as np
import pytest

import bench


@pytest.fixture()
def tiny(monkeypatch):
    monkeypatch.setattr(bench, "B", 8)
    monkeypatch.setattr(bench, "L", 32)
    monkeypatch.setattr(bench, "N_STEPS", 2)


def test_bench_jax_and_roofline(tiny):
    res = bench.bench_jax()
    assert res["events_per_s"] > 0
    assert np.isfinite(res["step_flops"])
    roof = bench.roofline_detail(res)
    assert roof["flops_per_step"] == res["step_flops"]
    assert "arithmetic_intensity_logical" in roof
    est = bench.a100_pyg_estimate(res, {"ref_cpu_events_per_s": 35.1})
    lo, hi = est["events_per_s_bounds"]
    assert 0 < lo < est["events_per_s"] < hi
    assert est["speedup_conservative"] <= est["speedup_point"]


@pytest.mark.parametrize("phase", ["k1", "kn", "cached", "mat"])
def test_bench_e2e_phase(tiny, phase):
    out = bench.bench_e2e_phase(
        phase=phase, n_epochs=2, n_events_db=150, steps_per_dispatch=2
    )
    if "skipped" in out:
        return
    assert out["events_per_s"] > 0
    assert out["phase"] == phase
    assert np.isfinite(out["final_loss"])
    assert "host" in out  # contention guard attached


def test_bench_e2e_loader_assembly(monkeypatch):
    """bench_e2e_loader orchestrates fresh subprocesses per phase —
    best-of-2 with a 3rd draw only when the first two disagree by >15%
    (the r5 budget protocol) — and retries a host-load-suspect draw
    once.  Exercised with a stubbed child so the assembly/retry logic
    is covered without processes."""
    calls = []

    def fake_sub(name, kwargs=None, timeout_s=3600):
        assert name == "e2e_phase"
        phase = kwargs["phase"]
        calls.append(phase)
        # first "cached" attempt reports a loaded host; the second kns
        # draw lands in the tunnel's slow mode
        suspect = phase == "cached" and calls.count("cached") == 1
        eps = {"k1": 100.0, "kn": 80.0, "kns": 90.0, "kns_auto": 95.0,
               "cached": 200.0, "mat": 150.0}[phase]
        if phase == "kns" and calls.count("kns") == 2:
            eps = 50.0
        return {
            "phase": phase,
            "events_per_s": eps,
            "host_load_suspect": suspect,
            "host": {"pre": {"loadavg1": 0.1, "spin_ms": 20.0},
                     "post": {"loadavg1": 0.1, "spin_ms": 20.0},
                     "host_load_suspect": suspect},
        }

    monkeypatch.setattr(bench, "_bench_in_subprocess", fake_sub)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench.bench_e2e_loader(n_epochs=2, steps_per_dispatch=2)
    assert out["events_per_s"] == 100.0
    assert out["best_mode"] == "k1"
    assert out["stacked_dispatch_events_per_s"] == 90.0  # best of 2+1
    assert out["cached_replay_events_per_s"] == 200.0
    # the auto-bucketed default path competes for best_mode (r5);
    # the fixed-shape number survives for apples-to-apples
    assert out["auto_bucket_events_per_s"] == 95.0
    assert out["fixed_shape_events_per_s"] == 100.0
    assert out["best_mode"] == "k1"
    assert out["materialized_replay_events_per_s"] == 150.0
    # 2 draws when they agree; kns escalates to 3 on the >15% spread;
    # cached: 2 draws + 1 suspect retry
    assert calls.count("k1") == 2
    assert calls.count("kns") == 3
    assert calls.count("kns_auto") == 2
    assert calls.count("cached") == 3
    assert calls.count("mat") == 2
    # the slow kns draw is recorded, not hidden
    assert out["runs_events_per_s"]["kns"] == [90.0, 50.0, 90.0]
    assert out["retried_phases"] == ["cached"]
    assert "host_load_suspect" not in out  # retry came back clean


def test_bench_e2e_loader_deadline_skips(monkeypatch):
    """An exhausted deadline skips every phase explicitly instead of
    spawning subprocesses into the driver's timeout (r4 failure)."""

    def boom(*a, **k):
        raise AssertionError("no subprocess may run past the deadline")

    monkeypatch.setattr(bench, "_bench_in_subprocess", boom)
    out = bench.bench_e2e_loader(deadline=bench.time.monotonic() - 1.0)
    assert out["skipped"] == "budget"
    assert all(p.get("skipped") == "budget" for p in out["phases"].values())


def test_bench_inference_section(tiny):
    out = bench.bench_inference(compute_dtype=None)
    assert out["events_per_s"] > 0
    assert out["latency_ms_per_batch"] > 0
    assert (
        out["single_event_latency_ms_p50"]
        <= out["single_event_latency_ms_p90"]
        <= out["single_event_latency_ms_p99"]
    )
    assert "host" in out


def test_bench_serving_queue_section(tiny):
    out = bench.bench_serving_queue(
        workers=(2,), n_requests=12, max_batch=4
    )
    assert out["bare_dispatch_ms_p50"] > 0
    w = out["w2"]
    assert w["frames_per_s"] > 0
    assert w["per_frame_latency_ms_p50"] <= w["per_frame_latency_ms_p99"]


def test_host_guard_flags_load():
    floor = 20.0
    idle = {"loadavg1": 0.2, "spin_ms": 21.0}
    assert not bench._host_guard(idle, idle, floor)["host_load_suspect"]
    loaded_pre = {"loadavg1": 3.5, "spin_ms": 21.0}
    assert bench._host_guard(loaded_pre, idle, floor)["host_load_suspect"]
    slow_spin = {"loadavg1": 0.2, "spin_ms": 35.0}
    g = bench._host_guard(idle, slow_spin, floor)
    assert g["host_load_suspect"] and g["spin_inflation"] > 1.35
    # no floor yet (first ever run): only the loadavg signal
    assert not bench._host_guard(slow_spin, slow_spin, None)[
        "host_load_suspect"
    ]


@pytest.mark.slow
def test_bench_subprocess_isolation(monkeypatch):
    """main() runs tito/deepice via ``bench.py --sub`` child processes
    (the scalar-readback sync they need degrades the parent's
    device_puts on the axon runtime) — exercise the real plumbing:
    spawn, JSON-kwargs pass-through, JSON-line parse."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    out = bench._bench_in_subprocess(
        "deepice",
        kwargs=dict(
            B_d=2,
            L_d=32,
            model_kwargs=dict(
                hidden_dim=32,
                seq_length=32,
                depth=1,
                depth_rel=1,
                head_size=8,
            ),
        ),
        timeout_s=900,
    )
    assert out["events_per_s"] > 0
    assert np.isfinite(out["final_loss"])
    assert "roofline" in out


def test_bench_deepice_section(tiny):
    out = bench.bench_deepice(
        B_d=2,
        L_d=32,
        model_kwargs=dict(
            hidden_dim=32,
            seq_length=32,
            depth=1,
            depth_rel=1,
            head_size=8,
        ),
    )
    assert out["events_per_s"] > 0
    assert out["step_ms"] > 0
