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


def test_bench_e2e_loader_section(tiny):
    out = bench.bench_e2e_loader(
        n_epochs=2, n_events_db=150, steps_per_dispatch=2
    )
    assert out.get("events_per_s", 0) > 0 or "skipped" in out
    if "skipped" not in out:
        assert out["single_dispatch_events_per_s"] > 0
        assert out["steps_per_dispatch"] == 2
        mat = out["materialized_replay_events_per_s"]
        assert isinstance(mat, float) and mat > 0, mat


def test_bench_inference_section(tiny):
    out = bench.bench_inference(compute_dtype=None)
    assert out["events_per_s"] > 0
    assert out["latency_ms_per_batch"] > 0


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
