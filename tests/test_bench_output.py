"""The bench stdout contract: ONE compact JSON line that survives the
driver's stdout-tail capture.

The driver records only the LAST ~2000 chars of bench.py's stdout; the
full detail block overflowed that window in rounds 2-3 and truncated
away the required ``metric``/``value``/``unit``/``vs_baseline`` keys
(BENCH_r02/r03: ``parsed: null``, tail starts mid-detail).  bench.py
therefore prints a compact summary line with the required keys LAST and
writes the full detail block to ``BENCH_DETAIL.json``.  This test pins
that contract with every measured section stubbed (no devices, no
timing): line stays well under the window, required keys come last, and
the detail file carries the full block.
"""

import contextlib
import io
import json

import pytest

import bench

_CANNED = {
    "train": {
        "events_per_s": 26764.0,
        "edges_per_s": 1.7e7,
        "step_ms": 4.78,
        "per_dispatch_step_ms": 5.71,
        "backend": "tpu",
        "step_flops": 9.44e10,
        "step_bytes": 2.22e9,
    },
    "tito": {"events_per_s": 744.0, "step_ms": 10.75},
    "deepice": {"events_per_s": 142.0, "step_ms": 112.7},
    "inference": {
        "events_per_s": 62400.0,
        "single_event_latency_ms_p50": 23.4,
        "single_event_latency_ms_p99": 35.9,
        "host": {"host_load_suspect": False},
    },
    "serving": {
        "bare_dispatch_ms_p50": 26.2,
        "w8": {
            "per_frame_latency_ms_p50": 28.5,
            "per_frame_latency_ms_p99": 40.0,
            "frames_per_s": 272.0,
        },
        "host": {"host_load_suspect": False},
        "host_load_suspect": False,
    },
}


@pytest.fixture()
def stubbed_main(monkeypatch, tmp_path):
    """bench.main with every measurement stubbed and all file IO
    (baseline cache, BENCH_DETAIL.json) redirected to tmp_path."""
    monkeypatch.setattr(
        bench,
        "_bench_in_subprocess",
        lambda name, kwargs=None, timeout_s=3600: dict(_CANNED[name]),
    )
    monkeypatch.setattr(
        bench,
        "bench_e2e_loader",
        lambda **kw: {
            "events_per_s": 27042.0,
            "best_mode": "kns8",
            "auto_bucket_events_per_s": 30800.0,
            "cached_replay_events_per_s": 27048.0,
            "materialized_replay_events_per_s": 27067.0,
            "note": "stub",
        },
    )
    monkeypatch.setattr(bench, "_guard_backend", lambda *a, **k: "")
    monkeypatch.setattr(
        bench, "_update_spin_floor", lambda *a, **k: None
    )
    monkeypatch.setattr(
        bench, "bench_torch_cpu_baseline", lambda *a, **k: 42.2
    )
    monkeypatch.setattr(
        bench,
        "measure_reference_cpu",
        lambda: {"ref_cpu_events_per_s": 40.9},
    )
    # main() roots the cache and detail paths at dirname(bench.__file__)
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        return buf.getvalue().strip().splitlines()[-1]

    return run, tmp_path


def test_compact_line_required_keys_last_and_fits_window(stubbed_main):
    run, tmp_path = stubbed_main
    line = run()
    # fits the driver's ~2000-char stdout tail with generous headroom
    # for stderr noise sharing the window
    assert len(line) < 1800, len(line)
    d = json.loads(line)
    # required keys present and LAST (tail-truncation survival)
    assert list(d)[-4:] == ["metric", "value", "unit", "vs_baseline"]
    assert d["metric"] == "dynedge_train_events_per_s_per_chip"
    assert d["value"] == 26764.0
    assert d["unit"] == "events/s"
    assert d["vs_baseline"] == pytest.approx(26764.0 / 42.2, rel=1e-3)
    # even a 2000-char tail of the line alone contains the headline
    tail = line[-2000:]
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in tail


def test_summary_carries_section_toplines(stubbed_main):
    run, _ = stubbed_main
    s = json.loads(run())["summary"]
    assert s["step_ms"] == 4.78
    assert s["headline_runs_events_per_s"] == [26764.0] * 3
    assert s["tito_l1024_events_per_s"] == 744.0
    assert s["deepice_l768_events_per_s"] == 142.0
    assert s["e2e_events_per_s"] == 27042.0
    assert s["e2e_auto_bucket_events_per_s"] == 30800.0
    assert s["inference_p99_ms"] == 35.9
    assert s["serving_w8_frames_per_s"] == 272.0
    assert s["sections_with_error_or_suspect"] == []


def test_full_detail_written_next_to_bench(stubbed_main):
    run, tmp_path = stubbed_main
    run()
    full = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert full["value"] == 26764.0
    det = full["detail"]
    # the full block keeps everything the compact line summarizes
    for key in (
        "roofline",
        "tito_l1024",
        "deepice_l768",
        "e2e_loader",
        "inference",
        "serving_queue",
        "a100_pyg_estimate",
        "headline_runs_events_per_s",
    ):
        assert key in det, key


def test_budget_skip_still_prints_headline(stubbed_main, monkeypatch):
    """The exact failure mode that erased round 4 (driver timeout →
    rc=124, no stdout, parsed=null) must be unrepresentable: with a
    zero wall-clock budget every post-headline section is skipped, yet
    a valid compact line with the required keys still comes out, the
    skips are explicit, and the detail file exists."""
    run, tmp_path = stubbed_main
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    line = run()
    d = json.loads(line)
    assert list(d)[-4:] == ["metric", "value", "unit", "vs_baseline"]
    assert d["value"] == 26764.0
    assert d["vs_baseline"] == pytest.approx(26764.0 / 42.2, rel=1e-3)
    s = d["summary"]
    assert s["sections_skipped_budget"] == [
        "deepice",
        "e2e",
        "inference",
        "serving",
        "tito",
    ]
    assert s["sections_with_error_or_suspect"] == []
    assert s["sections_pending"] == []
    # a zero budget still takes at least one headline draw
    assert s["headline_runs_events_per_s"] == [26764.0]
    assert s["headline_median_events_per_s"] == 26764.0
    detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert detail["detail"]["tito_l1024"]["skipped"] == "budget"


def test_provisional_line_printed_before_sections(stubbed_main, monkeypatch):
    """A provisional compact line must exist the moment the headline is
    known (ADVICE r4): if a later section hangs past the driver's
    timeout, the tail still holds a parseable capture.  Simulate the
    hang by making a section raise after asserting a line was already
    printed."""
    run, _ = stubbed_main
    printed_before_tito = []

    real_sub = bench._bench_in_subprocess

    def tracking_sub(name, kwargs=None, timeout_s=3600):
        if name == "tito":
            import io as _io  # the fixture redirects stdout to a buffer

            import sys as _sys

            buf = _sys.stdout
            printed_before_tito.append(
                buf.getvalue() if isinstance(buf, _io.StringIO) else ""
            )
        return real_sub(name, kwargs, timeout_s=timeout_s)

    monkeypatch.setattr(bench, "_bench_in_subprocess", tracking_sub)
    run()
    assert printed_before_tito, "tito section never ran"
    early_lines = printed_before_tito[0].strip().splitlines()
    assert early_lines, "no provisional line before the tito section"
    early = json.loads(early_lines[-1])
    assert early["value"] == 26764.0
    assert list(early)[-4:] == ["metric", "value", "unit", "vs_baseline"]


def test_error_sections_flagged(stubbed_main, monkeypatch):
    run, _ = stubbed_main
    canned = dict(_CANNED)
    canned["deepice"] = {"error": "RuntimeError: boom"}
    monkeypatch.setattr(
        bench,
        "_bench_in_subprocess",
        lambda name, kwargs=None, timeout_s=3600: dict(canned[name]),
    )
    d = json.loads(run())
    assert d["summary"]["sections_with_error_or_suspect"] == ["deepice"]
    assert d["summary"]["deepice_l768_events_per_s"] is None
    # headline keys unaffected by a failed side-section
    assert d["value"] == 26764.0


def test_hung_tunnel_headline_falls_back_to_cpu(stubbed_main, monkeypatch):
    """When every headline subprocess draw dies (the hung-tunnel state:
    device discovery fine, compiles hang forever), the capture must NOT
    attempt an in-process TPU run — it forces CPU and prints a line
    whose backend note says the number is not a TPU number."""
    run, _ = stubbed_main

    def dying_sub(name, kwargs=None, timeout_s=3600):
        if name == "train":
            raise RuntimeError("subprocess bench 'train' timed out")
        return dict(_CANNED[name])

    monkeypatch.setattr(bench, "_bench_in_subprocess", dying_sub)
    monkeypatch.setattr(
        bench,
        "bench_jax",
        lambda compute_dtype=None: {
            "events_per_s": 41.0,
            "edges_per_s": 2.6e4,
            "step_ms": 3120.0,
            "per_dispatch_step_ms": 3120.0,
            "backend": "cpu",
            "step_flops": 9.44e10,
            "step_bytes": 2.22e9,
        },
    )
    d = json.loads(run())
    assert list(d)[-4:] == ["metric", "value", "unit", "vs_baseline"]
    assert d["value"] == 41.0
    assert d["summary"]["headline_runs_events_per_s"] == []
    assert "NOT a TPU number" in d["summary"]["backend"]


def test_timing_suspect_sections_flagged(stubbed_main, monkeypatch):
    """ADVICE r4: a fabricated-timing draw (timing_suspect — achieved
    TFLOPs above chip peak) must flag on the recorded stdout line, not
    only inside the unrecorded detail file."""
    run, _ = stubbed_main
    canned = {k: dict(v) for k, v in _CANNED.items()}
    canned["tito"] = {"events_per_s": 9e9, "timing_suspect": True}
    monkeypatch.setattr(
        bench,
        "_bench_in_subprocess",
        lambda name, kwargs=None, timeout_s=3600: dict(canned[name]),
    )
    d = json.loads(run())
    assert d["summary"]["sections_with_error_or_suspect"] == ["tito"]
