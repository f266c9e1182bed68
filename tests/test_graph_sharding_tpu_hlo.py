"""Async halo scheduling in REAL multi-chip TPU HLO (VERDICT r3 item 5).

AOT-compiles the DP×graph train step for a v5e 2x4 topology via libtpu
(no TPU devices required) and asserts XLA's latency-hiding scheduler made
the graph-sharding halo all-gathers ASYNC (start/done split, recorded as
``async_collective_name`` in the post-optimization HLO) — i.e. the
6.6 MB/step exchanges overlap compute rather than serializing the step.
"""

import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow


def test_halo_all_gathers_async_in_tpu_hlo():
    from tests.tools_graph_sharding_hlo import analyze_tpu_aot

    try:
        res = analyze_tpu_aot()
    except Exception as e:  # no libtpu / AOT unsupported on this box
        pytest.skip(f"TPU AOT compile unavailable: {type(e).__name__}: {e}")

    assert res["n_all_gather"] > 0
    # the scheduler must have made a meaningful fraction async, and
    # specifically the backbone (kNN/EdgeConv halo) gathers
    assert res["n_async"] >= 5, res
    assert len(res["async_backbone_gathers"]) >= 3, res
    # volume guard at TPU level mirrors
    # test_multidevice.py::test_halo_hints_cut_allgather_volume (CPU)
    assert res["all_gather_mb"] < 10.0, res
