"""DeepIce B sweep + TITO roofline on the real TPU (one process)."""
import json, sys
sys.path.insert(0, "/root/repo")
import bench

for B in (4, 8, 16):  # B=32 OOMs v5e HBM (16.26G of 15.75G)
    r = bench.bench_deepice(B_d=B)
    print(json.dumps({"deepice_B": B, **{k: r[k] for k in ("events_per_s", "step_ms")}, "roofline": r.get("roofline")}), flush=True)
r = bench.bench_tito_l1024()
print(json.dumps({"tito": True, **{k: r[k] for k in ("events_per_s", "step_ms")}, "roofline": r.get("roofline")}), flush=True)
