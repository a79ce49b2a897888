"""A/B the headline training update: f32 vs bf16 mixed-precision compute.

Reuses bench.py's flagship workload (exp3-class GATv2+TarMAC+GRU+dueling,
B=32, T=50, hidden 256) on the real TPU; prints both edges/s numbers.
"""
import sys
sys.path.insert(0, "/root/repo")
import bench

print("== f32 ==", file=sys.stderr, flush=True)
f32 = bench.bench_tpu(n_timed=20)
bench.TRAIN_KW["compute_dtype"] = "bfloat16"
print("== bf16 ==", file=sys.stderr, flush=True)
bf16 = bench.bench_tpu(n_timed=20)
print(f"f32: {f32:,.0f} edges/s  bf16: {bf16:,.0f} edges/s  speedup: {bf16/f32:.2f}x")
