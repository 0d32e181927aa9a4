"""Probe: does bf16 elementwise arithmetic run faster than f32 on this
chip's VPU, in a Pallas kernel shaped like the GSRB colour pass?

Interleaved-ratio timing (relay drift cancels). Three variants at a
resident-kernel-like working set:
  f32      — the production pass arithmetic
  bf16c    — f32 I/O, passes in bf16 (the compute_dtype lever)
  bf16io   — bf16 I/O and compute
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

N = (64, 64, 256)   # resident-class level, f32 = 4 MB/array
PASSES = 16
REPS = 6


def make(io_dtype, compute_dtype):
    def kern(u_ref, r_ref, a_ref, o_ref):
        s = u_ref[...].astype(compute_dtype)
        rv = r_ref[...].astype(compute_dtype)
        av = a_ref[...].astype(compute_dtype)
        k = (1.0 - 0.3 * av).astype(compute_dtype)
        ii = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        par0 = ((ii + jj + kk) & 1).astype(compute_dtype)
        pars = (par0, (1.0 - par0).astype(compute_dtype))
        P = jnp.full((), 0.17, compute_dtype)
        for p in range(PASSES):
            acc = k * s + rv
            for axis in (0, 1, 2):
                vp = jnp.roll(s, -1, axis)
                vm = jnp.roll(s, 1, axis)
                acc = acc + P * (vp + vm)
            s = acc + pars[p & 1] * (s - acc)
        o_ref[...] = s.astype(io_dtype)

    @jax.jit
    def run(u, r, a):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(N, io_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(u, r, a)

    return run


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x.astype(jnp.float32)))


rng = np.random.default_rng(0)
u32 = jnp.asarray(rng.standard_normal(N), jnp.float32)
r32 = jnp.asarray(rng.standard_normal(N), jnp.float32)
a32 = jnp.asarray(rng.uniform(0.5, 2.0, N), jnp.float32)
u16, r16, a16 = (x.astype(jnp.bfloat16) for x in (u32, r32, a32))

variants = {}
try:
    f = make(jnp.float32, jnp.float32)
    bar(f(u32, r32, a32)); variants["f32"] = (f, (u32, r32, a32))
except Exception as e:
    print("f32 FAILED:", str(e)[:300])
try:
    f = make(jnp.float32, jnp.bfloat16)
    bar(f(u32, r32, a32)); variants["bf16c"] = (f, (u32, r32, a32))
except Exception as e:
    print("bf16c FAILED:", str(e)[:300])
try:
    f = make(jnp.bfloat16, jnp.bfloat16)
    bar(f(u16, r16, a16)); variants["bf16io"] = (f, (u16, r16, a16))
except Exception as e:
    print("bf16io FAILED:", str(e)[:300])

times = {k: [] for k in variants}
for rep in range(REPS):
    for k, (f, args) in variants.items():
        t0 = time.perf_counter()
        bar(f(*args))
        times[k].append(time.perf_counter() - t0)

for k, ts in times.items():
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    print(f"{k:8s} median {med*1e3:8.2f} ms  min {min(ts)*1e3:8.2f} ms")
if "f32" in times and "bf16c" in times:
    r = [b / a for a, b in zip(times["f32"], times["bf16c"])]
    print("bf16c/f32 per-trial ratios:", [f"{x:.3f}" for x in sorted(r)])
if "f32" in times and "bf16io" in times:
    r = [b / a for a, b in zip(times["f32"], times["bf16io"])]
    print("bf16io/f32 per-trial ratios:", [f"{x:.3f}" for x in sorted(r)])
