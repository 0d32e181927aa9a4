"""Real-kernel A/B of the bf16 colour-pass tier on the TPU: production
dispatch shapes (pipelined at 256^3, tiled at 512^3), interleaved trials so
relay drift cancels. Also a Mosaic compile check of every family at bf16."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.ops import fused_sweeps as fs


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x.astype(jnp.float32)))


def setup(n):
    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=4,
                              smoother="pallas")
    # on-device RNG: a 64 MB host->device upload stalls for minutes when
    # the axon relay's send path is congested; only the key crosses
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    a = jax.random.uniform(k[0], (n, n, n), jnp.float32, 0.5, 2.0)
    rhs = jax.random.normal(k[1], (n, n, n), jnp.float32)
    u = jnp.zeros_like(rhs)
    jax.block_until_ready((a, rhs))
    return spec, a, rhs, u


def variant(spec, a, rhs, n_sweeps, cdt):
    kw = dict(kinds=spec.kinds, rho=spec.rho[0], alpha=spec.alpha,
              beta=spec.beta, dx=spec.dx[0], lo=spec.boxes[0].lo,
              interpret=False, compute_dtype=cdt)
    plan = mg.relax_kernel_plan(spec.boxes[0].shape, n_sweeps)

    @jax.jit
    def run(x):
        for kind, s, prm in plan:
            if kind == "resident":
                x = fs.resident_relax(x, rhs, a, nsweeps=s, **kw)
            elif kind == "tiled":
                x = fs.multisweep_relax_tiled(x, rhs, a, nsweeps=s,
                                              bx=prm[0], by=prm[1], **kw)
            elif kind == "pipelined":
                x = fs.multisweep_relax_pipelined(x, rhs, a, nsweeps=s, **kw)
            elif kind == "slab":
                x = fs.multisweep_relax(x, rhs, a, nsweeps=s, bx=prm, **kw)
            elif kind == "flat":
                x = fs.multisweep_relax_flat(x, rhs, a, nsweeps=s, bx=prm,
                                             **kw)
            else:
                raise AssertionError((kind, "xla leftover in probe"))
        return x

    return run, plan


def ab(n, n_sweeps=40, trials=6):
    spec, a, rhs, u = setup(n)
    f32, plan = variant(spec, a, rhs, n_sweeps, None)
    b16, _ = variant(spec, a, rhs, n_sweeps, "bfloat16")
    print(f"{n}^3 plan: {plan}", flush=True)
    # compile + numerics check
    o32 = f32(u); bar(o32)
    try:
        o16 = b16(u); bar(o16)
    except Exception as e:
        print(f"{n}^3 bf16 COMPILE FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")
        return
    rel = float(jnp.max(jnp.abs(o16 - o32)) / jnp.max(jnp.abs(o32)))
    print(f"{n}^3 bf16-vs-f32 rel dev after {n_sweeps} sweeps: {rel:.3e}",
          flush=True)
    t32, t16 = [], []
    for _ in range(trials):
        t0 = time.perf_counter(); bar(f32(u)); t32.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); bar(b16(u)); t16.append(time.perf_counter() - t0)
    r = sorted(b / a2 for a2, b in zip(t32, t16))
    print(f"{n}^3: f32 med {sorted(t32)[trials//2]*1e3:.1f} ms, bf16 med "
          f"{sorted(t16)[trials//2]*1e3:.1f} ms, per-trial bf16/f32 ratios "
          f"{['%.3f' % x for x in r]}", flush=True)


def compile_check_small():
    """Every family at bf16 through Mosaic on tiny shapes."""
    kinds = (("dirichlet", "dirichlet"),) * 3
    kw = dict(kinds=kinds, rho=2.0, alpha=1.0, beta=-1.0, dx=0.1,
              lo=(0, 0, 0), interpret=False, compute_dtype="bfloat16")
    rng = np.random.default_rng(1)

    def f(shape, seed=0):
        return (jnp.asarray(rng.standard_normal(shape), jnp.float32),
                jnp.asarray(rng.standard_normal(shape), jnp.float32),
                jnp.asarray(rng.uniform(0.5, 2.0, shape), jnp.float32))

    u, r, a = f((16, 8, 128))
    for name, call in [
        ("resident", lambda: fs.resident_relax(u, r, a, nsweeps=2, **kw)),
        ("pipelined", lambda: fs.multisweep_relax_pipelined(
            u, r, a, nsweeps=2, **kw)),
        ("slab", lambda: fs.multisweep_relax(u, r, a, nsweeps=2, bx=8, **kw)),
    ]:
        try:
            bar(call())
            print(f"compile ok: {name}", flush=True)
        except Exception as e:
            print(f"compile FAILED: {name}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    u2, r2, a2 = f((64, 64, 128))
    try:
        bar(fs.multisweep_relax_tiled(u2, r2, a2, nsweeps=2, bx=16, by=16,
                                      **kw))
        print("compile ok: tiled", flush=True)
    except Exception as e:
        print(f"compile FAILED: tiled: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    u3, r3, a3 = f((32, 16, 16))
    try:
        bar(fs.multisweep_relax_flat(u3, r3, a3, nsweeps=4, bx=16, **kw))
        print("compile ok: flat", flush=True)
    except Exception as e:
        print(f"compile FAILED: flat: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    compile_check_small()
    ab(256)
    ab(512, trials=4)
