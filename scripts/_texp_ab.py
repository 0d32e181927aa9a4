"""Interleaved ratio A/B of smoother kernels at 256^3: relay speed drifts,
so candidates are timed round-robin and compared per-trial to production."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.ops import fused_sweeps as fs

n, NS = 256, 40
geom = single_level_geom(n, 1.0, BCSpec())
spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=4, smoother="pallas")
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0.5,2.0,(n,n,n)), jnp.float32)
coefs = mg.build_level_coefs_jit(spec, a)
rhs = jnp.asarray(rng.standard_normal((n,n,n)), jnp.float32)
u0 = jnp.zeros_like(rhs)
kw = dict(kinds=spec.kinds, rho=spec.rho[0], alpha=spec.alpha, beta=spec.beta,
          dx=spec.dx[0], lo=spec.boxes[0].lo, interpret=False)
def barrier(x):
    jax.block_until_ready(x); return float(jnp.sum(x))

def make(kind, S, bx=None):
    def f(x):
        for _ in range(NS // S):
            if kind == "pipelined":
                x = fs.multisweep_relax_pipelined(x, rhs, coefs["a"][0], nsweeps=S, **kw)
            else:
                x = fs.multisweep_relax(x, rhs, coefs["a"][0], nsweeps=S, bx=bx, **kw)
        return x
    return jax.jit(f)

cands = [
    ("prod pipelined S4", make("pipelined", 4)),
    ("slab S4 bx16", make("slab", 4, 16)),
    ("slab S4 bx32", make("slab", 4, 32)),
    ("slab S8 bx16", make("slab", 8, 16)),
]
ok, ref_out = [], None
for name, f in cands:
    t0 = time.perf_counter()
    try:
        r = f(u0); barrier(r)
    except Exception as e:
        print(f"{name}: SKIP ({type(e).__name__}: {str(e)[:100]})", flush=True)
        continue
    print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    if ref_out is None: ref_out = r
    err = float(jnp.max(jnp.abs(r - ref_out)))
    ok.append((name, f, err))

times = {name: [] for name, _, _ in ok}
for trial in range(6):
    for name, f, _ in ok:
        t0 = time.perf_counter(); barrier(f(u0))
        times[name].append(time.perf_counter() - t0)
ref_ts = times[ok[0][0]]
for name, f, err in ok:
    ts = times[name]
    ratios = sorted(t / r for t, r in zip(ts, ref_ts))
    med = ratios[len(ratios)//2]
    print(f"{name}: best {min(ts)*1e3:6.1f} ms ({n**3*NS/min(ts):.3e} DOF/s) "
          f"ratio-vs-prod {med:.2f} maxerr {err:.1e}", flush=True)
