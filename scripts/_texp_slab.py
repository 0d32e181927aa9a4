import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.ops import fused_sweeps as fs

n = int(sys.argv[1]); S = int(sys.argv[2]); variant = sys.argv[3]
bx = int(sys.argv[4]) if len(sys.argv) > 4 else None
nch = 40 // S
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
def one(x):
    if variant == "pipelined":
        return fs.multisweep_relax_pipelined(x, rhs, coefs["a"][0], nsweeps=S, **kw)
    return fs.multisweep_relax(x, rhs, coefs["a"][0], nsweeps=S, bx=bx, **kw)
def f(x):
    for _ in range(nch):
        x = one(x)
    return x
fj = jax.jit(f)
r = fj(u0); barrier(r)
uref = jax.jit(lambda x: jax.lax.fori_loop(0, 2*nch*S, lambda i, uu: mg.gsrb_half_sweep(spec, coefs, 0, uu, rhs, i % 2), x))(u0)
barrier(uref)
err = float(jnp.max(jnp.abs(r - uref)))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); barrier(fj(u0)); ts.append(time.perf_counter() - t0)
dt = min(ts)
print(f"n={n} S={S} {variant} bx={bx} x{nch}: {dt*1e3:.1f} ms -> {n**3*nch*S/dt:.3e} DOF/s (maxerr {err:.1e})")
