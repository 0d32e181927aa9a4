import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.ops import fused_sweeps as fs

n, B, S = 144, 3, 4
geom = single_level_geom(n, 1.0, BCSpec())
spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=S, smoother="pallas")
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0.5,2.0,(B,n,n,n)), jnp.float32)
rhs = jnp.asarray(rng.standard_normal((B,n,n,n)), jnp.float32)
u = jnp.asarray(rng.standard_normal((B,n,n,n)), jnp.float32)
kw = dict(kinds=spec.kinds, rho=spec.rho[0], alpha=spec.alpha, beta=spec.beta,
          dx=spec.dx[0], lo=spec.boxes[0].lo, interpret=False, nsweeps=S)
def barrier(x):
    jax.block_until_ready(x); return float(jnp.sum(x))
REP = 10
def seq(u, rhs, a):
    outs = []
    for i in range(B):
        ui = u[i]
        for _ in range(REP):
            ui = fs.resident_relax(ui, rhs[i], a[i], **kw)
        outs.append(ui)
    return jnp.stack(outs)
def bat(u, rhs, a):
    f = lambda uu, rr, aa: fs.resident_relax(uu, rr, aa, **kw)
    for _ in range(REP):
        u = jax.vmap(f)(u, rhs, a)
    return u
fs_seq = jax.jit(seq); fs_bat = jax.jit(bat)
r1 = fs_seq(u, rhs, a); barrier(r1)
print("sequential compiled", flush=True)
r2 = fs_bat(u, rhs, a); barrier(r2)
print("vmapped compiled; bitwise equal:", bool(jnp.all(r1 == r2)), flush=True)
ts = {"seq": [], "bat": []}
for _ in range(6):
    t0=time.perf_counter(); barrier(fs_seq(u, rhs, a)); ts["seq"].append(time.perf_counter()-t0)
    t0=time.perf_counter(); barrier(fs_bat(u, rhs, a)); ts["bat"].append(time.perf_counter()-t0)
rat = sorted(b/s for b, s in zip(ts["bat"], ts["seq"]))[3]
print(f"seq best {min(ts['seq'])*1e3:.1f} ms, bat best {min(ts['bat'])*1e3:.1f} ms, "
      f"median ratio bat/seq {rat:.2f}")
