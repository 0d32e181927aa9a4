"""Headline benchmark: GSRB smoother throughput at 256^3 on one chip.

Usage: python bench.py [N] [mode]   (mode: pallas_f32 | xla_f32 | xla_f64)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` reports the achieved fraction of the chip's HBM roofline for
the smoother sweep — the driver-set north-star target is >= 0.70
(BASELINE.json). Roofline model per colour pass: 4 array streams of N
cells (u read + halo, rhs read, aCoef read, u write; lambda is recomputed
in-register), i.e. 8 streams per full red+black sweep.

The headline mode is the production configuration: the fused Pallas f32
smoother (the mixed-precision preconditioner path; the f64 outer Krylov is
not smoother-bound). Extra diagnostics go to stderr; stdout carries only
the JSON line.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

_REPO = os.path.dirname(os.path.abspath(
    globals().get("__file__", "bench.py")
))
_CACHE_PATH = os.path.join(_REPO, "docs", "last_bench.json")


def _watchdog(signum, frame):
    """The tunnelled TPU relay sometimes wedges (hangs instead of erroring).
    Emit the last LIVE measurement, clearly labelled, rather than nothing."""
    try:
        cached = json.load(open(_CACHE_PATH))
        cached["metric"] = cached.get("metric", "") + \
            " [CACHED prior live run: live bench timed out, relay down]"
        print(json.dumps(cached), flush=True)
    except Exception:
        print(json.dumps({
            "metric": "bench timed out (TPU relay down, no cached result)",
            "value": 0.0, "unit": "DOF-updates/s", "vs_baseline": 0.0,
        }), flush=True)
    os._exit(0)


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(1500)

import numpy as np  # noqa: E402

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom  # noqa: E402
from mg_ic_code_tpu.solver import multigrid as mg  # noqa: E402

# HBM bandwidth (bytes/s) by device kind, for the roofline denominator
HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.19e11,  # v5e
    "TPU v5e": 8.19e11,
    "TPU v5p": 2.765e12,
    "TPU v5": 2.765e12,
    "TPU v6 lite": 1.64e12,
    "cpu": 5.0e10,
}


def device_bandwidth() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if kind.lower().startswith(k.lower()):
            return v
    return HBM_BW["cpu"]


def barrier(x):
    # a scalar device->host readback: block_until_ready alone does not
    # reliably block under the axon-tunnelled TPU platform
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def run_sharded(n: int, sweeps: int):
    """Multi-device halo-exchange smoother throughput (all local devices,
    1-D slab mesh): the weak-scaling measurement of BASELINE.json config 5.
    Returns (dof_per_s, roofline_frac aggregated over devices)."""
    import time as _time

    from mg_ic_code_tpu.parallel import halo, mesh as pmesh
    from mg_ic_code_tpu.grid.geometry import BCSpec as _BC

    dtype = jnp.float64
    geom = single_level_geom(n, 1.0, _BC())
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=sweeps,
                              smoother="xla")
    m = pmesh.make_mesh()
    ndev = m.shape[pmesh.AXIS]
    sh = pmesh.level_sharding(geom, 0, m, min_local=2)
    rng = np.random.default_rng(0)
    a = jax.device_put(jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n)), dtype), sh)
    coefs = mg.build_level_coefs_jit(spec, a)
    lam = jax.device_put(coefs["lam"][0], sh)
    rhs = jax.device_put(
        jnp.asarray(rng.standard_normal((n, n, n)), dtype), sh
    )
    u = jax.device_put(jnp.zeros((n, n, n), dtype), sh)
    relax_fn, _ = halo.make_sharded_level_ops(spec, m, 0, nsweeps=sweeps)
    f = jax.jit(relax_fn)
    u = f(a, lam, u, rhs)
    barrier(u)
    t0 = _time.perf_counter()
    reps = 3
    for _ in range(reps):
        u = f(a, lam, u, rhs)
    barrier(u)
    dt = (_time.perf_counter() - t0) / reps
    cells = float(n) ** 3
    dof_per_s = cells * sweeps / dt
    bw = 10.0 * cells * jnp.dtype(dtype).itemsize * sweeps / dt
    frac = bw / (device_bandwidth() * ndev)
    print(f"sharded over {ndev} device(s): {dof_per_s:.3e} DOF/s, "
          f"{frac:.2%} of aggregate roofline", file=sys.stderr)
    return dof_per_s, frac


def run_mode(n: int, mode: str, sweeps: int):
    smoother = {"pallas_f32": "pallas", "xla_f32": "xla", "xla_f64": "xla"}[
        mode
    ]
    dtype = jnp.float64 if mode == "xla_f64" else jnp.float32

    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(
        geom, 0, alpha=1.0, beta=-1.0, nsmooth=sweeps, smoother=smoother
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n)), dtype)
    coefs = mg.build_level_coefs_jit(spec, a)
    rhs = jnp.asarray(rng.standard_normal((n, n, n)), dtype)
    u = jnp.zeros_like(rhs)

    # warm-up / compile
    u = mg.relax_jit(spec, coefs, 0, u, rhs, sweeps)
    barrier(u)
    return spec, coefs, rhs, u, dtype


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas_f32"
    sweeps = 10

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), mode: {mode}",
          file=sys.stderr)

    if mode == "sharded":
        dof_per_s, frac = run_sharded(n, sweeps)
        print(json.dumps({
            "metric": f"sharded halo-exchange GSRB DOF-updates/s at {n}^3 "
                      f"f64 over {len(jax.devices())} devices",
            "value": dof_per_s,
            "unit": "DOF-updates/s",
            "vs_baseline": frac,
        }))
        return

    # headline is the fused-Pallas mixed-precision smoother; if the kernel
    # path fails on this runner, fall back rather than report nothing
    fallbacks = {"pallas_f32": ["pallas_f32", "xla_f32", "xla_f64"]}.get(
        mode, [mode]
    )
    last_err = None
    for m in fallbacks:
        try:
            spec, coefs, rhs, u, dtype = run_mode(n, m, sweeps)
            mode = m
            break
        except Exception as e:  # noqa: BLE001 — report and try next mode
            print(f"mode {m} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            last_err = e
    else:
        raise last_err

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        u = mg.relax_jit(spec, coefs, 0, u, rhs, sweeps)
    barrier(u)
    dt = (time.perf_counter() - t0) / reps

    cells = float(n) ** 3
    dof_per_s = cells * sweeps / dt
    bytes_per_sweep = 8.0 * cells * jnp.dtype(dtype).itemsize
    achieved_bw = bytes_per_sweep * sweeps / dt
    roofline_frac = achieved_bw / device_bandwidth()

    # one V-cycle wall time for context
    v = mg.mg_vcycle_jit(spec, coefs, jnp.zeros_like(rhs), rhs)
    barrier(v)
    t0 = time.perf_counter()
    v = mg.mg_vcycle_jit(spec, coefs, v, rhs)
    barrier(v)
    vcycle_s = time.perf_counter() - t0

    print(
        f"smoother: {dof_per_s:.3e} DOF-updates/s  "
        f"({achieved_bw / 1e9:.1f} GB/s, {roofline_frac:.2%} of roofline); "
        f"V-cycle({n}^3): {vcycle_s * 1e3:.1f} ms",
        file=sys.stderr,
    )
    result = {
        "metric": (
            f"GSRB smoother DOF-updates/s/chip at {n}^3 ({mode}; "
            "includes ~2-3 ms/launch axon-tunnel dispatch overhead "
            "- marginal kernel rate is ~4x higher, docs/PERF.md)"
        ),
        "value": dof_per_s,
        "unit": "DOF-updates/s",
        "vs_baseline": roofline_frac,
    }
    signal.alarm(0)
    try:  # remember the last live result for the relay-down fallback
        json.dump(result, open(_CACHE_PATH, "w"))
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
