"""Headline benchmark: GSRB smoother throughput at 256^3 on one chip.

Usage: python bench.py [N] [mode]   (mode: pallas_f32 | xla_f32 | xla_f64)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...evidence}

`value` is the MARGINAL smoother rate: the slope between a 16-sweep and a
40-sweep relax call, which subtracts the fixed per-dispatch cost of this
rig's tunnelled TPU relay (~16 ms/call, drifting 2-3x minute to minute —
docs/PERF.md). Round 3's raw-headline `value` moved 11% round-over-round
purely with relay drift (VERDICT r3 weak #1); the slope is measured over
INTERLEAVED hi/lo trial pairs (median of per-pair slopes), so a drift
episode hits both points of a pair alike and cancels. The raw 40-sweep
headline (dispatch included) stays in evidence as `headline_dof_s`.

`vs_baseline` grades `value` against the IDEAL-TRAFFIC roofline at the
production sweep depth: BW * S / (4 * itemsize) DOF/s for S-sweep
temporal blocking (u read + write + rhs + a once per S sweeps; S = 4 =
the production numMGsmooth). This denominator is FIXED per (shape, S,
dtype) — it does not move when the kernel changes — so vs_baseline rises
IFF the kernel gets faster (VERDICT r4 #2: the previous actual-traffic
denominator shrank with each kernel improvement and the graded fraction
moved anti-correlated with real progress). The per-variant modeled
actual-traffic fraction stays in evidence (`actual_traffic_frac`).
Restated north star (BASELINE.md round 5): >= 0.65 of this ideal-S4
roofline — the VPU-wall ceiling of the redundancy-free wavefront pass at
its current op count.

Evidence fields for cross-round comparability (VERDICT r1 weak #9):
  * launches         — kernel launches in the measured region
  * headline_dof_s   — raw 40-sweep rate with dispatch included (the old
                       `value`; lower bound of untunnelled hardware)
  * model8_frac      — the legacy 8-stream model fraction (old vs_baseline)
  * vcycle_ms        — one full MG V-cycle at N^3 (solve-path regression
                       canary, VERDICT r1 next-step #4)
  * cached           — true only when the relay-down watchdog replayed a
                       previous live result (ADVICE r1)

The headline mode is the production configuration: the fused Pallas
smoother at the preconditioner precision (the f64 outer Krylov is not
smoother-bound). Extra diagnostics go to stderr; stdout carries only the
JSON line.
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
        cached["cached"] = True
        print(json.dumps(cached), flush=True)
    except Exception:
        print(json.dumps({
            "metric": "bench timed out (TPU relay down, no cached result)",
            "value": 0.0, "unit": "DOF-updates/s", "vs_baseline": 0.0,
            "cached": True,
        }), flush=True)
    os._exit(0)


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(1500)

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

SWEEPS = 40       # headline sweep count per timed call
SWEEPS_LO = 16    # second point for the marginal-rate fit
IDEAL_S = 4       # production numMGsmooth: the S of the graded
                  # ideal-traffic roofline (BW*S/(4*itemsize) DOF/s)


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


def count_launches(spec, shape, n_sweeps: int) -> int:
    """Kernel launches relax() will issue for n_sweeps at this shape —
    read straight off relax_kernel_plan (the dispatch's single source of
    truth), so bench can never drift from the real ladder again."""
    launches = 0
    for kind, s, _ in mg.relax_kernel_plan(shape, n_sweeps, spec.kinds):
        # an "xla" entry is s fused colour-pass pairs, not kernel
        # launches; count its colour passes for cross-round continuity
        launches += 2 * s if kind == "xla" else 1
    return launches


def count_traffic(spec, shape, n_sweeps: int, itemsize: int) -> float:
    """Estimated HBM bytes relax() actually moves for n_sweeps (the
    temporally-blocked kernels re-read halo overlap instead of paying the
    8-stream/sweep model; VERDICT r2 weak #8 asks for this fraction as
    headline evidence, not just the model number). Walks
    relax_kernel_plan so the traffic model covers exactly the launches
    relax issues, including odd/misaligned leftovers."""
    cells = float(shape[0] * shape[1] * shape[2])

    def slab_chunk(bx: int, s: int) -> float:
        return cells * itemsize * (3.0 * (bx + 4.0 * s) / bx + 1.0)

    bytes_total = 0.0
    for kind, s, prm in mg.relax_kernel_plan(shape, n_sweeps, spec.kinds):
        if kind in ("resident", "wave", "wavef"):
            # u/rhs/a read + u write, once for all s sweeps (the
            # wavefront carries its staircase tails in VMEM scratch, so
            # like the resident kernel it has NO read amplification)
            bytes_total += 4.0 * cells * itemsize
        elif kind == "tiled":
            bx, by = prm
            f = (bx + 4.0 * s) * (by + 4.0 * s) / (bx * by)
            bytes_total += cells * itemsize * (3.0 * f + 1.0)
        elif kind in ("pipelined", "flatp"):
            # mid block bx == width * 2*nsweeps with 2*nsweeps-row halo
            # blocks either side -> 3*(w+2)/w + 1 streams per s-sweep
            # chunk (10 at width 1, 7 at width 2, 5.5 at width 4)
            bytes_total += slab_chunk(2 * s * (prm or 1), s)
        elif kind in ("slab", "flat"):
            bytes_total += slab_chunk(prm, s)
        else:  # "legacy" pair kernel or "xla" passes: 8 streams/sweep
            bytes_total += 8.0 * cells * itemsize * s
    return bytes_total


def run_sharded(n: int, sweeps: int):
    """Multi-device halo-exchange smoother throughput (all local devices,
    1-D slab mesh): the weak-scaling measurement of BASELINE.json config 5,
    measuring the PRODUCTION sharded smoother — f32 mixed-precision
    `multigrid.relax` with spec.mesh set, which dispatches the
    Pallas-in-shard_map deep-halo kernels (halo.sharded_relax) wherever the
    local slab supports them (VERDICT r2 weak #2: the old mode hardcoded
    the XLA f64 fallback and measured a path the solver never runs).
    Returns (dof_per_s, roofline_frac aggregated over devices)."""
    import time as _time

    from mg_ic_code_tpu.parallel import mesh as pmesh

    dtype = jnp.float32
    geom = single_level_geom(n, 1.0, BCSpec())
    m = pmesh.make_mesh()
    ndev = m.shape[pmesh.AXIS]
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=sweeps,
                              mesh=m)
    sx = mg._shard_counts(spec, 0)[0]
    sh = pmesh.level_sharding(geom, 0, m)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.device_put(jax.random.uniform(k1, (n, n, n), dtype, 0.5, 2.0), sh)
    coefs = mg.build_level_coefs_jit(spec, a)
    rhs = jax.device_put(jax.random.normal(k2, (n, n, n), dtype), sh)
    u = jax.device_put(jnp.zeros((n, n, n), dtype), sh)
    u = mg.relax_jit(spec, coefs, 0, u, rhs, sweeps)
    barrier(u)
    t0 = _time.perf_counter()
    reps = 3
    for _ in range(reps):
        u = mg.relax_jit(spec, coefs, 0, u, rhs, sweeps)
    barrier(u)
    dt = (_time.perf_counter() - t0) / reps
    cells = float(n) ** 3
    dof_per_s = cells * sweeps / dt
    bw = 8.0 * cells * jnp.dtype(dtype).itemsize * sweeps / dt
    frac = bw / (device_bandwidth() * ndev)
    print(f"sharded over {ndev} device(s) (explicit x-shards {sx}, f32 "
          f"production dispatch): {dof_per_s:.3e} DOF/s, "
          f"{frac:.2%} of aggregate 8-stream roofline", file=sys.stderr)
    return dof_per_s, frac


def setup_mode(n: int, mode: str):
    smoother = {"pallas_f32": "pallas", "xla_f32": "xla", "xla_f64": "xla"}[
        mode
    ]
    dtype = jnp.float64 if mode == "xla_f64" else jnp.float32

    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(
        geom, 0, alpha=1.0, beta=-1.0, nsmooth=4, smoother=smoother
    )
    # on-device RNG: a 64 MB host->device upload can stall for minutes when
    # the relay's send path is congested (observed 2026-08-20); the kernel
    # timing is value-independent, only the key crosses the wire
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.uniform(k1, (n, n, n), dtype, 0.5, 2.0)
    coefs = mg.build_level_coefs_jit(spec, a)
    rhs = jax.random.normal(k2, (n, n, n), dtype)
    u = jnp.zeros_like(rhs)
    # warm-up / compile both sweep counts
    barrier(mg.relax_jit(spec, coefs, 0, u, rhs, SWEEPS))
    barrier(mg.relax_jit(spec, coefs, 0, u, rhs, SWEEPS_LO))
    return spec, coefs, rhs, u, dtype


def make_chained(spec, coefs, rhs, u, sweeps: int, reps: int = 3):
    """A jitted callable running `reps` n-sweep relax calls CHAINED INSIDE
    ONE JIT — the production shape: the solver runs the smoother inside a
    jitted solve, never as a bare host dispatch. On the tunnelled rig the
    two styles measure the same (31.3 vs 31.5 ms/rep at 256^3x40, A/B
    2026-08-19) because the relay's ~16 ms fixed cost is per-kernel-launch
    inside the program, not host dispatch; on untunnelled hardware the
    in-jit form avoids per-call dispatch. The chained calls are
    sequentially data-dependent, so XLA cannot elide any of them."""

    @jax.jit
    def chained(x):
        for _ in range(reps):
            x = mg.relax(spec, coefs, 0, x, rhs, sweeps)
        return x

    barrier(chained(u))  # compile
    return lambda: barrier(chained(u)), reps


def time_interleaved(run_hi, run_lo, trials: int = 5):
    """Time hi/lo sweep-count calls in back-to-back pairs, `trials` times.
    Returns (dt_hi_list, dt_lo_list) of per-call seconds, pair-ordered: a
    relay drift episode hits both members of a pair alike, so the per-pair
    slope (dt_hi - dt_lo) is drift-robust where either absolute time is
    not (VERDICT r3 weak #1: the round-3 headline moved 11% with the
    relay, not the code)."""
    fn_hi, reps_hi = run_hi
    fn_lo, reps_lo = run_lo
    hi, lo = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn_hi()
        hi.append((time.perf_counter() - t0) / reps_hi)
        t0 = time.perf_counter()
        fn_lo()
        lo.append((time.perf_counter() - t0) / reps_lo)
    return hi, lo


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas_f32"

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), mode: {mode}",
          file=sys.stderr)

    if mode == "sharded":
        dof_per_s, frac = run_sharded(n, 16)
        print(json.dumps({
            "metric": f"sharded production GSRB smoother DOF-updates/s at "
                      f"{n}^3 f32 over {len(jax.devices())} devices "
                      "(Pallas-in-shard_map dispatch)",
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
            spec, coefs, rhs, u, dtype = setup_mode(n, m)
            mode = m
            break
        except Exception as e:  # noqa: BLE001 — report and try next mode
            print(f"mode {m} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            last_err = e
    else:
        raise last_err

    run_hi = make_chained(spec, coefs, rhs, u, SWEEPS)
    run_lo = make_chained(spec, coefs, rhs, u, SWEEPS_LO)
    hi_ts, lo_ts = time_interleaved(run_hi, run_lo)

    cells = float(n) ** 3
    # per-pair slope = per-sweep cost with the fixed per-call dispatch
    # cancelled; median over pairs is the drift-robust headline `value`
    slopes = [
        (h - l) / (SWEEPS - SWEEPS_LO) for h, l in zip(hi_ts, lo_ts)
    ]
    marg = median(slopes)
    marginal_dof_s = cells / marg if marg > 0 else float("inf")
    dt_hi = median(hi_ts)
    headline_dof_s = cells * SWEEPS / dt_hi
    bytes_per_sweep = 8.0 * cells * jnp.dtype(dtype).itemsize
    model8_frac = bytes_per_sweep * SWEEPS / dt_hi / device_bandwidth()
    launches = count_launches(spec, (n, n, n), SWEEPS)
    overhead_ms = max(dt_hi - marg * SWEEPS, 0.0) * 1e3
    # the graded utilization: bytes the engaged kernel family ACTUALLY
    # moves (temporal blocking re-reads halo overlap instead of the naive
    # 8 streams/sweep) per sweep, against the marginal per-sweep time
    actual_bytes = count_traffic(
        spec, (n, n, n), SWEEPS, jnp.dtype(dtype).itemsize
    )
    actual_traffic_frac = (
        (actual_bytes / SWEEPS) / marg / device_bandwidth()
        if marg > 0 else 0.0
    )
    headline_traffic_frac = actual_bytes / dt_hi / device_bandwidth()
    # the GRADED fraction: variant-independent ideal-traffic roofline at
    # the production sweep depth (BW*S/(4*itemsize) DOF/s) — monotone
    # with `value` by construction (VERDICT r4 #2)
    ideal_roofline_dof = (
        device_bandwidth() * IDEAL_S / (4.0 * jnp.dtype(dtype).itemsize)
    )
    ideal_s4_frac = marginal_dof_s / ideal_roofline_dof

    # one V-cycle wall time for context (solve-path canary)
    v = mg.mg_vcycle_jit(spec, coefs, jnp.zeros_like(rhs), rhs)
    barrier(v)
    t0 = time.perf_counter()
    v = mg.mg_vcycle_jit(spec, coefs, v, rhs)
    barrier(v)
    vcycle_s = time.perf_counter() - t0

    print(
        f"smoother marginal: {marginal_dof_s:.3e} DOF-updates/s "
        f"({ideal_s4_frac:.2%} of the ideal-S4 roofline "
        f"{ideal_roofline_dof:.2e}; "
        f"{actual_traffic_frac:.2%} of actual-traffic roofline; "
        f"pair slopes {['%.2f' % (s * 1e3) for s in sorted(slopes)]} "
        f"ms/sweep); raw 40-sweep headline {headline_dof_s:.3e} DOF/s "
        f"({model8_frac:.2%} of the 8-stream model, "
        f"{headline_traffic_frac:.2%} actual-traffic, {launches} launches, "
        f"fixed dispatch ~{overhead_ms:.1f} ms/call); "
        f"V-cycle({n}^3): {vcycle_s * 1e3:.1f} ms",
        file=sys.stderr,
    )
    result = {
        "metric": (
            f"GSRB smoother marginal DOF-updates/s/chip at {n}^3 ({mode}): "
            "dispatch-floor-corrected slope between 16- and 40-sweep "
            "calls, median over interleaved trial pairs (drift-robust; "
            "VERDICT r3 #4). vs_baseline = fraction of the VARIANT-"
            "INDEPENDENT ideal-traffic roofline BW*S/(4*itemsize) at S=4 "
            "(monotone with value; VERDICT r4 #2; north star 0.65). "
            "Per-variant actual-traffic fraction in evidence - "
            "docs/PERF.md"
        ),
        "value": marginal_dof_s,
        "unit": "DOF-updates/s",
        "vs_baseline": ideal_s4_frac,
        "ideal_s4_roofline_dof_s": ideal_roofline_dof,
        "actual_traffic_frac": actual_traffic_frac,
        "launches": launches,
        "headline_dof_s": headline_dof_s,
        "model8_frac": model8_frac,
        "headline_traffic_frac": headline_traffic_frac,
        "pair_slopes_ms_per_sweep": [round(s * 1e3, 3) for s in slopes],
        "sweeps": SWEEPS,
        "dispatch_overhead_ms": overhead_ms,
        "vcycle_ms": vcycle_s * 1e3,
        "cached": False,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    signal.alarm(0)
    try:  # remember the last live result for the relay-down fallback
        json.dump(result, open(_CACHE_PATH, "w"))
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
