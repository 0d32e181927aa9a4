"""Multi-host bootstrap and host-aware mesh construction.

Equivalent of the reference's MPI_Init/MPI_Finalize process bootstrap
(Main_PoissonSolver.cpp:261-263, 289-291): `initialize()` wraps
jax.distributed.initialize so an N-host TPU slice presents all its chips in
jax.devices(); `host_mesh()` then builds the device mesh with the host
dimension outermost so slab halos between neighbouring x-shards ride ICI
within a host/slice and only the outermost cuts cross DCN (the layout rule
from the scaling playbook; SURVEY §2c).

On a single process everything degrades to no-ops, so the same driver code
runs 1-chip and N-host unchanged.
"""

from __future__ import annotations

import jax

from mg_ic_code_tpu.parallel import mesh as pmesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime (idempotent; no-op single-host).

    With no arguments, uses the TPU environment's auto-detection (the
    standard jax.distributed behaviour on Cloud TPU pods).
    """
    # NOTE: do not probe jax.process_count() here — it initialises the XLA
    # backend, after which jax.distributed.initialize refuses to run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        if "only be called once" in str(e):
            return  # already initialised: idempotent no-op
        if coordinator_address is not None:
            # an explicitly requested multi-process bootstrap must not fail
            # silently (the reference would MayDay out of MPI_Init)
            raise
        # auto-detection on a single-process / non-pod environment: run
        # standalone
        pass


def choose_mesh_shape(
    n_cells: tuple[int, int, int], ndev: int
) -> tuple[int, ...]:
    """Mesh topology for a base grid of `n_cells` on `ndev` devices:
    prefer 1-D x slabs (one exchange axis, least communication); go to an
    (x, y) pencil when x alone cannot give every device a useful slab
    (>= MIN_LOCAL_NX rows, evenly dividing — the same usefulness rule
    parallel.mesh.level_spec shards by). Among feasible pencils pick the
    most slab-like (largest sx): deep-halo x exchanges are the
    production-optimised path (halo.sharded_relax).

    DESIGN RULE (explicit, not a fallback): the chooser NEVER emits a z
    mesh axis. z is the lane (minor-most) dimension of every Pallas
    kernel layout, so a z-sharded level loses the whole fused kernel
    family (multigrid.relax would run the explicit-halo XLA body there —
    docs/PERF.md "z-axis rule"). An (x, y) pencil of equal device count
    always moves no more halo data than an (x, z) one on these grids, so
    there is nothing to buy with z; z-sharding remains reachable only by
    constructing a 3-D mesh manually (parallel.mesh.make_mesh), and the
    halo paths still handle it correctly. Locked by
    tests/test_parallel.py::test_choose_mesh_shape_never_shards_z."""
    nx, ny = n_cells[0], n_cells[1]

    def ok(n, s):
        return s == 1 or (n % s == 0 and n // s >= pmesh.MIN_LOCAL_NX)

    if ok(nx, ndev):
        return (ndev,)
    for sx in range(ndev - 1, 0, -1):
        if ndev % sx:
            continue
        sy = ndev // sx
        if ok(nx, sx) and ok(ny, sy):
            return (sx, sy)
    return (ndev,)  # nothing divides usefully: level_spec will replicate


def host_mesh(n_cells: tuple[int, int, int] | None = None):
    """Device mesh ordered host-major: consecutive mesh coordinates land on
    the same host, so the slab/pencil halo exchanges of neighbouring
    shards ride ICI within a host and only the outermost seams cross DCN
    (the reference's analogue is jobscript.pbs handing rank placement to
    the scheduler; here the layout is ours to pin). With `n_cells`, the
    1-D-vs-pencil topology is chosen by choose_mesh_shape."""
    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    n = len(devs)
    shape = (n,) if n_cells is None else choose_mesh_shape(n_cells, n)
    return pmesh.make_mesh(devs, shape)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def gather_global(x):
    """Full global value of a (possibly multi-host-sharded) array as host
    numpy — the role MPI gathers play before the reference's rank-0 HDF5
    writes (WriteOutput.H routes everything through Chombo's parallel
    writers; jobscript.pbs runs 24 ranks).

    COLLECTIVE when the array is not fully addressable: every process must
    call it (process_allgather runs an all-gather over the global mesh).
    Single-process and host-local arrays take the trivial path.
    """
    import numpy as np

    if isinstance(x, np.ndarray):
        return x
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def stream_global_slabs(x, axis: int = 0, max_bytes: int = 1 << 25):
    """Yield (start, host-numpy block) tiles of a (possibly
    multi-host-sharded) array along `axis`, gathering at most ~max_bytes
    per tile — the streamed replacement for a full-level gather_global in
    the HDF5 writers (VERDICT r4 #7: at 512^3+ multi-host, materialising
    whole levels on host 0 is the memory and DCN bottleneck; the
    reference writes through parallel HDF5, WriteOutput.H:107-113).

    COLLECTIVE when the array is not fully addressable: every process
    must drain the FULL generator in the same order (each tile is a
    process_allgather). Addressable arrays yield one host-local tile."""
    import numpy as np

    if isinstance(x, np.ndarray):
        yield 0, x
        return
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        yield 0, np.asarray(x)
        return
    from jax.experimental import multihost_utils

    n = x.shape[axis]
    row_bytes = (x.size // max(n, 1)) * x.dtype.itemsize
    rows = max(1, min(n, max_bytes // max(row_bytes, 1)))
    for a in range(0, n, rows):
        b = min(n, a + rows)
        sl = tuple(
            slice(a, b) if d == axis else slice(None) for d in range(x.ndim)
        )
        yield a, np.asarray(
            multihost_utils.process_allgather(x[sl], tiled=True)
        )
