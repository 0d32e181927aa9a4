#!/bin/bash
# Launch the solver across a multi-host TPU pod slice.
#
# The TPU-native counterpart of the reference's cluster job script
# (jobscript.pbs: 24 MPI ranks via mpirun under LSF). On Cloud TPU pods the
# per-host processes are started by the TPU runtime; jax.distributed
# auto-discovers the coordinator, so the same command runs on every host:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd $REPO && bash scripts/run_tpu_pod.sh params.txt"
#
# Single-host / single-chip runs work with the identical invocation.

set -euo pipefail

PARAMS="${1:-params.txt}"
shift || true

export JAX_ENABLE_X64=1

python - "$PARAMS" "$@" <<'PY'
import sys

from mg_ic_code_tpu.parallel import distributed
from mg_ic_code_tpu.main import run

distributed.initialize()  # MPI_Init equivalent; no-op single-process
sys.exit(run(["run_tpu_pod"] + sys.argv[1:]))
PY
