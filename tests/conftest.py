"""Test harness config: CPU backend with 8 virtual devices, float64.

The multi-chip sharding tests run on a virtual 8-device CPU mesh — the
TPU-world equivalent of a fake distributed backend (see SURVEY §4).
Must run before jax is imported anywhere.
"""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunnelled
# TPU chip), but tests need the 8-virtual-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu" (the tunnelled
# TPU); override programmatically before any backend initialises
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# persistent compile cache: the solver graphs are large and shapes repeat
# across test runs
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
