"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference repo has no test framework (SURVEY.md section 4); we build our
own pyramid. Multi-device code paths (dp mesh, psum collectives) are
exercised with XLA's host-platform device virtualization so the suite runs
anywhere, including machines with no TPU.

Note: in this image a sitecustomize hook preloads jax with a TPU platform
(JAX_PLATFORMS=axon), so env vars alone are too late — we must flip the
platform through jax.config before the first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Skip LLVM's expensive optimization passes: XLA:CPU compile time (not
# execution) dominates this suite, and this flag measures ~2.4x faster
# compiles for the train-step graph with unchanged numerics (no fast-math).
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
# Same trade at the HLO-pass level: opt level 0 cuts the flagship-test
# compile 197s -> 144s cold with unchanged results (tiny test shapes don't
# need the optimizer; no fast-math involved).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the flagship-model jits dominate suite time;
# cache them across runs (safe: keyed on jaxpr + flags).
import tempfile  # noqa: E402

_CACHE = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "butd_detr_tpu_jax_cache"),
)
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
