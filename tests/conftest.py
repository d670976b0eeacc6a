"""Test configuration: force an 8-device virtual CPU mesh.

Every sharded test runs on this mesh and the same code runs unchanged on a
real TPU slice (SURVEY.md §4 "distributed without a cluster").

Note: this environment's sitecustomize imports jax and pins
JAX_PLATFORMS=axon (single real TPU chip) before any user code runs, so env
vars alone don't stick — ``jax.config.update`` before first backend use is
what actually selects the CPU platform.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass  # backends already initialized (e.g. running on a real slice)

# repo root importable regardless of cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: most of the suite's wall time is XLA
# compiles that are identical run to run
from llm_speech_summarization_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()
