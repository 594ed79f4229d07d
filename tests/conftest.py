"""Test configuration: force an 8-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

IMPORTANT: this environment's sitecustomize registers the 'axon' remote-TPU
PJRT plugin and force-sets jax_platforms="axon,cpu", overriding the
JAX_PLATFORMS env var. Tests must run on LOCAL CPU (the tunneled TPU is a
single shared chip; concurrent test processes wedge it), so we override the
jax config directly before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Sequential CPU runtime: the thunk executor's work-stealing order on
# INDEPENDENT collectives differs per device thread and can deadlock the
# cross-device rendezvous (hard 40s abort — seen on GSPMD FSDP all-gathers
# in the dryrun). Determinism matters more than intra-op parallelism on
# this 1-core host.
if "xla_cpu_use_thunk_runtime" not in flags:
    flags = (flags + " --xla_cpu_use_thunk_runtime=false").strip()
# The thunk executor's collective rendezvous hard-aborts the PROCESS when
# any device thread is >40s late ("Expected 8 threads to join ... only 7
# arrived", rendezvous.cc). On this 1-core host a worker thread can be
# starved that long by a concurrent compile, killing an otherwise-correct
# run — observed as a flaky SIGABRT roughly every other full-suite run.
# Raise the timeout so stragglers wait instead of aborting.
if "collective_call_terminate_timeout" not in flags:
    flags = (flags +
             " --xla_cpu_collective_call_terminate_timeout_seconds=600"
             ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache (single-core host: compiles dominate cold starts),
# scoped by a host-CPU fingerprint: XLA:CPU AOT entries compiled on a machine
# with different ISA features SIGILL when loaded (axon sessions migrate
# hosts), so foreign entries must never be visible.
from vlp_tpu.utils.cache import host_scoped_cache_dir  # noqa: E402

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    host_scoped_cache_dir(
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
        "cpu8"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The env vars above are read at jax-import time, and importing
# vlp_tpu.utils.cache can itself pull in jax first — set the cache config
# explicitly so the persistent cache engages regardless of import order
# (same pattern as __graft_entry__.dryrun_multichip).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu", "tests must not touch the shared TPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_kernel_mesh():
    """The kernel mesh is a process-wide global set by create_mesh/step
    factories; reset it per test so kernel-path dispatch is deterministic
    regardless of test order."""
    from vlp_tpu.ops.kernel_gate import set_kernel_mesh

    set_kernel_mesh(None)
    yield
    set_kernel_mesh(None)
