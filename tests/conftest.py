"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on a
virtual CPU mesh (the same pattern the reference uses for multi-node tests without
a cluster — reference: velox/exec/tests/MultiFragmentTest.cpp:40 runs several Tasks
in one process over a fake transport).

Note: the environment's sitecustomize force-registers a remote TPU backend and sets
jax_platforms, so plain env vars are not enough — we must override the config after
import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# the persistent XLA cache is for the (slow) remote TPU compiler; on CPU it can
# load AOT results compiled for a different host CPU profile (SIGILL risk)
os.environ["VELOX_TPU_XLA_CACHE"] = "off"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
