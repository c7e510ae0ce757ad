"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Per SURVEY §4, the reference tests its sync engine as a pure state machine
with fake handles; the analog here is running every kernel and sharding
test on the CPU backend with 8 virtual devices, reserving real TPUs for
benchmarks (bench.py).

Note: this machine's sitecustomize registers the ``axon`` TPU platform and
sets ``jax_platforms`` programmatically, so the env var alone is not
enough — we must override the config after importing jax, before any
backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
