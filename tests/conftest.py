"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding logic is tested on a virtual CPU mesh
(``xla_force_host_platform_device_count``) so distributed code paths run
without TPU hardware — mirroring SURVEY.md §4's implication for the TPU build.

The container's sitecustomize registers the axon TPU PJRT plugin (importing
jax) before any conftest runs, so env vars alone are too late; instead we
switch the platform in-process via ``jax.config`` before any backend is
initialized (backend init is lazy, so this works as long as this conftest is
imported before the first jax computation).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# No persistent compile cache in tests: XLA:CPU AOT entries are
# machine-feature-pinned (safe_control_tpu/__init__.py skips CPU anyway;
# this also covers the in-process platform switch below).
os.environ.setdefault("SAFE_CONTROL_JAX_CACHE_DIR", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
