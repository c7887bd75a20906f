"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere, hence the env mutation at
module import time (pytest imports conftest first).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# NOTE: the hosted environment exports JAX_PLATFORMS=axon and the axon PJRT
# plugin ignores env-var overrides — jax.config.update is the only reliable
# way to pin tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def reference_on_path():
    """Make the torch reference importable as an oracle (models.* package)."""
    ref = "/root/reference"
    if os.path.isdir(ref) and ref not in sys.path:
        sys.path.insert(0, ref)
    return os.path.isdir(ref)
