"""Test config: run everything on a virtual 8-device CPU mesh.

The environment may already select a real accelerator (JAX_PLATFORMS=axon and
an axon sitecustomize that force-registers the plugin at interpreter startup),
so a setdefault is not enough: force the env vars AND re-point jax.config if
jax was already imported.  Backends must not have been initialized yet when
this runs (pytest imports conftest before any test imports call
jax.devices()).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
