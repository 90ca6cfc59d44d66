import os

# Parity tests run in float64 on a virtual 8-device CPU mesh; TPU runs use
# bench.py / __graft_entry__.py directly.  NOTE: the environment preloads
# jax via sitecustomize with JAX_PLATFORMS=axon (remote TPU), so we must
# override the already-set env var and the live config, before any backend
# is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
