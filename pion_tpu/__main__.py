"""``python -m pion_tpu {icgen,run} ...`` — the reference's binaries
(reference: bin_serial/Makefile:389-400 pion-ugs/icgen-ugs targets).

Environment:
  PION_TPU_PLATFORM=cpu|tpu|...  force the JAX backend (some site setups
      consume JAX_PLATFORMS before user code runs, so the override must go
      through jax.config).
  PION_TPU_CACHE=<dir>  persistent XLA compile-cache directory (default
      /tmp/pion_tpu_xla_cache; NG step programs take minutes to compile
      cold, seconds warm).
"""
import os

import jax

plat = os.environ.get("PION_TPU_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PION_TPU_CACHE", "/tmp/pion_tpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .cli import main  # noqa: E402

if __name__ == "__main__":
    import sys

    sys.exit(main())
