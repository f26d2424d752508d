"""Persistent XLA/Mosaic compilation cache for the production CLIs.

The Farnebäck kernels are shape-specialized (one executable per video
resolution / batch); a corpus with a new resolution pays the full Mosaic
compile once per *process* without this, but once per *machine* with it.
Enabled by default in the CLI entry points — set OFT_COMPILE_CACHE=0 to
disable, or OFT_COMPILE_CACHE=<dir> to relocate (defaults to
$JAX_COMPILATION_CACHE_DIR, then ~/.cache/optical_flow_tpu/jax).

The reference has no equivalent (its compute is pre-compiled OpenCV C++);
this is the TPU-native analogue of shipping compiled kernels.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir, or None when disabled.  Safe to call more than
    once and before/after backend initialization.
    """
    env = os.environ.get("OFT_COMPILE_CACHE", "")
    if env == "0":
        return None
    cache_dir = (env or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "optical_flow_tpu", "jax"))
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile that takes noticeable time (default threshold
    # is 1s; the big Mosaic kernels take 10s+, tiny glue is free anyway)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _honor_jax_platforms_env()
    return cache_dir


def _honor_jax_platforms_env() -> None:
    """Restore standard JAX_PLATFORMS env semantics for the CLIs.

    The axon sitecustomize calls jax.config.update('jax_platforms',
    'axon,cpu') at interpreter startup, silently overriding JAX_PLATFORMS
    from the environment — so `JAX_PLATFORMS=cpu <cli>` would still dial
    the TPU transport first (and HANG when it is wedged, the round-3
    failure hour).  If the env var is set, it wins — matching what every
    JAX user expects — provided no backend has been initialized yet.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    import jax._src.xla_bridge as xb
    # Only replace the sitecustomize's exact artifact value: a different
    # current value means the embedding program ALREADY chose a platform
    # deliberately via jax.config.update (e.g. a CPU-forced subprocess),
    # and the inherited env var must not undo that.
    if (jax.config.jax_platforms == "axon,cpu" and want != "axon,cpu"
            and not xb.backends_are_initialized()):
        jax.config.update("jax_platforms", want)
