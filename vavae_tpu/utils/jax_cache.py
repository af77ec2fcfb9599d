"""Persistent XLA compilation cache + platform selection.

Compiles are expensive (tens of seconds even for small programs in some
environments); caching them to disk makes reruns of tests/benches near-free.
Import this module (or call setup()) before the first jit execution.

Platform override: some TPU plugin environments pin ``JAX_PLATFORMS`` in
the process environment (and re-pin it from sitecustomize), so exporting
``JAX_PLATFORMS=cpu`` is silently ignored and "CPU" runs execute on the
device. ``VAVAE_PLATFORM=cpu`` applies the override through
``jax.config.update``, which wins regardless.
"""
from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def setup(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("VAVAE_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    platform = os.environ.get("VAVAE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)


setup()
