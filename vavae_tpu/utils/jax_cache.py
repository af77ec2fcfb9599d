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

import hashlib
import os
import platform as _platform

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def host_fingerprint() -> str:
    """Short stable id for this host's CPU feature set.

    The persistent cache stores serialized *executables*; for the CPU
    backend that is AOT machine code compiled for this host's exact CPU
    features. The repo (and its cache dir) persists across machines, and a
    cache entry produced on one host may load on another as genuinely
    foreign machine code (SIGILL risk). Keying the cache dir by the CPU
    flag set gives each machine its own warm cache instead.

    Note: this does NOT silence the cpu_aot_loader "could lead to
    execution errors such as SIGILL" log spam — XLA adds tuning
    pseudo-features (+prefer-no-gather/scatter) to the compile-time
    feature string that never appear in host detection, so even
    same-host cache loads warn. That spam is harmless; this keying
    addresses the real cross-host case.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    return _platform.machine() or "unknown"


def setup(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("VAVAE_JAX_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    platform = os.environ.get("VAVAE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)


setup()
