"""Host-fingerprinted JAX persistent-compilation-cache directories.

Why this exists: XLA:CPU caches AOT-compiled executables whose code is
tuned to the *detected* host CPU — including microcode-dependent LLVM
tuning like `prefer-no-gather` / `prefer-no-scatter` (the
gather-data-sampling mitigation). This box is a VM whose apparent CPU
identity can change mid-boot (live migration / microcode updates):
entries written under one identity then deserialize on another with
"machine features don't match ... could lead to execution errors such
as SIGILL" warnings — and, for large programs, an actual
Segmentation fault inside `compilation_cache.get_executable_and_time`
(the round-4 full-suite crash at tests/test_trainer.py's dp8 resume
compile). Keying the cache directory by the current host identity
makes a migrated host start a fresh cache instead of loading binaries
built for a different machine, while a stable host keeps its warm
cache.
"""
from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags = the ISA feature set; microcode / model name =
                # the tuning-relevant identity (LLVM keys the
                # gather/scatter preference on these)
                if line.startswith(("flags", "microcode", "model name")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    for vuln in ("gather_data_sampling", "downfall"):
        try:
            with open(f"/sys/devices/system/cpu/vulnerabilities/{vuln}") as f:
                parts.append(f"{vuln}:{f.read().strip()}")
        except OSError:
            pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]


def cache_dir(base: str) -> str:
    """``/tmp/jax_test_cache`` -> ``/tmp/jax_test_cache_<host-fp>``."""
    return f"{base}_{_host_fingerprint()}"


def setup(jax, base: str, min_compile_secs: float = 0.3):
    """Point jax's persistent compilation cache at the fingerprinted
    directory for ``base`` (creating it) and set the usual knobs."""
    path = cache_dir(base)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
