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


def _cpuid_fingerprint() -> str:
    """LIVE CPU identity via the ``cpuid`` instruction (x86-64).

    /proc/cpuinfo and sysfs are populated at BOOT; a live migration
    changes what ``cpuid`` reports — and therefore the feature set
    LLVM detects at executable-load time — without touching either.
    Reading cpuid directly asks the same oracle LLVM's
    getHostCPUFeatures asks, so the cache key tracks exactly the
    identity the AOT loader checks entries against. (Note: XLA's
    compile side can additionally embed tuning-only preferences like
    ``+prefer-no-scatter`` that the load-side cpuid check never
    reports — those produce benign "machine type doesn't match"
    warnings on fresh-process reloads even within ONE live identity,
    measured 2026-08-19; no cache key can remove that class. The key
    protects against real ISA-set changes, where a mismatched load
    can SIGILL/SIGSEGV.)

    Returns "" (and degrades to the boot-time fingerprint alone) on
    non-x86 hosts or if executable memory cannot be mapped.
    """
    import ctypes
    import mmap
    import platform

    if platform.machine() not in ("x86_64", "AMD64"):
        return ""
    # int cpuid(uint32 leaf /*edi*/, uint32 sub /*esi*/, uint32* out /*rdx*/)
    code = bytes([
        0x53,                     # push rbx   (callee-saved, cpuid clobbers)
        0x49, 0x89, 0xD0,         # mov  r8, rdx
        0x89, 0xF8,               # mov  eax, edi
        0x89, 0xF1,               # mov  ecx, esi
        0x0F, 0xA2,               # cpuid
        0x41, 0x89, 0x00,         # mov  [r8], eax
        0x41, 0x89, 0x58, 0x04,   # mov  [r8+4], ebx
        0x41, 0x89, 0x48, 0x08,   # mov  [r8+8], ecx
        0x41, 0x89, 0x50, 0x0C,   # mov  [r8+12], edx
        0x5B,                     # pop  rbx
        0xC3,                     # ret
    ])
    try:
        buf = mmap.mmap(-1, mmap.PAGESIZE,
                        prot=mmap.PROT_READ | mmap.PROT_WRITE
                        | mmap.PROT_EXEC)
    except (ValueError, OSError, PermissionError):
        return ""
    try:
        buf.write(code)
        regs = (ctypes.c_uint32 * 4)()
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32 * 4))(
            ctypes.addressof(ctypes.c_char.from_buffer(buf)))
        rows = []
        for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1), (7, 2),
                          (0xD, 0), (0xD, 1),
                          (0x80000000, 0), (0x80000001, 0),
                          (0x80000008, 0)):
            fn(leaf, sub, ctypes.byref(regs))
            vals = list(regs)
            if leaf == 1:
                vals[1] = 0  # ebx: APIC id / logical count — per-boot noise
            rows.append((leaf, sub, *vals))
        del fn, regs  # release the exported buffer before closing the map
        return ";".join("%x.%x:%08x%08x%08x%08x" % r for r in rows)
    except Exception:
        return ""
    finally:
        try:
            buf.close()
        except BufferError:
            pass  # a lingering export keeps the page alive; harmless


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
    parts.append(_cpuid_fingerprint())
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
