"""Machine-keyed persistent compilation cache setup.

Why this exists (VERDICT r4 Weak #2): the harness runs successive rounds on
DIFFERENT host machines that share the same disk. XLA:CPU's AOT cache entries
bake in the *compile* machine's CPU features; loading them on a host with a
different feature set fails (``cpu_aot_loader.cc:210`` "Machine type used for
XLA:CPU compilation doesn't match") — every lookup then spams hundreds of
error lines and falls back to a full recompile, which is exactly the slow
path the cache was meant to avoid.

Fix: key the CPU cache directory by a fingerprint of the host CPU features,
so a cache written on machine A is simply *not offered* to machine B. TPU
entries are compiled by the remote relay for the TPU target — host CPU
features are irrelevant — so the TPU cache stays in the shared base directory
and survives machine swaps (relay compiles are ~21 min cold; keeping them is
the whole point).

Use ``setup_compile_cache(platform=...)`` from every entry point that compiles
(bench scripts, __graft_entry__, conftest) BEFORE the first jit executes.
"""
from __future__ import annotations

import hashlib
import os
import platform as _platform

DEFAULT_BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set.

    Reads the x86 ``flags`` line from /proc/cpuinfo (the same feature list
    XLA:CPU validates at AOT load time) plus the machine arch. Sorted so
    core enumeration order doesn't matter.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def cache_dir_for(platform_name: str, base: str | None = None) -> str:
    """Resolve the cache directory for a backend platform.

    cpu → ``<base>/cpu-<machine-fingerprint>`` (AOT results are host-CPU
    specific); anything else (tpu, the axon tunnel) → ``<base>`` shared.
    """
    base = base or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_BASE)
    if platform_name == "cpu":
        return os.path.join(base, f"cpu-{machine_fingerprint()}")
    return base


def setup_compile_cache(platform_name: str | None = None, base: str | None = None) -> str:
    """Point jax's persistent compilation cache at the right directory.

    ``platform_name``: 'cpu' | 'tpu' | None (None → ask jax.default_backend(),
    which initializes the backend — only do that if the platform is already
    pinned). Returns the directory used.
    """
    import jax

    if platform_name is None:
        platform_name = jax.default_backend()
    d = cache_dir_for(platform_name, base)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    return d
