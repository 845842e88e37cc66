"""Persistent XLA compile-cache setup, scoped per backend + host CPU.

One shared helper for every entry point (bench, perf scripts, the
driver entry, the training CLI). The cache directory is keyed by the
JAX platform AND a fingerprint of the host CPU's feature flags: XLA:CPU
serializes AOT results for the *compile* machine's features, and this
repo's lifetime spans hosts with different CPUs (rounds run on fresh
VMs) — loading a stale AOT entry on a weaker host warns about every
entry and "could lead to execution errors such as SIGILL" (observed:
a dryrun that normally takes ~90 s warm spent >6 min failing cache
loads). Scoping by (platform, cpu-flags hash) makes a host change a
clean cache miss instead.
"""

import hashlib
import os


def _host_cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


def enable(repo_root: str | None = None) -> None:
    """Point JAX's persistent compile cache at a host-scoped subdir of
    <repo>/.jax_cache. Safe to call before or after backend init; a
    no-op on JAX versions without the config knobs."""
    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    platform = os.environ.get("JAX_PLATFORMS", "") or "default"
    sub = f"{platform.split(',')[0]}-{_host_cpu_tag()}"
    cache = os.path.join(repo_root, ".jax_cache", sub)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
