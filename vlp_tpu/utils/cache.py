"""Host-scoped persistent compile-cache directories.

XLA:CPU AOT cache entries bake in the compile machine's ISA feature set;
loading an entry compiled on a host with different features can SIGILL
(the loader itself warns "This could lead to execution errors such as
SIGILL"). Sessions on this infrastructure migrate between hosts, so cache
directories are scoped by a fingerprint of the local CPU flags — foreign
entries are simply never visible.
"""
from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def host_scoped_cache_dir(root: str, scope: str) -> str:
    return os.path.join(root, f"{scope}-{host_fingerprint()}")
