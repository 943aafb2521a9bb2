"""Worker-environment plumbing.

Ray tasks deserialize our closures by importing ``ulp_ray`` by name; in
local mode workers inherit the *driver's cwd* but not its ``sys.path``
edits, so a driver that imported this package from a non-cwd location
(e.g. ``sys.path.insert(0, "/root/repo")`` from elsewhere) would strand
workers with ``ModuleNotFoundError``. ``remote_env()`` pins the package
root onto every stage's worker env via ``runtime_env.env_vars.PYTHONPATH``
— identical across stages, so all stages share one worker pool.
"""

from __future__ import annotations

import os

__all__ = ["remote_env", "package_root"]


def package_root() -> str:
    """Directory containing the ``ulp_ray`` package (the repo root)."""
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_env() -> dict:
    """kwargs to splat into ``map_batches``/``ray.remote`` so workers can
    import ``ulp_ray`` regardless of the driver's cwd.

    Returns ``{}`` when workers will already resolve the package — driver
    cwd == package root (workers inherit cwd) or PYTHONPATH already carries
    it — because a per-stage ``runtime_env`` forces Ray to start dedicated
    worker processes per stage instead of reusing the default pool, a
    measurable fixed cost per execution."""
    root = package_root()
    existing = os.environ.get("PYTHONPATH", "")
    if os.path.abspath(os.getcwd()) == root or root in existing.split(":"):
        return {}
    pp = f"{root}:{existing}" if existing else root
    return {"runtime_env": {"env_vars": {"PYTHONPATH": pp}}}
