"""Server entry points (the reference's three __main__ processes) plus the
self-served ops dashboards they expose at ``GET /``."""

from __future__ import annotations

import os

_DASHBOARDS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "dashboards")


def dashboard_page(name: str) -> bytes:
    """Load a single-file dashboard (inline CSS/JS, same-origin polling)."""
    with open(os.path.join(_DASHBOARDS, name), "rb") as f:
        return f.read()
