"""Small networking helpers shared by the CLIs, scripts and tests."""

from __future__ import annotations

import socket


def free_port(host: str = "") -> int:
    """Bind port 0, return the kernel-chosen free port.

    The choose-then-rebind TOCTOU window is inherent to the pattern; one
    shared helper keeps any future mitigation (SO_REUSEADDR, holding the
    socket open) in a single place (round-5 review finding).
    """
    with socket.socket() as s:
        s.bind((host, 0))
        return s.getsockname()[1]
