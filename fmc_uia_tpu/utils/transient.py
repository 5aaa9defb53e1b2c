"""Transient-failure classification for the remote-compile/device tunnel.

The axon host<->TPU tunnel fails sporadically under load (the round-1
official bench died on one "read body: response body closed"); compile and
step calls retry on these. The classifier matches NARROW transport-specific
phrases (ADVICE r4: broad substrings like "Connection"/"EOF"/"http://"
made genuine compile errors whose text merely contained a URL or the word
'connection' retry 3x with sleeps before surfacing). OOMs are never
transient.
"""

from __future__ import annotations

TRANSIENT_MARKERS = (
    "remote_compile",
    "read body",
    "response body closed",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Connection closed",
    "Connection refused",
    "Socket closed",
    "EOF occurred",
    "ABORTED",
)

_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "OOM")


def is_transient(exc: Exception) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    if any(m in msg for m in _OOM_MARKERS):
        return False
    return any(m in msg for m in TRANSIENT_MARKERS)
