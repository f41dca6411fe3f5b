"""Device runtime helpers for the fast (TPU) engine."""

from __future__ import annotations

import threading

_warmup_thread = None


def start_link_warmup() -> threading.Thread:
    """Fire-and-forget first device round-trip.

    On tunneled TPU attachments the first device->host transfer of a process
    pays a large one-time link initialization; starting it in the background
    overlaps that cost with host-side TPED parsing.  Idempotent."""
    global _warmup_thread
    if _warmup_thread is not None:
        return _warmup_thread

    def _w():
        try:
            import jax
            import numpy as np
            np.asarray(jax.device_put(np.zeros(8, np.float32)))
        except Exception:
            pass

    _warmup_thread = threading.Thread(target=_w, daemon=True,
                                      name="garlic-tpu-link-warmup")
    _warmup_thread.start()
    return _warmup_thread
