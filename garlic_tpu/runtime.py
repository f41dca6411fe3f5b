"""Device runtime helpers for the fast (TPU) engine."""

from __future__ import annotations

import sys
import time
import threading

_warmup_thread = None
link_d2h_mbps = None  # measured by the warmup probe; None = unknown
link_h2d_mbps = None  # upstream probe; genotype ship format picks by it


class PhaseProfiler:
    """Per-phase wall-clock + throughput counters (--tpu-profile).

    The reference has no tracing at all (SURVEY.md §5); this is the
    observability layer the BASELINE windows/s metric needs.  mark()
    closes the current phase; report() prints a summary to stderr.  When
    GARLIC_TPU_TRACE_DIR is set, a JAX profiler trace covers the run."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.phases = []
        self._t0 = time.perf_counter()
        self._trace = None
        if enabled:
            import os
            tdir = os.environ.get("GARLIC_TPU_TRACE_DIR")
            if tdir:
                try:
                    import jax
                    self._trace = jax.profiler.trace(tdir)
                    self._trace.__enter__()
                except Exception:
                    self._trace = None

    def mark(self, name: str, items: float = 0.0, unit: str = ""):
        if not self.enabled:
            return
        now = time.perf_counter()
        self.phases.append((name, now - self._t0, items, unit))
        self._t0 = now

    def report(self):
        if not self.enabled:
            return
        if self._trace is not None:
            try:
                self._trace.__exit__(None, None, None)
            except Exception:
                pass
        total = sum(p[1] for p in self.phases)
        print("[profile] phase breakdown:", file=sys.stderr)
        for name, dt, items, unit in self.phases:
            rate = f"  ({items / dt:,.0f} {unit}/s)" if items and dt > 0 \
                else ""
            print(f"[profile]   {name:<18} {dt:8.3f}s{rate}",
                  file=sys.stderr)
        print(f"[profile]   {'TOTAL':<18} {total:8.3f}s", file=sys.stderr)


DEFAULT_HBM_BUDGET = 8 * 1024 ** 3  # bytes


def hbm_budget() -> float:
    """Usable HBM bytes for device-resident window/score planes.

    `GARLIC_TPU_HBM_BUDGET` (raw BYTES; floats like `2e9` accepted)
    overrides; else 90% of the device's reported bytes_limit; else 8 GiB
    (CPU test runs, where memory_stats is unavailable).  Shared by the
    pipeline's per-chromosome streaming gate and the weighted Phase-I
    fused-vs-chunked router so one env knob means one budget everywhere."""
    import os
    v = os.environ.get("GARLIC_TPU_HBM_BUDGET")
    if v:
        return float(v)
    try:
        import jax
        ms = jax.local_devices()[0].memory_stats()
        if ms and ms.get("bytes_limit"):
            return 0.9 * float(ms["bytes_limit"])
    except Exception:
        pass
    return float(DEFAULT_HBM_BUDGET)


def enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    First compilation of the Pallas kernels costs 20-40 s; with the cache,
    every later process loads them in ~100 ms.  Honors an existing
    JAX_COMPILATION_CACHE_DIR; GARLIC_TPU_NO_COMPILE_CACHE disables."""
    import os

    if os.environ.get("GARLIC_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            cache = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "garlic_tpu", "xla")
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def start_link_warmup() -> threading.Thread:
    """Fire-and-forget first device round-trip.

    On tunneled TPU attachments the first device->host transfer of a process
    pays a large one-time link initialization; starting it in the background
    overlaps that cost with host-side TPED parsing.  Idempotent."""
    global _warmup_thread
    if _warmup_thread is not None:
        return _warmup_thread
    enable_compile_cache()

    def _w():
        try:
            import time as _time

            import jax
            import numpy as np
            np.asarray(jax.device_put(np.zeros(8, np.float32)))
            # probe steady-state D2H bandwidth (2 MB): downstream transfer
            # strategies (bitmap vs run-edge coverage) pick by it
            global link_d2h_mbps, link_h2d_mbps
            buf = jax.device_put(np.zeros(1 << 19, np.float32))
            jax.block_until_ready(buf)
            t0 = _time.perf_counter()
            np.asarray(buf)
            dt = _time.perf_counter() - t0
            if dt > 0:
                link_d2h_mbps = 2.0 / dt
            # upstream (H2D) probe: the base-3 vs raw-2-bit genotype ship
            # trade-off (ops/pallas_lod._ship_mode) needs the uplink rate
            src = np.zeros(1 << 21, np.uint8)
            t0 = _time.perf_counter()
            jax.block_until_ready(jax.device_put(src))
            dt = _time.perf_counter() - t0
            if dt > 0:
                link_h2d_mbps = 2.0 / dt
        except Exception:
            pass

    _warmup_thread = threading.Thread(target=_w, daemon=True,
                                      name="garlic-tpu-link-warmup")
    _warmup_thread.start()
    return _warmup_thread
