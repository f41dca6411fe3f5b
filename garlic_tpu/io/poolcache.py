"""Phase-II exact-sample pool cache (a `--tpu-panel-cache` sidecar).

The exact f64 thinned Phase-II sample pool is a pure function of the
FILTERED panel content and the sampling parameters — yet round 4 paid
1.4-5 s of host-side exact sampling (gt_lod_windows_exact_thin over
16.6 M values at the 1000x1M scale, VM-throttle-bound) on EVERY warm
auto-cutoff run.  This caches it next to the `.gtpc` sidecar,
content-digest validated exactly like the `.freq.gz` blob (digests, not
mtimes, which lie under copies; reference resume-artifact precedent:
`--freq-file`, src/garlic-main.cpp:245-259):

  <sidecar>.p2pool.npy    the pool, ORIGINAL pooling order, f64
                          (mmap-read by warm runs that feed the full
                          exact-sample transform)
  <sidecar>.p2pool.json   {key, n, h, mn, mx} — floats stored as C
                          hex literals, bit-exact

The stored grid scalars are exactly what ops.kde._kde_grid computes from
the pool (nrd0 bandwidth from the sorted copy; raw pool min/max), so a
warm run rebuilds the identical 512-point target grid without touching
the pool: WGS hybrid runs (y from the device-resident thinned windows)
never load the 100+ MB pool at all, and full-transform runs mmap it in
original order — every path stays byte-identical to a cold run.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..core.digest import content_digest


def pool_key(chroms, winsize: int, step: int, error: float, max_gap: int,
             use_gl: bool, centro, weighted: bool = False, mu: float = 0.0,
             M: int = 0, phased: bool = False,
             sub_idx=None) -> Optional[bytes]:
    """16-byte content key of everything the pool's values depend on, or
    None when a chromosome lacks the sidecar-derived genotype digest
    (nothing stable to key against — e.g. loads without the panel
    cache)."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    h.update(np.array([winsize, step, max_gap, M],
                      dtype=np.int64).tobytes())
    h.update(np.array([error, mu], dtype=np.float64).tobytes())
    h.update(bytes([use_gl, weighted, phased]))
    if sub_idx is not None:
        h.update(np.ascontiguousarray(sub_idx, dtype=np.int64).tobytes())
    for c in chroms:
        if c.geno2b_digest is None:
            return None
        h.update(c.chrom.encode())
        h.update(c.geno2b_digest)
        h.update(np.array([centro.start(c.chrom), centro.end(c.chrom)],
                          dtype=np.int64).tobytes())
        h.update(content_digest(np.ascontiguousarray(c.positions)))
        h.update(content_digest(np.ascontiguousarray(c.freq)))
        if weighted:
            h.update(content_digest(np.ascontiguousarray(c.gpos)))
        if use_gl:
            if c.gl_codes is not None:
                h.update(content_digest(c.gl_codes))
                h.update(content_digest(np.ascontiguousarray(c.gl_lut)))
            else:
                h.update(content_digest(np.ascontiguousarray(c.gl)))
    return h.digest()


class PoolEntry:
    """A validated cache hit: grid scalars now, the pool lazily."""

    __slots__ = ("path", "n", "h", "mn", "mx")

    def __init__(self, path: str, n: int, h: float, mn: float, mx: float):
        self.path, self.n = path, n
        self.h, self.mn, self.mx = h, mn, mx

    def grid(self):
        """(h, targets, spacing, n) — the exact _kde_grid arithmetic
        replayed from the stored scalars (same op order:
        mx += 3h; mn -= 3h; targets = (i/512)*(mx-mn)+mn)."""
        CUT, M = 3.0, 512
        mn = self.mn - CUT * self.h
        mx = self.mx + CUT * self.h
        i = np.arange(1, M + 1, dtype=np.float64)
        targets = (i / M) * (mx - mn) + mn
        return self.h, targets, targets[1] - targets[0], self.n

    def load(self) -> np.ndarray:
        """The pool in original pooling order (read-only mmap)."""
        return np.load(self.path, mmap_mode="r")


class PoolCache:
    """Pipeline-facing handle: closes over the run's chroms/params so
    lookups and stores only need (winsize, step)."""

    def __init__(self, sidecar: str, key_fn):
        self._sidecar = sidecar
        self._key_fn = key_fn   # (winsize, step) -> bytes | None

    def _paths(self):
        return self._sidecar + ".p2pool.npy", self._sidecar + ".p2pool.json"

    def lookup(self, winsize: int, step: int) -> Optional[PoolEntry]:
        npy, meta = self._paths()
        try:
            with open(meta) as f:
                m = json.load(f)
            key = self._key_fn(winsize, step)
            if key is None or m.get("key") != key.hex():
                return None
            if not os.path.exists(npy):
                return None
            return PoolEntry(npy, int(m["n"]),
                             float.fromhex(m["h"]),
                             float.fromhex(m["mn"]),
                             float.fromhex(m["mx"]))
        except (OSError, ValueError, KeyError):
            return None

    def store(self, winsize: int, step: int, samples: np.ndarray):
        """Compute the grid scalars (the one nrd0/sort this run needs
        anyway), then persist pool + scalars in the background (the
        ~100 MB .npy write must not sit on the Phase-II critical path).
        Returns (h, targets, spacing, n) for the caller to reuse, or
        None when the pool is unkeyable (no digest)."""
        from ..ops.kde import _kde_grid
        if samples.size == 0:
            return None  # caller falls through to the uncached path
        key = self._key_fn(winsize, step)
        h, targets, spacing = _kde_grid(samples)
        if key is None or samples.nbytes > (512 << 20):
            # unkeyable, or an unthinned (--no-kde-thinning) WGS pool —
            # a multi-GB sidecar is worse than recomputing
            return h, targets, spacing, int(samples.size)
        mn = float(np.min(samples))
        mx = float(np.max(samples))
        npy, meta = self._paths()

        def _write():
            try:
                tmp = npy + ".tmp"
                with open(tmp, "wb") as f:  # file handle: np.save would
                    np.save(f, np.ascontiguousarray(  # append .npy to a
                        samples, dtype=np.float64))   # bare tmp path
                os.replace(tmp, npy)
                with open(meta + ".tmp", "w") as f:
                    json.dump({"key": key.hex(), "n": int(samples.size),
                               "h": float(h).hex(), "mn": mn.hex(),
                               "mx": mx.hex()}, f)
                os.replace(meta + ".tmp", meta)
            except OSError:
                pass  # cache write failure is never a run failure

        import threading
        threading.Thread(target=_write, daemon=False).start()
        return h, targets, spacing, int(samples.size)
