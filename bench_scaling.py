#!/usr/bin/env python
"""Scaling-efficiency harness: SPMD Phase-I throughput across mesh sizes.

Runs the sharded window scan (the --tpu-mesh path) on 1/2/4/8 devices and
reports windows/s and weak-scaling efficiency.  On this dev attachment
only one real TPU chip exists, so the default backend is the virtual CPU
mesh (demonstrating the harness + collectives); on a pod slice the same
script measures real ICI scaling — pass --tpu to use the TPU backend.

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    use_tpu = "--tpu" in sys.argv
    import jax
    if not use_tpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    from garlic_tpu.centromeres import Centromere
    from garlic_tpu.core.types import ChromData
    from garlic_tpu.logger import RunLog
    from garlic_tpu.parallel import factor_devices, make_mesh

    if not use_tpu:
        print("# virtual CPU mesh: N devices share the same physical cores,"
              " so efficiency is NOT expected to scale here; on a pod slice"
              " the same harness measures real ICI scaling", file=sys.stderr)

    ndev = len(jax.devices())
    I, L, W = 64, 200_000, 60
    rng = np.random.default_rng(0)
    chrom = ChromData(
        chrom="chr1",
        positions=np.cumsum(rng.integers(500, 3000, L)).astype(np.int64),
        gpos=np.zeros(L), locus_names=[f"r{i}" for i in range(L)],
        alleles=np.array(["A"] * L),
        genotypes=rng.integers(0, 3, (I, L)).astype(np.int8),
        freq=np.clip(rng.beta(1, 1, L), 0.02, 0.98))
    centro = Centromere("hg18", "none", "none", RunLog())

    from jax.sharding import NamedSharding, PartitionSpec as P
    from garlic_tpu.parallel import AXIS_DP, AXIS_SP, pad_for_mesh
    from garlic_tpu.parallel.engine import (full_window_missing,
                                            make_sharded_lod_fn)

    base = None
    n = 1
    while n <= ndev:
        n_dp, n_sp = factor_devices(n)
        mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
        miss = full_window_missing(chrom.positions, W, 200000,
                                   10**12, 10**12 + 1)
        geno_p, miss_p, _ = pad_for_mesh(chrom.genotypes, miss, mesh)
        freq_p = np.zeros(geno_p.shape[1], np.float32)
        freq_p[:L] = chrom.freq
        gs = NamedSharding(mesh, P(AXIS_DP, AXIS_SP))
        ls = NamedSharding(mesh, P(AXIS_SP))
        g_d = jax.device_put(geno_p, gs)
        f_d = jax.device_put(freq_p, ls)
        m_d = jax.device_put(miss_p, ls)
        fn = make_sharded_lod_fn(mesh, W, 0.001)
        jax.block_until_ready(fn(g_d, f_d, m_d))  # compile
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(g_d, f_d, m_d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        wps = I * (L - W + 1) / dt
        if base is None:
            base = wps
        print(json.dumps({
            "devices": n, "mesh": f"{n_dp}x{n_sp}",
            "windows_per_sec": round(wps),
            "speedup": round(wps / base, 2),
            "efficiency": round(wps / base / n, 2),
        }), flush=True)
        n *= 2


if __name__ == "__main__":
    main()
