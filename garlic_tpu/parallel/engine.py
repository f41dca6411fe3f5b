"""Multi-chip SPMD ROH engine: shard_map kernels + collectives.

This is the scale-out path the reference never had (its parallelism stops at
pthreads over locus ranges within one process, src/garlic-roh.cpp:184-194).
Here the full Phase I-II-IV compute step is one jitted SPMD program over a
("dp", "sp") mesh (see parallel/mesh.py):

* genotypes [I, L] sharded (dp, sp); per-SNP tables replicated along dp;
* allele frequencies:     psum of per-shard numerators/denominators over dp;
* LOD window scan:        per-locus terms elementwise, then a (winsize-1)
                          locus halo pulled from the right sp neighbor via
                          ppermute, then VALID window sums (exact
                          shifted-add doubling);
* KDE:                    per-shard partial Gauss transform at a fixed
                          512-target grid, psum over (dp, sp);
* GMM sufficient stats:   psum of (Σr, Σr·x, Σr·x²) per component.

Everything is static-shaped and trace-once; the only cross-device traffic is
the W-1 halo (ICI neighbor exchange) and the O(512)/O(K) reductions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..core.types import MISSING
from .mesh import AXIS_DP, AXIS_SP

KDE_GRID_POINTS = 512  # reference KDE target count (src/garlic-kde.cpp:33)


# ---------------------------------------------------------------------------
# Block-local pieces (run inside shard_map; jnp only)
# ---------------------------------------------------------------------------

def _freq_block(geno_blk):
    """Per-locus '1'-allele numerator/denominator on the local block.

    Mirrors the on-the-fly freq accumulation of loadTPEDData
    (src/garlic-data.cpp:109-160): each diploid genotype g in {0,1,2}
    contributes g copies of the '1' allele over 2 chromosomes; missing (-9)
    contributes nothing."""
    import jax.numpy as jnp
    valid = geno_blk >= 0
    num = jnp.sum(jnp.where(valid, geno_blk, 0).astype(jnp.float32), axis=0)
    den = 2.0 * jnp.sum(valid.astype(jnp.float32), axis=0)
    return num, den


def _lod_terms_block(geno_blk, freq_blk, error: float):
    """Elementwise lod(g, p, e) (src/garlic-roh.cpp:355-386) in f32.

    Branch-free: three per-locus table rows + VPU selects, no gathers."""
    import jax.numpy as jnp
    p = freq_blk
    e = jnp.float32(error)
    one_minus = 1.0 - p
    non0 = one_minus * one_minus
    aut0 = (1.0 - e) * one_minus + e * non0
    non1 = 2.0 * p * one_minus
    aut1 = e * non1
    non2 = p * p
    aut2 = (1.0 - e) * p + e * non2
    r0 = jnp.log10(aut0 / non0)
    r1 = jnp.log10(aut1 / non1)
    r2 = jnp.log10(aut2 / non2)
    g = geno_blk.astype(jnp.int32)
    a = jnp.where(g == 0, r0[None, :],
                  jnp.where(g == 1, r1[None, :],
                            jnp.where(g == 2, r2[None, :], 0.0)))
    mono = (p <= 0.0) | (p >= 1.0)
    return jnp.where(mono[None, :], 0.0, a).astype(jnp.float32)


def _window_sums(a, winsize: int):
    """VALID sliding-window sums along the last axis ([I, N] -> [I, N-W+1])
    via exact shifted-add doubling (true f32 VPU adds — the conv lowering
    accumulates through the MXU in bf16 on TPU, losing ~3 digits near the
    cutoff)."""
    from ..ops.lod import window_sums_exact
    return window_sums_exact(a, winsize)


def check_halo_fits(L_padded: int, width: int, n_sp: int) -> None:
    """The ppermute halo pulls `width` columns from ONE right neighbor, so
    each sp shard must hold at least that many loci — otherwise x_blk[:, :w]
    silently clamps and the windows straddling two shards go wrong (or the
    trace dies with an opaque shape error).  Raise a clear error instead."""
    per_shard = L_padded // n_sp
    if width > per_shard:
        raise ValueError(
            f"ERROR: winsize-1 = {width} exceeds the per-shard locus width "
            f"{per_shard} ({L_padded} loci over sp={n_sp}); reduce the sp "
            "axis of --tpu-mesh or the window size.")


def _halo_right(x_blk, width: int, axis_name: str):
    """Pull the leading `width` columns of the right (sp_id+1) neighbor.

    Ring permutation: the last shard receives shard 0's columns — those
    wrapped windows are invalid by construction and must be masked by the
    caller (the global window-missing mask is True past nwin = L - W + 1)."""
    from jax import lax
    n = lax.axis_size(axis_name)
    if n == 1:
        import jax.numpy as jnp
        return jnp.zeros_like(x_blk[:, :width])
    head = x_blk[:, :width]
    # send my head to my LEFT neighbor == receive right neighbor's head
    perm = [(i, (i - 1) % n) for i in range(n)]
    return lax.ppermute(head, axis_name, perm)


# ---------------------------------------------------------------------------
# SPMD step factory
# ---------------------------------------------------------------------------

def make_analysis_step(mesh, winsize: int, error: float,
                       kde_thin_step: Optional[int] = None,
                       n_gmm: int = 3):
    """Build the jitted full SPMD analysis step over `mesh`.

    Returns step(geno, win_missing, ind_weight, grid, bandwidth,
                 gmm_w, gmm_mu, gmm_var) ->
      (freq, win, kde_density, gmm_w', gmm_mu', gmm_var', loglik)

    * geno        int8 [I, L]   sharded  P(dp, sp)
    * win_missing bool [L]      sharded  P(sp)    (True => window MISSING;
                                 already True for l >= L - W + 1 and for
                                 gap/centromere-broken windows)
    * ind_weight  f32  [I]      sharded  P(dp): 1 for real individuals, 0 for
                                 mesh-padding rows (keeps padding out of the
                                 KDE sample pool and GMM statistics)
    * grid        f32 [512]     replicated KDE evaluation grid
    * bandwidth   f32 scalar    replicated (nrd0, computed host-side once)
    * gmm_params  (w[K], mu[K], var[K]) f32 replicated

    This is the "training step" of the framework: Phase I scoring fused with
    the Phase II density accumulation and one Phase IV EM update, all
    communication via psum/ppermute on the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    thin = kde_thin_step if kde_thin_step is not None else winsize
    n_sp = mesh.shape[AXIS_SP]

    def block_fn(geno_blk, miss_blk, iw_blk, grid, h, gw, gmu, gvar):
        I_s, L_s = geno_blk.shape
        sp_id = lax.axis_index(AXIS_SP)

        # ---- allele frequencies: psum over individuals (dp) ----
        num, den = _freq_block(geno_blk)
        num = lax.psum(num, AXIS_DP)
        den = lax.psum(den, AXIS_DP)
        freq_blk = jnp.where(den > 0, num / den, 0.0).astype(jnp.float32)

        # ---- Phase I: LOD window scan with halo ----
        a = _lod_terms_block(geno_blk, freq_blk, error)
        halo = _halo_right(a, winsize - 1, AXIS_SP)
        a_ext = jnp.concatenate([a, halo], axis=1)       # [I_s, L_s + W - 1]
        s = _window_sums(a_ext, winsize)            # [I_s, L_s]
        win_blk = jnp.where(miss_blk[None, :], jnp.float32(MISSING), s)

        # ---- Phase II: thinned pooled density at the fixed grid ----
        gidx = sp_id * L_s + lax.broadcasted_iota(jnp.int32, (1, L_s), 1)[0]
        use = (~miss_blk) & (gidx % thin == 0)
        w = jnp.where(use[None, :], 1.0, 0.0) * iw_blk[:, None]
        x = jnp.where(use[None, :], s, 0.0)
        # Gauss transform: sum_i w_i exp(-(x_i - t)^2 / (2 h^2)) at each t
        d = x.reshape(-1, 1) - grid.reshape(1, -1)
        k = jnp.exp(d * d * (-0.5 / (h * h))) * w.reshape(-1, 1)
        dens = jnp.sum(k, axis=0)
        dens = lax.psum(lax.psum(dens, AXIS_DP), AXIS_SP)
        nsamp = lax.psum(lax.psum(jnp.sum(w), AXIS_DP), AXIS_SP)
        dens = dens / (nsamp * h * jnp.sqrt(2.0 * jnp.pi))

        # ---- Phase IV: one GMM-EM update over the pooled scores ----
        # (stand-in x = window scores here; the pipeline feeds ROH lengths.)
        xs = x.reshape(-1, 1)
        ws = w.reshape(-1, 1)
        var = jnp.maximum(gvar, 1e-12)
        logp = (-0.5 * (xs - gmu[None, :]) ** 2 / var[None, :]
                - 0.5 * jnp.log(2.0 * jnp.pi * var[None, :])
                + jnp.log(jnp.maximum(gw[None, :], 1e-30)))
        m = jnp.max(logp, axis=1, keepdims=True)
        r = jnp.exp(logp - m)
        rs = jnp.sum(r, axis=1, keepdims=True)
        resp = (r / rs) * ws
        loglik_loc = jnp.sum((m[:, 0] + jnp.log(rs[:, 0])) * ws[:, 0])
        # sufficient statistics -> psum over the whole mesh
        s0 = jnp.sum(resp, axis=0)
        s1 = jnp.sum(resp * xs, axis=0)
        s2 = jnp.sum(resp * xs * xs, axis=0)
        s0 = lax.psum(lax.psum(s0, AXIS_DP), AXIS_SP)
        s1 = lax.psum(lax.psum(s1, AXIS_DP), AXIS_SP)
        s2 = lax.psum(lax.psum(s2, AXIS_DP), AXIS_SP)
        loglik = lax.psum(lax.psum(loglik_loc, AXIS_DP), AXIS_SP)
        ntot = jnp.maximum(nsamp, 1.0)
        new_w = s0 / ntot
        new_mu = s1 / jnp.maximum(s0, 1e-30)
        new_var = s2 / jnp.maximum(s0, 1e-30) - new_mu * new_mu

        return freq_blk, win_blk, dens, new_w, new_mu, new_var, loglik

    shard_fn = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P(AXIS_DP, AXIS_SP), P(AXIS_SP), P(AXIS_DP),
                  P(), P(), P(), P(), P()),
        out_specs=(P(AXIS_SP), P(AXIS_DP, AXIS_SP), P(), P(), P(), P(), P()),
    )

    @jax.jit
    def step(geno, win_missing, ind_weight, grid, bandwidth,
             gmm_w, gmm_mu, gmm_var):
        return shard_fn(geno, win_missing, ind_weight, grid, bandwidth,
                        gmm_w, gmm_mu, gmm_var)

    def place(geno, win_missing, ind_weight):
        """Shard host arrays onto the mesh (helper for callers)."""
        check_halo_fits(geno.shape[1], winsize - 1, mesh.shape[AXIS_SP])
        gs = NamedSharding(mesh, P(AXIS_DP, AXIS_SP))
        ms = NamedSharding(mesh, P(AXIS_SP))
        ws = NamedSharding(mesh, P(AXIS_DP))
        return (jax.device_put(geno, gs), jax.device_put(win_missing, ms),
                jax.device_put(ind_weight, ws))

    step.place = place
    return step


_sharded_cache = {}


def lod_windows_sharded(chrom, centro, winsize: int, error: float,
                        max_gap: int, mesh):
    """Phase-I window scan sharded over a ("dp", "sp") mesh -> DeviceWin.

    Individuals shard over dp, loci over sp with a (winsize-1) ppermute
    halo; the per-SNP frequency row is replicated along dp and sharded
    along sp.  The result stays device-resident (and sharded) so the
    downstream covered/thinned kernels compile as SPMD programs over the
    same mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.device_win import DeviceWin

    I, L = chrom.genotypes.shape
    cstart = centro.start(chrom.chrom)
    cend = centro.end(chrom.chrom)
    miss = full_window_missing(chrom.positions, winsize, max_gap,
                               cstart, cend)
    geno_p, miss_p, _ = pad_for_mesh(chrom.genotypes, miss, mesh)
    L2 = geno_p.shape[1]
    check_halo_fits(L2, winsize - 1, mesh.shape[AXIS_SP])
    freq_p = np.zeros(L2, dtype=np.float32)
    freq_p[:L] = np.asarray(chrom.freq, dtype=np.float32)

    fn = make_sharded_lod_fn(mesh, winsize, error)
    gs = NamedSharding(mesh, P(AXIS_DP, AXIS_SP))
    ls = NamedSharding(mesh, P(AXIS_SP))
    win = fn(jax.device_put(geno_p, gs), jax.device_put(freq_p, ls),
             jax.device_put(miss_p, ls))
    return DeviceWin(win=win, nind=I, nloci=L)


def make_sharded_lod_fn(mesh, winsize: int, error: float):
    """Jitted SPMD window-scan step over `mesh` (cached per config):
    (geno P(dp,sp), freq P(sp), win_missing P(sp)) -> win P(dp,sp)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = (id(mesh), winsize, float(error))
    fn = _sharded_cache.get(key)
    if fn is None:
        def block_fn(geno_blk, freq_blk, miss_blk):
            a = _lod_terms_block(geno_blk, freq_blk, error)
            halo = _halo_right(a, winsize - 1, AXIS_SP)
            a_ext = jnp.concatenate([a, halo], axis=1)
            s = _window_sums(a_ext, winsize)
            return jnp.where(miss_blk[None, :], jnp.float32(MISSING), s)

        shard_fn = jax.shard_map(
            block_fn, mesh=mesh,
            in_specs=(P(AXIS_DP, AXIS_SP), P(AXIS_SP), P(AXIS_SP)),
            out_specs=P(AXIS_DP, AXIS_SP))
        fn = jax.jit(shard_fn)
        _sharded_cache[key] = fn
    return fn


# ---------------------------------------------------------------------------
# Host-side driver helpers
# ---------------------------------------------------------------------------

def pad_for_mesh(geno: np.ndarray, win_missing: np.ndarray,
                 mesh) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad [I, L] genotypes and the [L] window-missing mask so both axes
    divide the mesh; returns (geno, win_missing, ind_weight).

    Padding individuals are all-missing (-9, excluded from freq) with
    ind_weight 0 (excluded from KDE/GMM); padded loci get missing=True
    windows."""
    n_dp = mesh.shape[AXIS_DP]
    n_sp = mesh.shape[AXIS_SP]
    I, L = geno.shape
    I2 = -(-I // n_dp) * n_dp
    L2 = -(-L // n_sp) * n_sp
    iw = np.zeros(I2, dtype=np.float32)
    iw[:I] = 1.0
    if I2 != I or L2 != L:
        g = np.full((I2, L2), -9, dtype=np.int8)
        g[:I, :L] = geno
        m = np.ones(L2, dtype=bool)
        m[:L] = win_missing
        return g, m, iw
    return geno, win_missing, iw


def full_window_missing(positions: np.ndarray, winsize: int, max_gap: int,
                        cstart: int, cend: int) -> np.ndarray:
    """[L] bool mask: window-missing per start locus, True past nwin."""
    from ..ops.lod import window_missing_mask
    L = positions.shape[0]
    nwin = max(L - winsize + 1, 0)
    m = np.ones(L, dtype=bool)
    m[:nwin] = window_missing_mask(positions, winsize, max_gap, cstart, cend)
    return m
