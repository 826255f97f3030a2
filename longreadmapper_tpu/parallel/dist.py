"""Distributed mapping: data-parallel reads over a device mesh.

Design (BASELINE.json north star): reads stream data-parallel across chips
(the TPU-native form of the reference's chunked batch loop, alnmain.c:330);
the index is replicated per chip (configs 1-2, 4) or sharded over the
'model' axis (configs 3, 5 — large genomes).  Per-shard results carry a
psum'd valid-read counter so the sensitivity metric (alnmain.c:541) is a
real cross-chip collective; record arrays ride the out-sharding back to the
host (an all-gather at the data boundary).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device import DeviceIndex
from ..mapping.pipeline import MapperConfig, make_map_step


def _pad0(a, m: int):
    """Pad dim 0 to a multiple of m (pad rows are never gathered — all
    pipeline gathers clip to the true n-1)."""
    r = (-a.shape[0]) % m
    if r:
        pad = jnp.zeros((r,) + a.shape[1:], a.dtype)
        a = jnp.concatenate([a, pad], axis=0)
    return a


def shard_index(idx: DeviceIndex, mesh: Mesh, shard_tables: bool = False
                ) -> DeviceIndex:
    """Place the index on the mesh: replicated, or with the big gather
    tables (SA, lchash, text) sharded row-wise over the 'model' axis."""
    rep = NamedSharding(mesh, P())
    if not shard_tables:
        shard = rep
        nm = 1
    else:
        shard = NamedSharding(mesh, P("model"))
        nm = mesh.shape["model"]
    return DeviceIndex(
        packed=jax.device_put(idx.packed, rep),
        occ_samp=jax.device_put(idx.occ_samp, rep),
        c4=jax.device_put(idx.c4, rep),
        sa_ctx=jax.device_put(_pad0(idx.sa_ctx, nm), shard),
        sa_hi=None if idx.sa_hi is None
        else jax.device_put(_pad0(idx.sa_hi, nm), shard),
        lch=jax.device_put(_pad0(idx.lch, nm), shard),
        lch_hi=None if idx.lch_hi is None
        else jax.device_put(_pad0(idx.lch_hi, nm), shard),
        text_packed=jax.device_put(_pad0(idx.text_packed, nm), shard),
        text_pair=None if idx.text_pair is None
        else jax.device_put(_pad0(idx.text_pair, nm), shard),
        mta_start=jax.device_put(idx.mta_start, rep),
        mta_len=jax.device_put(idx.mta_len, rep),
    )


def _valid_count(cfg: MapperConfig, out, lens):
    """Mapped-read count for the sensitivity metric (alnmain.c:541).

    Pad rows (lens == 0) never count: a zero-length read trivially
    'aligns' with ed 0, so the global psum'd counter must mask them."""
    mw = cfg.meta_words
    if "blob" in out:
        meta = jax.lax.bitcast_convert_type(
            out["blob"][:, :4 * mw].reshape(-1, mw, 4), jnp.int32)
    else:
        meta = out["meta"]
    ed = meta[:, mw - 3]
    found = meta[:, 2 if cfg.pos64 else 1]
    return jnp.sum((ed >= 0) & (found != 0) & (lens > 0)).astype(jnp.int32)


def make_sharded_map_step(cfg: MapperConfig, mesh: Mesh,
                          shard_tables: bool = False):
    """Data-parallel mapping step over `mesh`'s 'data' axis.

    cfg.B is the GLOBAL batch.  Returns step(idx, codes, codes_rc, lens,
    limits) -> (out dict, valid_count) where `valid_count` is the GLOBAL
    mapped-read count (a real cross-device collective, replicated to every
    process).

    Two lowerings, matching how the index was placed by `shard_index`:

      shard_tables=False — shard_map over 'data': each shard runs the
        single-chip step on B / n_data reads against its replicated index
        copy; the valid counter is psum'd over the data axis.
      shard_tables=True — GSPMD: the single-chip program runs on the
        GLOBAL batch with the big gather tables row-sharded over 'model';
        XLA partitions the gathers into per-shard lookups + collectives
        (the index never needs to fit on one chip).  The valid counter is
        a global sum (XLA inserts the reduction collective).
    """
    n_data = mesh.shape["data"]
    assert cfg.B % n_data == 0, (cfg.B, n_data)

    if shard_tables:
        inner = make_map_step(cfg)
        data_sh = NamedSharding(mesh, P("data"))

        @jax.jit
        def gspmd_step(idx, codes, codes_rc, lens, limits):
            codes = jax.lax.with_sharding_constraint(codes, data_sh)
            codes_rc = jax.lax.with_sharding_constraint(codes_rc, data_sh)
            lens = jax.lax.with_sharding_constraint(lens, data_sh)
            limits = jax.lax.with_sharding_constraint(limits, data_sh)
            out = inner(idx, codes, codes_rc, lens, limits)
            out = {k: jax.lax.with_sharding_constraint(v, data_sh)
                   for k, v in out.items()}
            return out, _valid_count(cfg, out, lens)

        return gspmd_step

    local_cfg = replace(cfg, B=cfg.B // n_data)
    local_step = make_map_step(local_cfg)

    def shard_fn(idx, codes, codes_rc, lens, limits):
        out = local_step(idx, codes, codes_rc, lens, limits)
        valid = jax.lax.psum(_valid_count(local_cfg, out, lens), "data")
        return out, valid

    out_keys = ("blob", "ops_tail")
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=({k: P("data") for k in out_keys}, P()),
    )
    return jax.jit(sharded)
