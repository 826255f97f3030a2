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
        sa=jax.device_put(_pad0(idx.sa, nm), shard),
        sa_ctx=jax.device_put(_pad0(idx.sa_ctx, nm), shard),
        lch=jax.device_put(_pad0(idx.lch, nm), shard),
        text=jax.device_put(_pad0(idx.text, nm), shard),
        text_packed=jax.device_put(_pad0(idx.text_packed, nm), shard),
        mta_start=jax.device_put(idx.mta_start, rep),
        mta_len=jax.device_put(idx.mta_len, rep),
    )


def make_sharded_map_step(cfg: MapperConfig, mesh: Mesh):
    """Data-parallel mapping step over `mesh`'s 'data' axis.

    cfg.B is the GLOBAL batch; each shard runs the single-chip step on
    B / n_data reads.  Returns step(idx, codes, lens) -> (out dict, valid_count)
    where `valid_count` is psum'd across the data axis.
    """
    n_data = mesh.shape["data"]
    assert cfg.B % n_data == 0, (cfg.B, n_data)
    local_cfg = replace(cfg, B=cfg.B // n_data)
    local_step = make_map_step(local_cfg)

    def shard_fn(idx, codes, codes_rc, lens, limits):
        out = local_step(idx, codes, codes_rc, lens, limits)
        if "blob" in out:
            meta = jax.lax.bitcast_convert_type(
                out["blob"][:, :32].reshape(-1, 8, 4), jnp.int32)
            ed, found = meta[:, 5], meta[:, 1]
        else:
            ed, found = out["meta"][:, 5], out["meta"][:, 1]
        valid = jnp.sum((ed >= 0) & (found != 0)).astype(jnp.int32)
        valid = jax.lax.psum(valid, "data")
        return out, valid

    out_keys = ("meta", "ops") if local_cfg.use_gact \
        else ("blob", "ops_tail")
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=({k: P("data") for k in out_keys}, P()),
    )
    return jax.jit(sharded)
