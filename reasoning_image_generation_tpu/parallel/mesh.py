# mesh.py — device-mesh data parallelism for batched generation.
"""Multi-chip scaling.

The reference scales by forking worker processes over sample indices
(reference src/cli.py:85-129).  The TPU-native equivalent is a 1-D device
mesh over the sample axis: per-sample keys are sharded, every pipeline stage
is elementwise over the batch, and the only cross-chip communication in the
whole workload is the corpus-dedup all_gather of 8-byte pHashes (ICI), after
which every chip holds the global keep-mask.  Images never leave their chip
until host export.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch (leading dim divisible by mesh size) onto the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_dedup_mask(mesh: Mesh, hashes: jnp.ndarray, threshold: int = 4,
                       axis: str = "data") -> jnp.ndarray:
    """Global dedup keep-mask with hashes sharded over the mesh.

    all_gather of [N/n, 8] u8 hashes rides ICI; the greedy pass runs
    replicated (64 bits/sample makes it trivially cheap) and each chip
    returns its shard of the mask.
    """
    from ..ops.phash import dedup_keep_mask

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis),
             out_specs=P(axis))
    def _mask(local_hashes):
        all_h = jax.lax.all_gather(local_hashes, axis)
        all_h = all_h.reshape(-1, local_hashes.shape[-1])
        keep = dedup_keep_mask(all_h, threshold=threshold)
        idx = jax.lax.axis_index(axis)
        n_local = local_hashes.shape[0]
        return jax.lax.dynamic_slice(keep, (idx * n_local,), (n_local,))

    return _mask(hashes)
