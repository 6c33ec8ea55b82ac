"""Ring-sharded exhaustive matching: the O(N²) sweep over a device mesh.

The reference sweeps all frame pairs with OpenMP (spherical_sfm_tools.cpp:
575-600). Across a TPU mesh the idiomatic layout (SURVEY.md §5.7, the
sequence-parallel analogue) is a *ring*: each device holds one block of
frames' descriptors; at step s every device matches its resident block
against the block that has rotated s hops around the ring (`ppermute` over
ICI). After nd steps every block pair has met exactly once — structurally
identical to ring attention, with descriptor blocks in place of KV blocks.

Works identically on a CPU mesh (`--xla_force_host_platform_device_count`)
and a TPU slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matching import _two_smallest, pairwise_sq_dists


def _block_two_nn(d_query, d_train, vq, vt):
    """Two-NN of every query frame against every train frame in the blocks.

    d_query/d_train: (Bf, K, D); returns (m1, m2, nn) each (Bf_q, Bf_t, K).
    """

    def one(dq, vq1, dt, vt1):
        d = pairwise_sq_dists(dq, dt)
        d = jnp.where(vt1[None, :], d, jnp.inf)
        d = jnp.where(vq1[:, None], d, jnp.inf)
        return _two_smallest(d)

    return jax.vmap(
        lambda dq, vq1: jax.vmap(lambda dt, vt1: one(dq, vq1, dt, vt1))(
            d_train, vt
        )
    )(d_query, vq)


@partial(jax.jit, static_argnames=("mesh", "ratio"))
def ring_exhaustive_match(
    mesh: Mesh,
    desc: jnp.ndarray,    # (F, K, D) — F divisible by mesh size
    valid: jnp.ndarray,   # (F, K)
    ratio: float = 0.75,
):
    """All-pairs ratio-test matching with ring communication.

    Returns (nn (F, F, K) int32, accept (F, F, K) bool): for every ordered
    frame pair (i train, j query), the matched index in frame i of each
    feature of frame j (with the Lowe test applied). The caller keeps the
    i < j triangle. Device d computes the block rows it owns; blocks travel
    the ring so each pair of blocks meets once.
    """
    axis = mesh.axis_names[0]
    nd = mesh.shape[axis]
    F, K, D = desc.shape
    Bf = F // nd

    def body(local_desc, local_valid):
        # local block stays resident (the "query"/train side); a copy
        # rotates around the ring.
        rot_desc = local_desc
        rot_valid = local_valid
        outs_m1, outs_m2, outs_nn = [], [], []
        for step in range(nd):
            # match queries = rotating block against train = local block
            m1, m2, nn = _block_two_nn(
                rot_desc, local_desc, rot_valid, local_valid
            )
            outs_m1.append(m1)
            outs_m2.append(m2)
            outs_nn.append(nn)
            if step + 1 < nd:
                perm = [(i, (i + 1) % nd) for i in range(nd)]
                rot_desc = jax.lax.ppermute(rot_desc, axis, perm)
                rot_valid = jax.lax.ppermute(rot_valid, axis, perm)
        # (nd, Bf_query, Bf_train, K)
        return (
            jnp.stack(outs_m1), jnp.stack(outs_m2),
            jnp.stack(outs_nn).astype(jnp.int32),
        )

    spec = P(axis)
    m1s, m2s, nns = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(P(None, None, axis), P(None, None, axis), P(None, None, axis)),
    )(desc.reshape(F, K, D), valid)
    # m1s: (nd steps, Bf_query, F_train, K) with the train axis sharded; the
    # query block at (step, device d) is the block originally on device
    # (d − step) mod nd.
    accept = (m1s < (ratio * ratio) * m2s) & jnp.isfinite(m1s)

    # Reassemble into (F_query, F_train, K) on the host view.
    nn_full = jnp.zeros((F, F, K), jnp.int32)
    acc_full = jnp.zeros((F, F, K), bool)
    for step in range(nd):
        for d in range(nd):
            src = (d - step) % nd  # owner of the rotating (query) block
            q0 = src * Bf
            t0 = d * Bf
            nn_full = nn_full.at[q0:q0 + Bf, t0:t0 + Bf].set(
                nns[step, :, t0:t0 + Bf]
            )
            acc_full = acc_full.at[q0:q0 + Bf, t0:t0 + Bf].set(
                accept[step, :, t0:t0 + Bf]
            )
    return nn_full, acc_full


def ring_match_pairs(
    mesh: Mesh,
    desc: np.ndarray,
    valid: np.ndarray,
    max_matches: int,
    ratio: float = 0.75,
):
    """Host wrapper: ring sweep → compact (pair_i, pair_j, idx0, idx1, mask)
    tables for the i < j pairs, matching pad_match_table's layout."""
    from ..ops.matching import nn_to_index_pairs

    F, K, _ = desc.shape
    nd = mesh.shape[mesh.axis_names[0]]
    pad = (-F) % nd
    if pad:
        desc = np.concatenate([desc, np.zeros((pad,) + desc.shape[1:], desc.dtype)])
        valid = np.concatenate([valid, np.zeros((pad, K), bool)])
    nn, accept = ring_exhaustive_match(
        mesh, jnp.asarray(desc, jnp.float32), jnp.asarray(valid), ratio
    )
    pair_i, pair_j = np.triu_indices(F, k=1)
    # queries are frame j features matched into frame i (the matcher's
    # reversed query/train convention)
    nn_sel = nn[pair_j, pair_i]      # (P, K)
    acc_sel = accept[pair_j, pair_i]
    i0, i1, mask = jax.vmap(
        lambda n, a: nn_to_index_pairs(n, a, K, max_matches)
    )(nn_sel, acc_sel)
    return (
        pair_i.astype(np.int32), pair_j.astype(np.int32),
        np.asarray(i0), np.asarray(i1), np.asarray(mask),
    )
