"""Tensor-parallel sharding rules over the mesh's `mp` axis.

The reference's only parallelism is DDP (main_utils.py:310-313); this
module adds the TPU-idiomatic second axis: Megatron-style tensor
parallelism for the transformer stack, expressed purely as
`jax.sharding` PartitionSpecs — XLA's SPMD partitioner propagates the
layout through the attention/FFN einsums and inserts the psum after each
row-parallel projection, riding ICI on a real multi-chip mesh.

Rules (standard Megatron layout):
  * q/k/v projections   — column-parallel: kernel (d, d) -> P(None, "mp"),
    bias (d,) -> P("mp"); the heads dimension shards downstream.
  * out projections     — row-parallel: kernel -> P("mp", None), bias
    replicated (added after the implicit psum).
  * FFN Dense_0         — column-parallel; FFN Dense_1 — row-parallel.
  * everything else     — replicated (backbone convs are BN-coupled and
    bandwidth-bound, not weight-bound; the frozen RoBERTa trunk and the
    small heads don't pay for sharding at 288-d).

The same path rules shard the optimizer state: optax's mu/nu trees mirror
the param dict, so the trailing path components match identically.

Note: the fused Pallas attention kernel is not shard-aware; under mp>1
XLA reshards its operands around the custom call (correct, but the fast
path is the XLA attention route the kernel falls back to off-TPU). TP at
this model scale is exposed for mesh headroom and driver validation, not
as the default — DP is the right parallelism for a 288-d model.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_strings(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def param_pspec(path, leaf) -> P:
    """PartitionSpec for one (possibly optimizer-mirrored) param leaf."""
    keys = _path_strings(path)
    name = keys[-1] if keys else ""
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    if any(k in ("text_encoder", "backbone_net") for k in keys):
        return P()
    if any(k in ("q_proj", "k_proj", "v_proj") for k in keys):
        if name == "kernel" and ndim == 2:
            return P(None, "mp")
        if name == "bias" and ndim == 1:
            return P("mp")
        return P()
    if any(k == "out_proj" for k in keys):
        if name == "kernel" and ndim == 2:
            return P("mp", None)
        return P()
    if any(k.startswith("ffn") for k in keys):
        dense = [k for k in keys if k.startswith("Dense_")]
        if dense:
            first = dense[0].endswith("_0")
            if name == "kernel" and ndim == 2:
                return P(None, "mp") if first else P("mp", None)
            if name == "bias" and ndim == 1:
                return P("mp") if first else P()
        return P()
    return P()


def state_shardings(mesh: Mesh, state: Any):
    """A `state`-shaped pytree of NamedShardings: transformer weights
    (and their optimizer moments) sharded over `mp`, the rest replicated.

    Divisibility guard: a leaf whose sharded dimension does not divide by
    the mesh's mp size falls back to replicated, so odd head counts or
    tiny test configs never fault the partitioner.
    """
    mp = mesh.shape.get("mp", 1)

    def one(path, leaf):
        spec = param_pspec(path, leaf)
        shape = getattr(leaf, "shape", ())
        for dim, axis in enumerate(spec):
            if axis == "mp" and (dim >= len(shape) or shape[dim] % mp):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def commit_tp(mesh: Mesh, state: Any):
    """Place a fresh TrainState according to `state_shardings` (the tp
    analogue of `commit_replicated` — same single-executable rationale)."""
    shardings = state_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def shard_train_step_tp(train_step, mesh: Mesh, state: Any):
    """jit the train step with batch on dp and state sharded per the tp
    rules (state in == state out, so the executable is reused every step)."""
    shd = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    ss = state_shardings(mesh, state)
    return jax.jit(
        train_step,
        in_shardings=(ss, shd, rep),
        out_shardings=(ss, rep),
        donate_argnums=(0,),
    )
