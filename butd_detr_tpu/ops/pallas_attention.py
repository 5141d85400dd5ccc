"""Pallas TPU fused attention with in-kernel probability dropout.

The unfused multi-head attention (nn/attention.py) materializes
(B, H, Lq, Lk) float32 logits AND probabilities to HBM — at the encoder's
visual self-attention (B=24, H=8, L=1024) that is ~1.6 GB per layer per
direction, and the trace shows the attention einsums + softmax at ~120 ms
of a 449 ms train step. This kernel keeps the whole score block in VMEM.

Why not `jax.experimental.pallas.ops.tpu.flash_attention`: the reference
trains with dropout on the attention PROBABILITIES (torch
nn.MultiheadAttention(dropout=0.1), used throughout
reference models/encoder_decoder_layers.py), which the stock kernel does
not support. Dropping it silently would change the training objective, so
this kernel implements it with the TPU PRNG: the Bernoulli mask is
generated in-kernel from a seed derived per (batch*head, q-block) and
REGENERATED identically in the backward kernels.

Design (shapes here: Lq, Lk <= ~1024, head_dim 36):
  * grid (B*H, Lq/BQ); K and V for the program's head are fully
    VMEM-resident (Lk*128*4 = 512 KB at L=1024), so no online-softmax
    accumulation is needed — plain max-subtracted softmax on the
    (BQ, Lk) block;
  * head_dim is padded to 128 lanes by the wrapper (zero pad: logits and
    output values are unchanged; the MXU tiles at 128 anyway);
  * torch-compatible masking: padded keys get FINFO_MIN (not -inf), so a
    fully-masked row yields uniform probabilities, matching
    nn/attention.py and torch;
  * dropout: keep iff uniform uint32 >= p * 2^32, scale kept probs by
    1/(1-p) — applied AFTER normalization, exactly like torch;
  * matmul precision (r3): DEFAULT = bf16 inputs, ONE MXU pass per tile,
    f32 accumulation (preferred_element_type) and f32 softmax — the
    standard TPU flash-attention recipe. The r3 profile showed the
    attention family at 92 ms of a 380 ms step with the old
    Precision.HIGHEST setting, which decomposes every f32 matmul into
    SIX bf16 passes; one bf16 pass is ~0.4% relative on the scores,
    comparable to the TF32 (10-bit mantissa) matmuls the reference
    itself trained with on A100 (torch 1.10 default). `precise=True`
    (or env BUTD_ATTN_PRECISE=1) restores f32/HIGHEST for strict
    parity studies; the dropout mask and all semantics are identical
    in both modes;
  * backward recomputes scores/probs/mask per block (no residuals except
    the forward output is not even needed):
        dPt = D * (dO V^T)            D = mask/(1-p)
        dS  = P * (dPt - rowsum(dPt * P))
        dQ  = dS K ;  dK += dS^T Q ;  dV += (D*P)^T dO
    dK/dV accumulate across q-blocks in the output block (sequential TPU
    grid, index_map constant over the q axis).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DPAD = 128  # padded head dim (lane width)
NEG = float(jnp.finfo(jnp.float32).min)


def _seed_for(seed, bh, qi, nq):
    return seed + bh * nq + qi


def _mm(a, b, dims, precise):
    """dot_general with f32 accumulation; bf16 single-pass unless precise."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST if precise
        else lax.Precision.DEFAULT,
    )


def _prob_block(q, k, kvmask, precise):
    """(BQ, D) x (Lk, D) -> softmax probs (BQ, Lk), torch-min masking.
    Scores accumulate in f32; softmax is f32 in both modes."""
    s = _mm(q, k, ((1,), (1,)), precise)  # (BQ, Lk)
    s = jnp.where(kvmask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _drop_mask(shape, p_drop):
    """Bernoulli keep-mask / (1-p), from the already-seeded PRNG."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(p_drop * (2.0**32)), 2**32 - 1))
    keep = bits >= thresh
    return jnp.where(keep, 1.0 / (1.0 - p_drop), 0.0).astype(jnp.float32)


def _fwd_kernel(p_drop, nq, precise, q_ref, k_ref, v_ref, mask_ref,
                seed_ref, o_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh = pl.program_id(0)
    qi = pl.program_id(1)
    p = _prob_block(q_ref[0], k_ref[0], mask_ref[0, 0], precise)
    if p_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref[0], bh, qi, nq))
        p = p * _drop_mask(p.shape, p_drop)
    if not precise:
        p = p.astype(jnp.bfloat16)
    o_ref[0] = _mm(p, v_ref[0], ((1,), (0,)), precise)


def _bwd_kernel(p_drop, nq, precise, q_ref, k_ref, v_ref, mask_ref,
                seed_ref, do_ref, dq_ref, dk_ref, dv_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    p = _prob_block(q, k, mask_ref[0, 0], precise)
    if p_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref[0], bh, qi, nq))
        d = _drop_mask(p.shape, p_drop)
    else:
        d = None
    dov = _mm(do, v, ((1,), (1,)), precise)  # dO V^T: (BQ, Lk)
    dpt = dov if d is None else d * dov
    ds = p * (dpt - jnp.sum(dpt * p, axis=-1, keepdims=True))
    dp_eff = p if d is None else d * p
    if not precise:
        ds = ds.astype(jnp.bfloat16)
        dp_eff = dp_eff.astype(jnp.bfloat16)
    dq_ref[0] = _mm(ds, k, ((1,), (0,)), precise)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # dk/dv accumulate in the f32 output blocks across q-blocks
    dk_ref[0] += _mm(ds, q, ((0,), (0,)), precise)  # dS^T Q: (Lk, D)
    dv_ref[0] += _mm(dp_eff, do, ((0,), (0,)), precise)  # (D*P)^T dO


def _block_q(lq):
    # BQ=256 keeps the backward's working set (p/dov/dpt/ds/d blocks of
    # (BQ, Lk) plus resident K/V) within the 16 MB scoped-VMEM budget at
    # Lk=1024 (BQ=512 measured 16.9 MB and OOMed)
    if lq % 256 == 0:
        return 256
    if lq % 128 == 0:
        return 128
    return lq  # already padded to a multiple of 8 by the wrapper


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attend(q, k, v, kvmask, seed, p_drop, interpret, precise):
    out, _ = _attend_fwd(q, k, v, kvmask, seed, p_drop, interpret, precise)
    return out


def _call(kernel, p_drop, precise, q, k, v, kvmask, seed, n_out, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH, Lq, D = q.shape
    Lk = k.shape[1]
    BQ = _block_q(Lq)
    nq = Lq // BQ
    outs = [jax.ShapeDtypeStruct((BH, Lq, D), jnp.float32)]
    out_specs = [pl.BlockSpec((1, BQ, D), lambda bh, qi: (bh, qi, 0),
                              memory_space=pltpu.VMEM)]
    if n_out == 3:
        outs += [jax.ShapeDtypeStruct((BH, Lk, D), jnp.float32),
                 jax.ShapeDtypeStruct((BH, Lk, D), jnp.float32)]
        out_specs += [
            pl.BlockSpec((1, Lk, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec((1, BQ, D), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, Lk, D), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, Lk, D), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, 1, Lk), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),  # kv mask (BH, 1, Lk)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
    ]
    if kernel is _bwd_kernel:
        in_specs.append(
            pl.BlockSpec((1, BQ, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM)  # dO
        )
    res = pl.pallas_call(
        partial(kernel, p_drop, nq, precise),
        grid=(BH, nq),
        in_specs=in_specs,
        out_specs=out_specs if n_out == 3 else out_specs[0],
        out_shape=outs if n_out == 3 else outs[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return res


def _attend_fwd(q, k, v, kvmask, seed, p_drop, interpret, precise):
    out = _call(_fwd_kernel, p_drop, precise, q, k, v, kvmask, seed, 1,
                interpret)(q, k, v, kvmask, seed)
    return out, (q, k, v, kvmask, seed)


def _attend_bwd(p_drop, interpret, precise, resid, do):
    q, k, v, kvmask, seed = resid
    if not precise:
        do = do.astype(jnp.bfloat16)
    dq, dk, dv = _call(_bwd_kernel, p_drop, precise, q, k, v, kvmask,
                       seed, 3, interpret)(q, k, v, kvmask, seed, do)
    return dq, dk, dv, None, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_attention(
    q,  # (B, H, Lq, Dh) float
    k,  # (B, H, Lk, Dh)
    v,  # (B, H, Lk, Dh)
    key_padding_mask=None,  # (B, Lk) bool, True == PAD
    *,
    sm_scale: float = 1.0,
    dropout_p: float = 0.0,
    dropout_seed=None,  # int32 scalar array; required when dropout_p > 0
    interpret: bool = False,
    precise: bool = None,  # None => env BUTD_ATTN_PRECISE (default off)
):
    """Fused scaled-dot-product attention with prob-dropout.

    Returns (B, H, Lq, Dh) float32. Semantics match nn/attention.py's
    unfused path (torch nn.MultiheadAttention): FINFO_MIN masking,
    post-normalization dropout scaled by 1/(1-p). Differentiable in
    q/k/v (the dropout mask is regenerated from the same seed in the
    backward kernels).

    `precise=False` (default): bf16 matmul inputs, f32 accumulation and
    f32 softmax — one MXU pass per tile and half the VMEM traffic.
    `precise=True` / BUTD_ATTN_PRECISE=1: f32 inputs at HIGHEST, for
    strict-parity studies (dropout masks and semantics are identical).

    NOTE: the env fallback is resolved at TRACE time and does not key the
    jit cache — changing BUTD_ATTN_PRECISE after the first compile in a
    process is silently ignored. Config-built models thread the choice
    explicitly (Config.attn_precise -> model attribute -> `precise=`),
    which recompiles correctly.
    """
    import os

    if precise is None:
        precise = os.environ.get("BUTD_ATTN_PRECISE", "0") == "1"
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    qpad = (-Lq) % 8
    kpad = (-Lk) % 128
    in_dtype = jnp.float32 if precise else jnp.bfloat16

    def prep(x, pad_l):
        # scale/cast in f32 first so bf16 rounds the SCALED q once
        x = x.astype(jnp.float32).astype(in_dtype)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_l), (0, DPAD - Dh)))
        return x.reshape(B * H, x.shape[2], DPAD)

    qf = prep(q.astype(jnp.float32) * sm_scale, qpad)
    kf = prep(k, kpad)
    vf = prep(v, kpad)
    if key_padding_mask is None:
        mask = jnp.ones((B, Lk), jnp.int32)
    else:
        mask = (~key_padding_mask).astype(jnp.int32)
    mask = jnp.pad(mask, ((0, 0), (0, kpad)))
    mask = jnp.repeat(mask, H, axis=0)[:, None, :]  # (B*H, 1, Lk_pad)
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    out = _attend(qf, kf, vf, mask, seed, float(dropout_p),
                  bool(interpret), bool(precise))
    out = out.reshape(B, H, Lq + qpad, DPAD)[:, :, :Lq, :Dh]
    return out
