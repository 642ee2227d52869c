"""Fused multi-head attention for TPU (Pallas) with a flash-style custom VJP.

Why this kernel exists: the explainer batches T_frames cotangents through the
attention backward (one batched VJP per draw, explain/expected_gradients.py),
so the XLA path would materialize softmax probabilities of shape
[rows, H, T, T] in HBM. At reference audio lengths that is modest
(runtime_analysis.py's 80,000-sample row is 5 s = T~250 frames at the x320
downsample), which is why XLA wins there (artifacts/kernel_decision.md);
the VMEM-residency win appears on long-form audio — 30 s = T~1,500 puts
XLA's probability tensors at ~GB per layer per draw. This kernel keeps
scores/probabilities in VMEM in both directions; HBM only sees q/k/v/o-sized
tensors plus a per-row logsumexp residual.

Structure (seq lengths here are ASR frame counts, ~50-2500):
  forward : grid (B*H, T/bq) — one q-block against full K/V in VMEM,
            single-pass softmax with saved logsumexp
  backward: two kernels — dq over q-blocks, dk/dv over kv-blocks — the
            standard flash backward with score recomputation from residuals

Bias support (additive, pre-softmax):
  * [B, 1, 1, T] padding masks — treated as constants (zero cotangent);
  * [B, H, T, T] full score biases — the Transformer-XL rel-pos scores of
    the Wav2Vec2-Conformer/NeMo families (ops/attention.py::rel_shift);
    differentiable: the dq pass also emits d(bias) = dS, which the rel-pos
    layers backprop into the position projections.

Runs in interpreter mode automatically off-TPU (CPU tests), so the same code
path is exercised everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale, t_actual):
    q = q_ref[0].astype(jnp.float32)          # [bq, D]
    k = k_ref[0].astype(jnp.float32)          # [T, D]
    v = v_ref[0].astype(jnp.float32)          # [T, D]
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [bq, T]
    if bias_ref is not None:
        # [1, T] (mask row) or [bq, T] (full bias block) — both broadcast
        s = s + bias_ref[0].astype(jnp.float32)
    # mask padded kv columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_actual, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l)).astype(jnp.float32)  # [bq, 1]


def _bias_spec_fwd(bias_kind: str, block_q: int, t_pad: int):
    """BlockSpec of the bias operand for q-blocked kernels."""
    if bias_kind == "mask":
        return pl.BlockSpec((1, 1, t_pad), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, block_q, t_pad), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _fwd(q3, k3, v3, bias3, bias_kind, scale, block_q, interpret, t_actual):
    """q3/k3/v3: [BH, Tpad, D]; bias3: None, [BH, 1, Tpad] (mask) or
    [BH, Tpad, Tpad] (full).

    Mosaic requires the last two block dims to be (divisible by 8, divisible
    by 128) or equal to the array dims — hence lse/bias travel as 3D
    row/column layouts, never as 2D [BH, T] planes."""
    bh, t_pad, d = q3.shape
    nq = t_pad // block_q

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q3, k3, v3]
    if bias3 is not None:
        in_specs.append(_bias_spec_fwd(bias_kind, block_q, t_pad))
        args.append(bias3)
        kernel = _fwd_kernel
    else:
        kernel = lambda q, k, v, o, lse, **kw: _fwd_kernel(q, k, v, None, o, lse, **kw)

    return pl.pallas_call(
        functools.partial(kernel, scale=scale, t_actual=t_actual),
        grid=(bh, nq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------- backward

def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref, dd_ref, dq_ref,
               dbias_ref, *, scale, t_actual):
    q = q_ref[0].astype(jnp.float32)      # [bq, D]
    k = k_ref[0].astype(jnp.float32)      # [T, D]
    v = v_ref[0].astype(jnp.float32)      # [T, D]
    g = g_ref[0].astype(jnp.float32)      # [bq, D]
    lse = lse_ref[0]                      # [bq, 1]
    dd = dd_ref[0]                        # [bq, 1]

    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_actual, s, _NEG_INF)
    p = jnp.exp(s - lse)                  # [bq, T]
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dd)                    # [bq, T] == d(bias) for this block
    dq = scale * jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    if dbias_ref is not None:
        dbias_ref[0] = ds.astype(dbias_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, *, scale, t_actual):
    q = q_ref[0].astype(jnp.float32)      # [T, D]
    k = k_ref[0].astype(jnp.float32)      # [bk, D]
    v = v_ref[0].astype(jnp.float32)      # [bk, D]
    g = g_ref[0].astype(jnp.float32)      # [T, D]
    lse = lse_ref[0]                      # [1, T] (row layout)
    dd = dd_ref[0]                        # [1, T]

    # transposed scores: [bk, T_q]
    st = jax.lax.dot_general(k, q * scale, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if bias_ref is not None:
        # [bk, 1] column (mask) or [bk, Tq] transposed full-bias block
        st = st + bias_ref[0].astype(jnp.float32)
    row_q = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    st = jnp.where(row_q < t_actual, st, _NEG_INF)
    pt = jnp.exp(st - lse)                # [bk, Tq]
    dv = jax.lax.dot_general(pt, g, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v, g, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [bk, Tq]
    dst = pt * (dpt - dd)
    dk = scale * jax.lax.dot_general(dst, q, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bias_kind(bias_orig) -> str:
    if bias_orig is None:
        return "none"
    return "mask" if bias_orig.shape[1:3] == (1, 1) else "full"


def _bwd(block_q, interpret, scale, res, g4):
    # bias_kind is recomputed from the (static) bias shape — residuals must
    # be JAX types, so the string can't ride along
    q3, k3, v3, bias3, bias_orig, o3, lse_col = res
    bias_kind = _bias_kind(bias_orig)
    bh, t_pad, d = q3.shape
    t_actual = g4.shape[2]
    g3 = _pad_to(g4.reshape(-1, t_actual, d), t_pad, 1)

    dd = jnp.sum(g3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1)  # [BH, Tpad]
    dd_col = dd[:, :, None]                      # [BH, Tpad, 1] for dq blocks
    dd_row = dd[:, None, :]                      # [BH, 1, Tpad] for dkv
    lse_row = lse_col[:, :, 0][:, None, :]       # [BH, 1, Tpad]

    nq = t_pad // block_q
    common_specs = dict(memory_space=pltpu.VMEM)

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, **common_specs)

    # dq: blocked over q (also emits d(bias) when the bias is a full score
    # matrix — the rel-pos layers need it)
    in_specs = [
        blk((1, block_q, d), lambda b, i: (b, i, 0)),   # q
        blk((1, t_pad, d), lambda b, i: (b, 0, 0)),     # k
        blk((1, t_pad, d), lambda b, i: (b, 0, 0)),     # v
    ]
    args = [q3, k3, v3]
    want_dbias = bias_kind == "full"
    if bias3 is not None:
        in_specs.append(_bias_spec_fwd(bias_kind, block_q, t_pad))
        args.append(bias3)
        dq_kernel = _dq_kernel
    else:
        dq_kernel = lambda q, k, v, g, l, dd_, dq, db, **kw: _dq_kernel(
            q, k, v, None, g, l, dd_, dq, db, **kw
        )
    if not want_dbias:
        base = dq_kernel
        dq_kernel = lambda *refs, **kw: base(*refs, None, **kw)
    in_specs += [
        blk((1, block_q, d), lambda b, i: (b, i, 0)),   # g
        blk((1, block_q, 1), lambda b, i: (b, i, 0)),   # lse (column)
        blk((1, block_q, 1), lambda b, i: (b, i, 0)),   # dd (column)
    ]
    out_specs = [blk((1, block_q, d), lambda b, i: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype)]
    if want_dbias:
        out_specs.append(blk((1, block_q, t_pad), lambda b, i: (b, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, t_pad, t_pad), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(dq_kernel, scale=scale, t_actual=t_actual),
        grid=(bh, nq),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if want_dbias else out_specs[0],
        out_shape=tuple(out_shape) if want_dbias else out_shape[0],
        interpret=interpret,
    )(*args, g3, lse_col, dd_col)
    dq3, dbias3 = (outs if want_dbias else (outs, None))

    # dk/dv: blocked over kv
    in_specs2 = [
        blk((1, t_pad, d), lambda b, i: (b, 0, 0)),     # q
        blk((1, block_q, d), lambda b, i: (b, i, 0)),   # k
        blk((1, block_q, d), lambda b, i: (b, i, 0)),   # v
    ]
    args2 = [q3, k3, v3]
    if bias3 is not None:
        if bias_kind == "mask":
            bias_t = bias3[:, 0, :][:, :, None]          # [BH, Tpad, 1] column
            in_specs2.append(blk((1, block_q, 1), lambda b, i: (b, i, 0)))
        else:
            bias_t = jnp.swapaxes(bias3, 1, 2)           # [BH, Tk, Tq]
            in_specs2.append(blk((1, block_q, t_pad), lambda b, i: (b, i, 0)))
        args2.append(bias_t)
        dkv_kernel = _dkv_kernel
    else:
        dkv_kernel = lambda q, k, v, g, l, dd_, dk, dv, **kw: _dkv_kernel(
            q, k, v, None, g, l, dd_, dk, dv, **kw
        )
    in_specs2 += [
        blk((1, t_pad, d), lambda b, i: (b, 0, 0)),     # g
        blk((1, 1, t_pad), lambda b, i: (b, 0, 0)),     # lse (row)
        blk((1, 1, t_pad), lambda b, i: (b, 0, 0)),     # dd (row)
    ]
    dk3, dv3 = pl.pallas_call(
        functools.partial(dkv_kernel, scale=scale, t_actual=t_actual),
        grid=(bh, nq),
        in_specs=in_specs2,
        out_specs=(
            blk((1, block_q, d), lambda b, i: (b, i, 0)),
            blk((1, block_q, d), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
        ),
        interpret=interpret,
    )(*args2, g3, lse_row, dd_row)

    b = g4.shape[0]
    h = g4.shape[1]

    def unshape(x3):
        return x3[:, :t_actual].reshape(b, h, t_actual, d)

    if bias_orig is None:
        dbias = None
    elif bias_kind == "mask":
        # masks are constants; the cotangent must still match their structure
        dbias = jnp.zeros_like(bias_orig)
    else:
        dbias = dbias3[:, :t_actual, :t_actual].reshape(b, h, t_actual, t_actual)
        # undo broadcasting: the cotangent must match bias_orig's exact shape
        for ax, (bs, fs) in enumerate(zip(bias_orig.shape, dbias.shape)):
            if bs == 1 and fs != 1:
                dbias = dbias.sum(axis=ax, keepdims=True)
        dbias = dbias.astype(bias_orig.dtype)
    return unshape(dq3), unshape(dk3), unshape(dv3), dbias


# ---------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias, block_q, interpret):
    out, _ = _flash_fwd(q, k, v, bias, block_q, interpret)
    return out


def _flash_fwd(q, k, v, bias, block_q, interpret):
    b, h, t, d = q.shape
    scale = d**-0.5
    t_pad = -(-t // block_q) * block_q

    def flat(x):
        return _pad_to(x.reshape(b * h, t, d), t_pad, 1)

    q3, k3, v3 = flat(q), flat(k), flat(v)
    bias_kind = _bias_kind(bias)
    bias3 = None
    if bias is not None and bias.shape[1:3] == (1, 1):
        # [B, 1, 1, T] additive mask -> [BH, 1, Tpad] row layout (pad -inf)
        bias_kind = "mask"
        bias2 = jnp.broadcast_to(bias[:, 0, 0, :], (b, t))
        bias2 = jnp.repeat(bias2, h, axis=0)
        bias2 = jnp.pad(bias2, ((0, 0), (0, t_pad - t)), constant_values=_NEG_INF)
        bias3 = bias2.astype(jnp.float32)[:, None, :]
    elif bias is not None:
        # [B, H, T, T] full score bias (rel-pos) -> [BH, Tpad, Tpad];
        # padded key columns are masked in-kernel, so pad value is moot
        bias_kind = "full"
        bias4 = jnp.broadcast_to(bias, (b, h, t, t)).reshape(b * h, t, t)
        bias3 = _pad_to(_pad_to(bias4, t_pad, 1), t_pad, 2).astype(jnp.float32)

    o3, lse_col = _fwd(q3, k3, v3, bias3, bias_kind, scale, block_q,
                       interpret, t)
    out = o3[:, :t].reshape(b, h, t, d)
    return out, (q3, k3, v3, bias3, bias, o3, lse_col)


def _flash_bwd(block_q, interpret, res, g):
    q3, *_ = res
    d = q3.shape[-1]
    scale = d**-0.5
    return _bwd(block_q, interpret, scale, res, g)


_flash.defvjp(
    lambda q, k, v, bias, block_q, interpret: _flash_fwd(
        q, k, v, bias, block_q, interpret
    ),
    _flash_bwd,
)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention over [B, H, T, D]; bias is an optional additive
    [B, 1, 1, T] mask (constant) or [B, H, T, T] score bias
    (differentiable). Differentiable via the flash backward."""
    if interpret is None:
        interpret = _use_interpret()
    block_q = min(block_q, max(8, 1 << (q.shape[2] - 1).bit_length()))
    return _flash(q, k, v, bias, block_q, interpret)
