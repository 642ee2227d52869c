"""Pallas TPU kernel for the strided-conv input gradient (dgrad).

Why this kernel exists: the explainer's per-draw Jacobian backward spends
~36 ms/draw in the conv feature-encoder backward at only ~31% of MXU peak
(artifacts/kernel_decision.md, r4_bwd_decomp) — the single largest
identified headroom after the r3/r4/r5 formulation campaign. XLA lowers the
stride-s dgrad as an input-dilated convolution that wastes a factor ~s of
its MACs on inserted zeros; the r5_conv_bwd probe showed a *pure-JAX*
polyphase GEMM backward still loses (overlap-add scatter and
[B, t, s*C_in] intermediates cost more than the dilation zeros), but those
overheads are exactly what a fused kernel removes: here every tap is a dense
MXU matmul accumulated in VMEM, and the phase interleave is a free in-VMEM
layout of the output block.

Math (valid conv, stride s, kernel taps k in [0, K)):

  forward   y[b, u, co]  = sum_{k, ci} x[b, u*s + k, ci] * W[k, ci, co]
  dgrad     xbar[b, t, ci] = sum_{u, k: u*s + k = t} ybar[b, u, :] @ W[k].T

Writing t = v*s + r (phase r in [0, s)) and k = d*s + r (d in [0, m),
m = ceil(K/s)):

  xbar[b, v*s + r, :] = sum_d  ybar[b, v - d, :] @ W[d*s + r].T

so each output block [BT, TV, s*C_in] is K dense [BT*TV, C_out] x
[C_out, C_in] matmuls over tap-transposed weights, with ybar shifted by d
rows (halo <= m-1 rows, served by a second clamped block view) and edge
rows (v - d outside [0, T_out)) masked to zero.

Batching: the explainer reaches this op by vmapping a one-hot cotangent
basis through the model VJP (explain/expected_gradients.py::_jacobian).
JAX's default pallas batching rule would prepend a size-1-block grid
dimension — thousands of tiny cells whose fixed DMA/issue overhead was
measured to dominate (r5_conv_pallas first cut: 54 ms/draw vs lax's 36).
A ``custom_vmap`` rule instead folds any vmapped axes into the kernel's own
leading batch dim, so cotangent rows become real matmul rows (M = BT*TV).

The op is exposed as ``conv1d_pallas(x, kernel, stride)``: lax.conv forward
(fastest measured, r3_conv_ab), this kernel as the input-gradient of the
custom VJP, and a per-tap einsum wgrad (DCE'd in the explainer path, where
params are closed over and only the input cotangent is consumed). Runs in
interpreter mode off-TPU so CPU tests exercise the same code path (house
rule, kernels/flash_attention.py).

Reference contract: the conv shapes are Wav2Vec2's feature encoder
(reference shap_calculation.py:219 delegates to transformers; SURVEY.md D1)
— C_in = C_out = 512, (K, s) in {(3, 2), (2, 2)}; the (10, 5) first layer
has C_in = 1 and stays on the lax path (its dgrad GEMMs would be
lane-degenerate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tiles(itemsize: int) -> tuple[int, int]:
    """(BT, TV): batch rows and v rows per grid cell. Sized so the
    double-buffered blocks (2 ybar views + the s*C_in-wide output) plus the
    tap weights fit the ~16 MB VMEM budget — bf16 runs the wide tile, f32
    (tests, training) halves both axes."""
    return (4, 256) if itemsize <= 2 else (2, 128)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def eligible(c_in: int, c_out: int, stride: int, groups: int,
             padding: int) -> bool:
    """Shapes where the kernel's dense-matmul formulation pays: ungrouped,
    unpadded, strided convs with lane-aligned channel counts."""
    return (
        groups == 1
        and padding == 0
        and stride > 1
        and c_in % 128 == 0
        and c_out % 128 == 0
    )


def _dgrad_kernel(y_cur_ref, y_prev_ref, wt_ref, out_ref, *,
                  k_taps, stride, m, t_out, out_dtype):
    """One (b-tile, v-tile) cell: out[:, v, r*C_in:(r+1)*C_in] =
    sum_d masked_shift(Y, d) @ wt[d*s + r]."""
    bt, tv, _ = y_cur_ref.shape
    c_in = wt_ref.shape[2]
    y0 = y_cur_ref[...]                                   # [BT, TV, C_out]
    v0 = pl.program_id(1) * tv
    v_glob = v0 + lax.broadcasted_iota(jnp.int32, (1, tv, 1), 1)

    # Per-shift masked views of ybar: row v uses ybar[v - d].
    shifted = []
    for d in range(m):
        if d == 0:
            yd = y0
        else:
            # Halo: first d rows come from the previous block's tail.
            yd = jnp.concatenate(
                [y_prev_ref[:, tv - d:, :], y0[:, : tv - d, :]], axis=1
            )
        u = v_glob - d
        valid = jnp.logical_and(u >= 0, u < t_out)
        # where (not multiply): boundary-block padding is unspecified and
        # may contain non-finite values.
        yd = jnp.where(valid, yd, jnp.zeros_like(yd))
        shifted.append(yd.reshape(bt * tv, -1))

    for r in range(stride):
        acc = None
        for d in range(m):
            k = d * stride + r
            if k >= k_taps:
                continue
            part = jnp.dot(shifted[d], wt_ref[k],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        if acc is None:  # phase with no taps (k >= K for all d)
            acc = jnp.zeros((bt * tv, c_in), jnp.float32)
        out_ref[:, :, r * c_in:(r + 1) * c_in] = (
            acc.astype(out_dtype).reshape(bt, tv, c_in)
        )


def _dgrad_call(ybar: jnp.ndarray, wt: jnp.ndarray, stride: int,
                t_in: int) -> jnp.ndarray:
    """ybar: [B, T_out, C_out], wt: [K, C_out, C_in] -> xbar [B, T_in, C_in]."""
    b, t_out, c_out = ybar.shape
    k_taps, _, c_in = wt.shape
    s = stride
    m = -(-k_taps // s)
    v = t_out + m - 1  # phases cover t < v*s >= (t_out-1)*s + K; any
    # trailing input samples beyond the receptive coverage get zero gradient
    assert v * s >= (t_out - 1) * s + k_taps

    bt, tv = _tiles(ybar.dtype.itemsize)
    grid = (pl.cdiv(b, bt), pl.cdiv(v, tv))

    def cur_map(bi, vi):
        return (bi, vi, 0)

    def prev_map(bi, vi):
        return (bi, jnp.maximum(vi - 1, 0), 0)

    out = pl.pallas_call(
        functools.partial(
            _dgrad_kernel, k_taps=k_taps, stride=s, m=m, t_out=t_out,
            out_dtype=ybar.dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, tv, c_out), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tv, c_out), prev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, c_out, c_in), lambda bi, vi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, tv, s * c_in), cur_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, v, s * c_in), ybar.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_out * k_taps * c_in * c_out,
            bytes_accessed=2 * ybar.size * ybar.dtype.itemsize
            + b * t_in * c_in * ybar.dtype.itemsize + wt.size * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(ybar, ybar, wt)
    out = out.reshape(b, v * s, c_in)
    if v * s < t_in:
        out = jnp.pad(out, ((0, 0), (0, t_in - v * s), (0, 0)))
    return out[:, :t_in, :]


def conv1d_dgrad(ybar: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                 t_in: int) -> jnp.ndarray:
    """Input gradient of a valid stride-``stride`` conv1d.

    ybar: [B, T_out, C_out]; kernel: [K, C_in, C_out] -> xbar [B, T_in, C_in].
    Vmapped axes (the explainer's cotangent-row batch) are folded into B via
    a custom_vmap rule rather than pallas's default size-1-block grid axis.
    """
    wt = jnp.transpose(kernel, (0, 2, 1)).astype(ybar.dtype)  # [K, C_out, C_in]

    @custom_batching.custom_vmap
    def _dg(yb):
        return _dgrad_call(yb, wt, stride, t_in)

    @_dg.def_vmap
    def _dg_vmap(axis_size, in_batched, yb):  # noqa: ANN001
        (yb_batched,) = in_batched
        if not yb_batched:
            yb = jnp.broadcast_to(yb[None], (axis_size,) + yb.shape)
        flat = yb.reshape((-1,) + yb.shape[2:])
        out = _dg(flat)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return _dg(ybar)


def _conv1d_wgrad(x: jnp.ndarray, ybar: jnp.ndarray, stride: int,
                  k_taps: int) -> jnp.ndarray:
    """Weight gradient, per-tap einsum (plain matmuls; XLA DCEs this in the
    explainer path where the weight cotangent is never consumed)."""
    _, t_out, _ = ybar.shape
    taps = []
    for k in range(k_taps):
        xk = lax.slice_in_dim(x, k, k + stride * (t_out - 1) + 1, stride,
                              axis=1)  # [B, T_out, C_in]
        taps.append(jnp.einsum("bti,bto->io", xk, ybar,
                               preferred_element_type=jnp.float32))
    return jnp.stack(taps, axis=0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1d_pallas(x: jnp.ndarray, kernel: jnp.ndarray, stride: int):
    """Valid strided conv1d: lax forward, Pallas-dgrad backward.

    x: [B, T, C_in], kernel: [K, C_in, C_out] -> [B, T_out, C_out].
    """
    return lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )


def _conv1d_pallas_fwd(x, kernel, stride):
    return conv1d_pallas(x, kernel, stride), (x, kernel)


def _conv1d_pallas_bwd(stride, res, ybar):
    x, kernel = res
    dx = conv1d_dgrad(ybar, kernel, stride, x.shape[1])
    dw = _conv1d_wgrad(x, ybar, stride, kernel.shape[0])
    return dx, dw


conv1d_pallas.defvjp(_conv1d_pallas_fwd, _conv1d_pallas_bwd)
