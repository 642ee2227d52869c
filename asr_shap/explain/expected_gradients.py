"""Expected gradients — the TPU-native equivalent of shap.GradientExplainer.

Reference behavior (shap_calculation.py:133, :162; SURVEY.md D4): for input x
and background set B, draw ``nsamples`` pairs (b ~ Uniform(B), t ~ U(0,1)),
evaluate the input-Jacobian of the explained function f at the interpolation
point x_t = b + t*(x-b), multiply by (x-b), and average:

    phi[n, j] = E_{b,t}[ dF_j/dx_n (b + t (x-b)) * (x_n - b_n) ]

The reference runs this serially, one perturbation at a time
(``batch_size=1``) and one Jacobian row at a time — a full model
forward+backward per (draw, output) pair. Here the whole sampler is one
fused XLA computation:

  * the output axis is a *batched VJP*: one forward per draw, then the
    cotangent basis is vmapped through the backward — XLA turns the
    T_frames backward passes into one batched backward;
  * the draw axis is `lax.scan` over chunks x `vmap` inside a chunk
    (``draw_chunk``), accumulating the phi sum in float32 on device —
    the [N_audio x T_frames] attribution matrix never round-trips to host
    during sampling (SURVEY.md section 7 "SHAP-matrix memory");
  * under `expected_gradients_sharded` the draw axis shards over the mesh
    "data" axis with `shard_map`; the final mean is a single `psum` over
    ICI. Draw keys are derived per *global* draw index, so the sharded
    result is bitwise-independent of the mesh size.

All stochasticity flows from an explicit PRNG key; gradients rematerialize
through the encoder when ``config.remat`` (set on the explained fn).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from asr_shap.core.config import ExplainerConfig


class Explanation(NamedTuple):
    """Result of explaining one input.

    values: [N_input, T_out] attribution matrix (reference layout,
            visualization.py:337-344)
    base_values: [T_out] mean model output over the background
    model_output: [T_out] f(x)
    """

    values: jnp.ndarray
    base_values: jnp.ndarray
    model_output: jnp.ndarray


def _jacobian(f: Callable, x: jnp.ndarray, output_chunk: int) -> jnp.ndarray:
    """Full Jacobian of f: R^N -> R^T at x, via one forward + batched VJP.
    Returns [T, N]."""
    y, vjp_fn = jax.vjp(f, x)
    t = y.shape[0]

    def row(ct):
        return vjp_fn(ct)[0]

    if output_chunk <= 0 or output_chunk >= t:
        return jax.vmap(row)(jnp.eye(t, dtype=y.dtype))

    # chunk the cotangent basis to bound backward-batch memory
    n_chunks = -(-t // output_chunk)
    t_pad = n_chunks * output_chunk
    eye = jnp.eye(t_pad, t, dtype=y.dtype).reshape(n_chunks, output_chunk, t)
    _, rows = lax.scan(lambda c, e: (c, jax.vmap(row)(e)), None, eye)
    return rows.reshape(t_pad, x.shape[0])[:t]


def _draw_phi(
    f: Callable,
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    output_chunk: int,
) -> jnp.ndarray:
    """Attribution contribution of a single (b, t) draw. Returns [T, N]."""
    kb, kt = jax.random.split(key)
    rind = jax.random.randint(kb, (), 0, background.shape[0])
    b = background[rind]
    t = jax.random.uniform(kt, (), jnp.float32)
    x_t = b + t * (x - b)
    jac = _jacobian(f, x_t, output_chunk)  # [T, N]
    return jac * (x - b)[None, :]


def _phi_sum(
    f: Callable,
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    draw_indices: jnp.ndarray,  # [n_steps, draw_chunk] global draw ids
    output_chunk: int,
    t_out: int,
) -> jnp.ndarray:
    """Sum of per-draw phi over all draws in ``draw_indices``. [T, N]."""

    def step(acc, idx_chunk):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx_chunk)
        phis = jax.vmap(lambda k: _draw_phi(f, x, background, k, output_chunk))(keys)
        return acc + jnp.sum(phis.astype(jnp.float32), axis=0), None

    acc0 = jnp.zeros((t_out, x.shape[0]), jnp.float32)
    acc, _ = lax.scan(step, acc0, draw_indices)
    return acc


def expected_gradients(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    config: ExplainerConfig = ExplainerConfig(),
) -> Explanation:
    """Explain f at x. f: [N] -> [T_out]; background: [B, N]; x: [N].

    The effective sample count is ``nsamples`` rounded up to a multiple of
    ``draw_chunk`` (more draws, never fewer).
    """
    t_out = jax.eval_shape(f, x).shape[0]
    chunk = max(1, config.draw_chunk)
    n_steps = -(-config.nsamples // chunk)
    total = n_steps * chunk
    draw_ids = jnp.arange(total, dtype=jnp.int32).reshape(n_steps, chunk)

    acc = _phi_sum(f, x, background, key, draw_ids, config.output_chunk, t_out)
    phi = (acc / total).T  # [N, T_out]

    fx = f(x)
    base = jnp.mean(jax.vmap(f)(background), axis=0)
    return Explanation(values=phi, base_values=base, model_output=fx)


def expected_gradients_sharded(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    config: ExplainerConfig = ExplainerConfig(),
) -> Explanation:
    """Same as :func:`expected_gradients` but with the draw axis sharded over
    ``mesh``'s first axis. x/background replicate (they are small relative to
    the compute); each device evaluates its slice of global draw indices and
    the mean reduces with one psum over ICI. Results are numerically
    independent of the device count (same per-draw keys; f32 accumulation)."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.shape[0]
    t_out = jax.eval_shape(f, x).shape[0]
    chunk = max(1, config.draw_chunk)
    per_dev_steps = -(-config.nsamples // (chunk * ndev))
    total = per_dev_steps * chunk * ndev

    def local(x_, bg_, key_):
        d = lax.axis_index(axis)
        start = d * per_dev_steps * chunk
        ids = (start + jnp.arange(per_dev_steps * chunk, dtype=jnp.int32)).reshape(
            per_dev_steps, chunk
        )
        acc = _phi_sum(f, x_, bg_, key_, ids, config.output_chunk, t_out)
        return lax.psum(acc, axis) / total

    acc = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(x, background, key)
    phi = acc.T

    fx = f(x)
    base = jnp.mean(jax.vmap(f)(background), axis=0)
    return Explanation(values=phi, base_values=base, model_output=fx)


class GradientExplainer:
    """Drop-in style API mirroring the reference's explainer usage
    (``shap.GradientExplainer(wrapped_model, background)`` then
    ``explainer.shap_values(x)``, shap_calculation.py:133-162) — but jitted,
    seeded, and optionally mesh-sharded."""

    def __init__(
        self,
        f: Callable[[jnp.ndarray], jnp.ndarray],
        background: jnp.ndarray,
        config: ExplainerConfig = ExplainerConfig(),
        mesh: Optional[Mesh] = None,
    ):
        self.f = f
        self.background = jnp.asarray(background)
        self.config = config
        self.mesh = mesh
        if mesh is None:
            self._explain = jax.jit(
                lambda x, key: expected_gradients(f, x, self.background, key, config)
            )
        else:
            self._explain = jax.jit(
                lambda x, key: expected_gradients_sharded(
                    f, x, self.background, key, mesh, config
                )
            )

    def explain(self, x, key) -> Explanation:
        return self._explain(jnp.asarray(x), key)

    def shap_values(self, x, key=None) -> np.ndarray:
        """[N] or [1, N] input -> [N, T_out] numpy attribution matrix
        (reference output contract)."""
        if key is None:
            key = jax.random.key(0)
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[0]
        return np.asarray(self.explain(x, key).values)

    @property
    def expected_value(self) -> np.ndarray:
        return np.asarray(jnp.mean(jax.vmap(self.f)(self.background), axis=0))
