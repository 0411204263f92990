"""Fused Sinkhorn-Knopp kernel: all iterations in VMEM. **Superseded.**

Historical: this kernel beat the r1 *materializing* XLA loop (~8× at the
then-measured shape) by keeping the [K, B] transport matrix VMEM-resident.
Round 3 replaced the loop everywhere with the diagonal-scaling matvec form
(ops/sinkhorn.py): Q_t ≡ diag(a)·Q₀·diag(b) needs only two matvec *reads*
of the unchanged Q₀ per iteration, no per-iteration writes, works across
the data-parallel psum — and measures faster than this kernel on v5e
(10 iters, single chip: [200, 25088] 0.83 ms vs 1.57 here; [200, 6272]
1.19 vs 1.27). Retired from dispatch; kept (with tests) as the reference
VMEM-resident implementation. Measured non-win — don't re-dispatch without
beating the matvec numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from timetuning_tpu.ops.util import pad_to_multiple
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_EPS = 1e-12


def _iterate_inplace(o_ref, n_iters: int, r: float, c):
    """Run the Sinkhorn iterations mutating ``o_ref`` (aliased to the input)
    — no loop-carried copy, so VMEM holds exactly one [Kp, Bp] matrix plus
    one elementwise temp."""
    def body(_, carry):
        Q = o_ref[:]
        u = jnp.sum(Q, axis=1, keepdims=True)          # [Kp, 1]
        o_ref[:] = Q * (r / (u + _EPS))
        Q = o_ref[:]
        col = jnp.sum(Q, axis=0, keepdims=True)        # [1, Bp]
        o_ref[:] = Q * (c / (col + _EPS))
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)
    Q = o_ref[:]
    o_ref[:] = Q / (jnp.sum(Q, axis=0, keepdims=True) + _EPS)


def _kernel(q_ref, o_ref, *, n_iters: int, n_rows: int, n_cols: int):
    """q_ref aliased to o_ref: [Kp, Bp] f32. Padding rows/cols are zero and
    stay zero; marginals use the true K and B."""
    Q = q_ref[:]
    o_ref[:] = Q / (jnp.sum(Q) + _EPS)
    _iterate_inplace(o_ref, n_iters, 1.0 / n_rows, 1.0 / n_cols)


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def sinkhorn_pallas(
    Q: jax.Array, n_iters: int = 3, valid: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Doubly-stochastic normalization, semantics of ops.sinkhorn.sinkhorn
    with axis_name=None / world_size=1. Q: [K, B] non-negative → [B, K]."""
    Q = Q.astype(jnp.float32)
    K, B = Q.shape
    if valid is not None:
        Q = Q * valid[None, :].astype(jnp.float32)
        n_cols_arr = jnp.sum(valid.astype(jnp.float32))
    else:
        n_cols_arr = None
    Kp = pad_to_multiple(K, 8)
    Bp = pad_to_multiple(B, 128)
    Qp = jnp.pad(Q, ((0, Kp - K), (0, Bp - B)))

    if n_cols_arr is None:
        kern = functools.partial(
            _kernel, n_iters=n_iters, n_rows=K, n_cols=B
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Kp, Bp), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(Qp)
    else:
        # dynamic column-marginal: pass n_valid as an SMEM scalar
        def kern_dyn(nv_ref, q_ref, o_ref):
            Qk = q_ref[:]
            o_ref[:] = Qk / (jnp.sum(Qk) + _EPS)
            _iterate_inplace(o_ref, n_iters, 1.0 / K,
                             1.0 / (nv_ref[0, 0] + _EPS))

        out = pl.pallas_call(
            kern_dyn,
            out_shape=jax.ShapeDtypeStruct((Kp, Bp), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={1: 0},
            interpret=interpret,
        )(n_cols_arr.reshape(1, 1), Qp)
    return out[:K, :B].T


def sinkhorn_pallas_available(K: int, B: int) -> bool:
    """VMEM bound: the padded [Kp, Bp] f32 matrix (plus one temp) must fit."""
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    Kp = pad_to_multiple(K, 8)
    Bp = pad_to_multiple(B, 128)
    return Kp * Bp * 4 * 2 <= 12 * 1024 * 1024
