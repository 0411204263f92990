"""Expert-parallel MoE layer (parallel/ep.py) on the virtual mesh.

Covers the Switch routing math against a per-token numpy oracle and the
expert-parallel sharding (same program under GSPMD with expert-stacked
weights P('expert')) against the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from timetuning_tpu.parallel.ep import (
    DATA_AXIS,
    EXPERT_AXIS,
    MoEMlp,
    ep_param_specs,
    make_dp_ep_mesh,
    make_ep_moe_fn,
    validate_ep_geometry,
)


def _build(B=4, S=8, D=16, E=4, H=32, cf=2.0, seed=0):
    module = MoEMlp(n_experts=E, hidden_dim=H, capacity_factor=cf)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, S, D)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    return module, params, x


def _numpy_oracle(params, x, E, cf):
    """Per-token reference: route to argmax expert, run its MLP, scale by
    the gate; drop tokens past capacity in token order."""
    B, S, D = x.shape
    xt = np.asarray(x).reshape(-1, D)
    T = xt.shape[0]
    C = max(1, int(np.ceil(T * cf / E)))
    logits = xt @ np.asarray(params["router"]["kernel"])
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expert = p.argmax(-1)
    gate = p[np.arange(T), expert]
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    from scipy.stats import norm

    counts = np.zeros(E, int)
    out = np.zeros_like(xt)
    for t in range(T):
        e = expert[t]
        if counts[e] < C:
            counts[e] += 1
            h = xt[t] @ w1[e] + b1[e]
            h = h * norm.cdf(h)                  # exact GELU
            out[t] = gate[t] * (h @ w2[e] + b2[e])
    return out.reshape(B, S, D)


def test_moe_matches_per_token_oracle():
    module, params, x = _build()
    got = np.asarray(module.apply({"params": params}, x))
    want = _numpy_oracle(params, x, E=4, cf=2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_capacity_overflow_drops_to_zero():
    """With capacity_factor tiny, most tokens overflow and must produce
    exactly 0 (the residual-passthrough convention)."""
    module, params, x = _build(cf=0.05)          # C = 1 slot per expert
    got = np.asarray(module.apply({"params": params}, x)).reshape(-1, 16)
    want = _numpy_oracle(params, x, E=4, cf=0.05).reshape(-1, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # at most E tokens can be nonzero
    nonzero = (np.abs(got).sum(-1) > 1e-7).sum()
    assert nonzero <= 4


@pytest.mark.parametrize("dp,ep", [(1, 8), (2, 4), (4, 2)])
def test_ep_forward_matches_single_device(dp, ep):
    module, params, x = _build(E=8, B=8)
    want = np.asarray(module.apply({"params": params}, x))

    mesh = make_dp_ep_mesh(dp, ep)
    fwd = make_ep_moe_fn(module, mesh)(params)
    got = fwd(params, x)
    assert got.sharding == NamedSharding(mesh, P(DATA_AXIS))
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-5
    )


def test_ep_weights_sharded_over_expert_axis():
    module, params, x = _build(E=8, B=8)
    mesh = make_dp_ep_mesh(2, 4)
    specs = ep_param_specs(params)
    assert specs["w1"] == P(EXPERT_AXIS)
    assert specs["router"]["kernel"] == P()
    w1 = jax.device_put(params["w1"], NamedSharding(mesh, P(EXPERT_AXIS)))
    assert {s.data.shape[0] for s in w1.addressable_shards} == {2}  # 8/4


def test_ep_geometry_validation():
    with pytest.raises(ValueError, match="not divisible"):
        validate_ep_geometry(6, 4)


def test_ep_moe_fn_validates_geometry():
    """make_ep_moe_fn itself rejects n_experts % ep != 0 instead of letting
    GSPMD silently pad to an uneven expert sharding."""
    module, params, x = _build(E=6)
    mesh = make_dp_ep_mesh(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        make_ep_moe_fn(module, mesh)


def test_ep_param_specs_shape_guard():
    """A non-MoE leaf that reuses the w1/b1/w2/b2 names stays replicated
    when its leading axis is not the expert count."""
    module, params, x = _build(E=4)
    tree = dict(params)
    tree["other"] = {"w1": jnp.zeros((7, 3))}    # 7 != n_experts
    specs = ep_param_specs(tree, n_experts=4)
    assert specs["w1"] == P(EXPERT_AXIS)
    assert specs["other"]["w1"] == P()


def test_ep_gradients_flow():
    """Router (through the gate) and expert weights all receive gradient
    under the EP sharding."""
    module, params, x = _build(E=4, B=4)
    mesh = make_dp_ep_mesh(2, 2)

    def loss(p):
        return jnp.sum(module.apply({"params": p}, x) ** 2)

    g = jax.jit(
        jax.grad(loss),
        in_shardings=(jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), ep_param_specs(params)
        ),),
    )(params)
    assert float(jnp.abs(g["w1"]).sum()) > 0
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0
