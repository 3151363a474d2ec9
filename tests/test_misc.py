"""Coverage for small utilities: glue ops, samplers, profiling, debugging,
MIP, enum mapping, MLP shapes, random_split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.batching import random_split
from notorch_tpu.data.samplers import ClassBalanceSampler, SeededSampler
from notorch_tpu.nn import glue
from notorch_tpu.nn.functional import MIP
from notorch_tpu.nn.mlp import MLP
from notorch_tpu.training.debugging import assert_finite, grad_norm
from notorch_tpu.utils import EnumMapping, collate_ndarrays


def test_glue_ops(rng):
    key = jax.random.PRNGKey(0)
    a = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))

    assert np.allclose(glue.Add().apply({}, a, b), np.asarray(a) + np.asarray(b))
    assert np.allclose(glue.Mul().apply({}, a, b), np.asarray(a) * np.asarray(b))
    cat = glue.Cat().apply({}, a, b)
    assert cat.shape == (3, 8)
    parts = glue.Split(sizes=(2, 2)).apply({}, a)
    assert len(parts) == 2 and parts[0].shape == (3, 2)
    mm = glue.MatMul().apply({}, a, b.T)
    assert mm.shape == (3, 3)
    ein = glue.Einsum(equation="ij,kj->ik").apply({}, a, b)
    np.testing.assert_allclose(np.asarray(ein), np.asarray(mm), rtol=1e-5)
    assert np.allclose(glue.Identity().apply({}, a), np.asarray(a))

    res = glue.Residual(module=glue.Identity())
    out = res.apply({}, a)
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(a), rtol=1e-6)


def test_mlp_unflatten():
    mlp = MLP(input_dim=8, output_size=(3, 4), hidden_dim=16, num_layers=1)
    x = jnp.ones((5, 8))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (5, 3, 4)

    # num_layers=0: single linear
    mlp0 = MLP(input_dim=8, output_size=2, num_layers=0)
    p0 = mlp0.init(jax.random.PRNGKey(0), x)
    assert mlp0.apply(p0, x).shape == (5, 2)
    assert len(jax.tree.leaves(p0)) == 2  # one kernel + one bias


def test_samplers():
    s = SeededSampler(10, seed=3)
    e1, e2 = list(iter(s)), list(iter(s))
    assert sorted(e1) == list(range(10))
    assert e1 != e2  # reshuffles across epochs

    with pytest.raises(ValueError):
        SeededSampler(5, seed=None)

    Y = np.array([[1], [0], [1], [0], [0], [0]])
    cb = ClassBalanceSampler(Y)
    order = list(iter(cb))
    assert len(order) == 4  # 2 pos x 2 interleaved
    actives = Y[order].ravel()
    assert list(actives[::2]) == [1, 1] and list(actives[1::2]) == [0, 0]


def test_random_split_disjoint():
    a, b, c = random_split(100, (0.8, 0.1, 0.1), seed=1)
    assert len(a) == 80 and len(b) == 10 and len(c) == 10
    assert not (set(a) & set(b)) and not (set(b) & set(c))
    # deterministic under seed
    a2, _, _ = random_split(100, (0.8, 0.1, 0.1), seed=1)
    np.testing.assert_array_equal(a, a2)


def test_debugging_helpers():
    ok = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    assert_finite(ok)
    bad = {"a": jnp.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite(bad, "grads")
    g = grad_norm({"w": jnp.asarray([3.0, 4.0])})
    assert abs(g - 5.0) < 1e-6


def test_mip():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[3.0, 4.0]])
    c = jnp.asarray([[1.0, 0.5]])
    np.testing.assert_allclose(np.asarray(MIP(a, b, c)), [1 * 3 * 1 + 2 * 4 * 0.5])


def test_enum_mapping_and_collate():
    class Color(EnumMapping):
        RED = 1
        DARK_BLUE = 2

    assert Color.get("red") is Color.RED
    assert Color.get("dark-blue") is Color.DARK_BLUE
    assert Color.get(Color.RED) is Color.RED
    with pytest.raises(KeyError, match="unknown Color"):
        Color.get("green")

    out = collate_ndarrays([np.zeros(3), np.ones(3)])
    assert out.shape == (2, 3) and out.dtype == np.float32


def test_step_timer():
    from notorch_tpu.training.profiling import StepTimer

    t = StepTimer(sync_every=2)
    t.start()
    x = jnp.ones(4)
    for _ in range(6):
        t.step(x)
    sps = t.steps_per_sec()
    assert np.isfinite(sps) and sps > 0
    summary = t.summary(edges_per_step=100, depth=3)
    assert summary["edges_per_sec"] == pytest.approx(sps * 300)


def test_composed_network_error_messages():
    """Wiring errors name the missing key / arity mismatch precisely."""
    import pytest

    from notorch_tpu.model.composed import ComposedNetwork, get_key, make_network
    from notorch_tpu.nn.glue import Identity, Split

    with pytest.raises(KeyError, match="'nope' not in batch"):
        get_key({"a": 1}, "nope")

    net = make_network(
        {"m": {"module": Identity(), "in_keys": ["inputs.x"], "out_keys": ["y"]}}
    )
    out = net.apply({}, {"inputs.x": jnp.ones(3)})
    assert "m.y" in out

    # arity mismatch: Split returns 2 values for 1 out_key
    net2 = make_network(
        {
            "s": {
                "module": Split(sizes=(1, 2)),
                "in_keys": ["inputs.x"],
                "out_keys": ["only_one"],
            }
        }
    )
    with pytest.raises(ValueError, match="returned 2 values for 1 out_keys"):
        net2.apply({}, {"inputs.x": jnp.ones(3)})

    # kwargs wiring
    net3 = make_network(
        {"m": {"module": Identity(), "in_keys": {"x": "inputs.x"}, "out_keys": ["y"]}}
    )
    out3 = net3.apply({}, {"inputs.x": jnp.ones(2)})
    assert out3["m.y"].shape == (2,)


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache points jax at a persistent dir (cross-process
    compile reuse for serving cold starts) and honors the off switch."""
    import jax
    import jax.numpy as jnp

    from notorch_tpu.utils import enable_compilation_cache

    monkeypatch.setenv("NOTORCH_TPU_COMPILATION_CACHE", "off")
    assert enable_compilation_cache() is None

    used = enable_compilation_cache(str(tmp_path / "xla"))
    assert used == str(tmp_path / "xla")

    @jax.jit
    def f(x):
        return jnp.sin(x) @ jnp.cos(x).T

    f(jnp.ones((64, 64))).block_until_ready()
    # CPU backends also persist entries once the dir + thresholds are set
    entries = list((tmp_path / "xla").iterdir())
    assert entries, "no persistent cache entries written"
