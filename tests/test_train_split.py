"""Split-program train step (parallel/train.py _make_split_train_step):
the fused jit(value_and_grad) over the Pallas kernel forward did not
finish XLA-compiling in 45 min on TPU (ROADMAP round-2), so
make_train_step(forward="block") runs as TWO jitted programs — kernel
forward recording the hit tape, then replay-grad + optimizer update.
These tests prove the split step is EXACTLY the fused step: same loss
stream, same updated table, sharded or not, while or kernel forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from python_raytracer_tpu.parallel.mesh import make_mesh
from python_raytracer_tpu.parallel.train import make_train_step

from tests.test_grad import tiny  # noqa: F401  (module-scoped scene fixture)


def _run(step, cs, rays, target, iters=3):
    opt = optax.sgd(1e-3)
    arrays = cs.arrays
    opt_state = opt.init(arrays.material_table)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(iters):
        arrays, opt_state, loss = step(arrays, opt_state, rays, target, key)
        losses.append(float(loss))
    return arrays.material_table, losses


def test_split_step_equals_fused_step(tiny):  # noqa: F811
    """split=True with the while forward: the replay loss/grads reproduce
    the fused custom-vjp step bit-for-bit over a short optimization run."""
    st, cs, rays, target = tiny
    opt = optax.sgd(1e-3)
    fused = make_train_step(st, cs.spec, opt, mesh=None)
    split = make_train_step(st, cs.spec, opt, mesh=None, split=True)
    t_f, l_f = _run(fused, cs, rays, target)
    t_s, l_s = _run(split, cs, rays, target)
    np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_s))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_s))


def test_split_step_block_forward_matches_while(tiny):  # noqa: F811
    """forward="block" (Pallas kernel, interpret mode on CPU) defaults to
    the split step and produces the exact same training trajectory as the
    while forward — the kernel hit tape is bit-exact, so this must hold."""
    from python_raytracer_tpu.ops import blockmarch as B

    st, cs, rays, target = tiny
    opt = optax.sgd(1e-3)
    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        s_while = make_train_step(st, cs.spec, opt, mesh=None, split=True)
        s_block = make_train_step(
            st, cs.spec, opt, mesh=None, forward="block",
            block_kw=dict(supersteps=2, ep_cap=6, inner_cap=8))
        assert hasattr(s_block, "f_fwd")  # split by default for block
        t_w, l_w = _run(s_while, cs, rays, target)
        t_b, l_b = _run(s_block, cs, rays, target)
        np.testing.assert_array_equal(np.asarray(l_w), np.asarray(l_b))
        np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_b))
    finally:
        B.march_blockwise = orig


def test_split_step_sharded_matches_unsharded(tiny):  # noqa: F811
    """The split step's two programs carry the data sharding through the
    hit tape: sharded == unsharded table updates (psum inserted by jit)."""
    st, cs, rays, target = tiny
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    opt = optax.sgd(1e-3)
    s1 = make_train_step(st, cs.spec, opt, mesh=None, split=True)
    sn = make_train_step(st, cs.spec, opt, mesh=make_mesh(8), split=True)
    t1, l1 = _run(s1, cs, rays, target)
    tn, ln = _run(sn, cs, rays, target)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(ln), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(tn), rtol=1e-10)
