"""Fused transformer-block kernel vs the unfused module composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.transformer_kernel as tk
from diffmusic_tpu.models.layers import BasicTransformerBlock

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    tk._INTERPRET = True
    yield
    tk._INTERPRET = False


def _unfused_composition(x, params, heads, head_dim):
    """Original LN->attn->res->LN->GEGLU composition from the same params."""
    import flax.linen as nn
    p = params["params"]

    def ln(h, q):
        return nn.LayerNorm(name="x").apply(
            {"params": {"scale": p[q]["scale"], "bias": p[q]["bias"]}}, h)

    h = ln(x, "norm1")
    a = p["attn1"]
    b, t, c = x.shape
    q = (h @ a["to_q"]["kernel"]).reshape(b, t, heads, head_dim)
    k = (h @ a["to_k"]["kernel"]).reshape(b, t, heads, head_dim)
    v = (h @ a["to_v"]["kernel"]).reshape(b, t, heads, head_dim)
    o = jax.nn.dot_product_attention(q, k, v).reshape(b, t, c)
    x = x + o @ a["to_out"]["kernel"] + a["to_out"]["bias"]
    h = ln(x, "norm3")
    f = p["ff"]
    hidden = h @ f["proj_in"]["kernel"] + f["proj_in"]["bias"]
    hh, gate = jnp.split(hidden, 2, axis=-1)
    hh = hh * jax.nn.gelu(gate, approximate=False)
    return x + hh @ f["proj_out"]["kernel"] + f["proj_out"]["bias"]


class TestFusedTransformerBlock:
    @pytest.mark.parametrize("t", [600, 1000])  # >= 512 routes to fused
    def test_matches_unfused(self, rng, t):
        heads, head_dim = 4, 8
        c = heads * head_dim
        x = jnp.asarray(rng.standard_normal((2, t, c)) * 0.3, jnp.float32)
        blk = BasicTransformerBlock(heads, head_dim)
        params = blk.init(jax.random.key(0), x)
        got = blk.apply(params, x)  # fused path (t >= 512, interpret)
        want = _unfused_composition(x, params, heads, head_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16_softmax_close_to_fp32(self, rng):
        """The production bf16-exp softmax must stay within bf16-level error
        of the fp32 reference composition."""
        heads, head_dim = 4, 8
        c = heads * head_dim
        x32 = jnp.asarray(rng.standard_normal((1, 600, c)) * 0.3, jnp.float32)
        blk = BasicTransformerBlock(heads, head_dim)
        params = blk.init(jax.random.key(0), x32)
        want = _unfused_composition(x32, params, heads, head_dim)
        got = blk.apply(params, x32.astype(jnp.bfloat16))  # fused, bf16-exp
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), rtol=5e-2, atol=5e-2)

    @pytest.mark.parametrize("amp", [0.3, 5.0])  # 5.0: large logits/norms,
    def test_bounded_softmax_matches_reference(self, rng, amp, monkeypatch):
        """DIFFMUSIC_TPU_BSOFT=1 replaces the per-head row-max pass with the
        Cauchy-Schwarz logit bound; softmax is shift-invariant so the result
        must match the reference composition at kernel tolerance, including
        when the bound is slack (large-amplitude inputs)."""
        monkeypatch.setenv("DIFFMUSIC_TPU_BSOFT", "1")
        heads, head_dim = 4, 8
        c = heads * head_dim
        x = jnp.asarray(rng.standard_normal((2, 600, c)) * amp, jnp.float32)
        blk = BasicTransformerBlock(heads, head_dim)
        params = blk.init(jax.random.key(0), x)
        got = blk.apply(params, x)  # fused path, bsoft on
        want = _unfused_composition(x, params, heads, head_dim)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3 * amp)

    def test_dual_cross_fused_matches_unfused(self, rng, monkeypatch):
        """The AudioLDM2 dual-cross-stream fused block (self-attn + two
        cross streams + GEGLU FF in one kernel) must match the unfused
        composition, including a partial attention mask on one stream."""
        heads, head_dim = 4, 8
        c = heads * head_dim
        x = jnp.asarray(rng.standard_normal((2, 600, c)) * 0.3, jnp.float32)
        ctx0 = jnp.asarray(rng.standard_normal((2, 8, 24)) * 0.3, jnp.float32)
        ctx1 = jnp.asarray(rng.standard_normal((2, 12, 40)) * 0.3,
                           jnp.float32)
        mask1 = jnp.asarray([[1] * 9 + [0] * 3, [1] * 12], bool)
        blk = BasicTransformerBlock(heads, head_dim, cross_dims=(24, 40))
        params = blk.init(jax.random.key(0), x, (ctx0, ctx1), (None, mask1))
        monkeypatch.setenv("DIFFMUSIC_TPU_FUSED_CROSS", "1")
        got = blk.apply(params, x, (ctx0, ctx1), (None, mask1))  # fused
        monkeypatch.setenv("DIFFMUSIC_TPU_FUSED_CROSS", "0")
        want = blk.apply(params, x, (ctx0, ctx1), (None, mask1))  # unfused
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4)

    def test_dual_cross_gradients(self, rng, monkeypatch):
        """optim_prompt differentiates the UNet w.r.t. the prompt streams:
        the fused block's custom VJP must propagate to x AND both contexts."""
        heads, head_dim = 2, 8
        c = heads * head_dim
        x = jnp.asarray(rng.standard_normal((1, 600, c)) * 0.3, jnp.float32)
        ctx0 = jnp.asarray(rng.standard_normal((1, 8, 24)) * 0.3, jnp.float32)
        ctx1 = jnp.asarray(rng.standard_normal((1, 12, 40)) * 0.3,
                           jnp.float32)
        blk = BasicTransformerBlock(heads, head_dim, cross_dims=(24, 40))
        params = blk.init(jax.random.key(0), x, (ctx0, ctx1), ())

        def loss(x_, c0, c1):
            return jnp.sum(blk.apply(params, x_, (c0, c1), ()) ** 2)

        monkeypatch.setenv("DIFFMUSIC_TPU_FUSED_CROSS", "1")
        g = jax.grad(loss, argnums=(0, 1, 2))(x, ctx0, ctx1)
        tk._INTERPRET = False  # unfused reference path on CPU
        monkeypatch.setenv("DIFFMUSIC_TPU_FUSED_CROSS", "0")
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, ctx0, ctx1)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-3)

    def test_param_tree_matches_unfused_variant(self, rng):
        """Both routing choices must declare the identical param tree, so a
        tree initialized short (unfused) works long (fused) and vice versa."""
        heads, head_dim = 4, 8
        c = heads * head_dim
        blk = BasicTransformerBlock(heads, head_dim)
        short = blk.init(jax.random.key(0), jnp.zeros((1, 100, c)))
        long = blk.init(jax.random.key(0), jnp.zeros((1, 600, c)))

        def shapes(tree):
            return {jax.tree_util.keystr(k): np.asarray(v).shape
                    for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert shapes(short) == shapes(long)
        # cross-initialized apply works
        y = blk.apply(short, jnp.asarray(rng.standard_normal((1, 600, c)),
                                         jnp.float32))
        assert np.isfinite(np.asarray(y)).all()

        # same contract for the dual-cross variant (checkpoints loaded under
        # either routing must apply under the other)
        cblk = BasicTransformerBlock(heads, head_dim, cross_dims=(24, 40))
        ctxs = (jnp.zeros((1, 8, 24)), jnp.zeros((1, 12, 40)))
        cshort = cblk.init(jax.random.key(0), jnp.zeros((1, 100, c)), ctxs)
        clong = cblk.init(jax.random.key(0), jnp.zeros((1, 600, c)), ctxs)
        assert shapes(cshort) == shapes(clong)

    def test_gradient_through_fused(self, rng):
        heads, head_dim = 2, 8
        c = heads * head_dim
        x = jnp.asarray(rng.standard_normal((1, 600, c)) * 0.3, jnp.float32)
        blk = BasicTransformerBlock(heads, head_dim)
        params = blk.init(jax.random.key(0), x)
        g = jax.grad(lambda x_: jnp.sum(blk.apply(params, x_) ** 2))(x)
        tk._INTERPRET = False  # unfused reference path on CPU
        g_ref = jax.grad(lambda x_: jnp.sum(
            _unfused_composition(x_, params, heads, head_dim) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-3)
