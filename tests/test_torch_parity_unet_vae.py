"""Block- and module-level numerical parity of the flax UNet/VAE against a
hand-written torch implementation of the diffusers layer grammar
(tests/torch_ref_diffusers.py), converted through the PRODUCTION
convert_unet/convert_vae paths (models/checkpoint.py).

This is the diffusers-free substitute for parity against the real
UNet2DConditionModel / AutoencoderKL the reference loads
(plpeline_audioldm2.py:21-46): same layer semantics, same state_dict grammar,
fp32, <=1e-4 per block and <=2e-3 full-module (VERDICT r1 item 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffmusic_tpu.models import checkpoint as ckpt
from diffmusic_tpu.models.configs import (UNetConfig, VAEConfig,
                                          tiny_unet_config, tiny_vae_config)
from diffmusic_tpu.models.layers import (Downsample2D, ResnetBlock2D,
                                         Transformer2DModel, Upsample2D)
from diffmusic_tpu.models.unet import UNet2DConditionModel
from diffmusic_tpu.models.vae import AutoencoderKL, VAEAttentionBlock

import torch_ref_diffusers as tr

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


def _seed_all(seed=0):
    torch.manual_seed(seed)
    return np.random.default_rng(seed)


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _close(flax_nhwc, torch_nchw, atol):
    got = np.transpose(np.asarray(flax_nhwc), (0, 3, 1, 2))
    want = torch_nchw.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=atol, atol=atol)


class TestBlockParity:
    def test_resnet_block(self):
        rng = _seed_all()
        tm = tr.ResnetBlock2D(16, 24, temb_ch=32, groups=8).eval()
        x = rng.standard_normal((2, 16, 10, 12)).astype(np.float32)
        temb = rng.standard_normal((2, 32)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(temb))
        sd = {f"x.{k}": v for k, v in tr.flat_state_dict(tm).items()}
        params = ckpt._resnet(sd, "x")
        fm = ResnetBlock2D(24, groups=8)
        got = fm.apply({"params": params}, _nhwc(x), jnp.asarray(temb))
        _close(got, want, 1e-4)

    @pytest.mark.parametrize("cross_dims", [(), (20,), (20, 12)])
    def test_transformer2d(self, cross_dims):
        rng = _seed_all()
        heads, hd, ch = 2, 8, 16
        tm = tr.Transformer2DModel(ch, heads, hd, depth=2,
                                   cross_dims=cross_dims, groups=8).eval()
        x = rng.standard_normal((2, ch, 6, 7)).astype(np.float32)
        ctxs, masks = [], []
        for i, cd in enumerate(cross_dims):
            ctxs.append(rng.standard_normal((2, 5 + i, cd)).astype(np.float32))
            m = np.ones((2, 5 + i), bool)
            m[:, -2:] = False
            masks.append(m)
        t_ctx = [torch.from_numpy(c) for c in ctxs]
        t_msk = [torch.from_numpy(m) for m in masks]
        with torch.no_grad():
            want = tm(torch.from_numpy(x), t_ctx, t_msk)
        sd = {f"x.{k}": v for k, v in tr.flat_state_dict(tm).items()}
        params = ckpt._transformer2d(sd, "x", 2, len(cross_dims))
        fm = Transformer2DModel(heads=heads, head_dim=hd, depth=2,
                                cross_dims=cross_dims, groups=8)
        got = fm.apply({"params": params}, _nhwc(x),
                       [jnp.asarray(c) for c in ctxs],
                       [jnp.asarray(m) for m in masks])
        _close(got, want, 1e-4)

    def test_downsample(self):
        rng = _seed_all()
        tm = tr.Downsample2D(12).eval()
        # odd spatial size exercises the asymmetric (0,1,0,1) pad
        x = rng.standard_normal((1, 12, 15, 13)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x))
        sd = tr.flat_state_dict(tm)
        params = {"conv": {"kernel": ckpt.convert.conv2d(sd["conv.weight"]),
                           "bias": sd["conv.bias"]}}
        got = Downsample2D(12).apply({"params": params}, _nhwc(x))
        _close(got, want, 1e-4)

    @pytest.mark.parametrize("out_hw", [None, (15, 13), (11, 9)])
    def test_upsample(self, out_hw):
        # odd targets exercise every branch of _nearest_upsample vs torch's
        # floor(i*h/target) nearest convention
        rng = _seed_all()
        tm = tr.Upsample2D(8).eval()
        x = rng.standard_normal((1, 8, 7, 6)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), out_hw)
        sd = tr.flat_state_dict(tm)
        params = {"conv": {"kernel": ckpt.convert.conv2d(sd["conv.weight"]),
                           "bias": sd["conv.bias"]}}
        got = Upsample2D(8).apply({"params": params}, _nhwc(x), out_hw)
        _close(got, want, 1e-4)

    def test_vae_attention(self):
        rng = _seed_all()
        tm = tr.VAEAttention(16, 8).eval()
        x = rng.standard_normal((2, 16, 5, 6)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x))
        sd = tm.state_dict_flat("a")
        sd = {k: v.detach().numpy().astype(np.float32) for k, v in sd.items()}
        params = {
            "group_norm": {"scale": sd["a.group_norm.weight"],
                           "bias": sd["a.group_norm.bias"]},
            "attention": ckpt._attention(sd, "a"),
        }
        got = VAEAttentionBlock(groups=8).apply({"params": params}, _nhwc(x))
        _close(got, want, 1e-4)


class TestModuleParity:
    def _run_unet(self, cfg: UNetConfig, h, w, cross_shapes=(),
                  class_dim=None):
        rng = _seed_all()
        tm = tr.TorchUNet(cfg).eval()
        params = ckpt.convert_unet(tr.flat_state_dict(tm), cfg)
        fm = UNet2DConditionModel(cfg)

        x = rng.standard_normal((2, cfg.in_channels, h, w)).astype(np.float32)
        t = np.array([3, 977], np.int64)
        kw_t, kw_f = {}, {}
        if class_dim:
            cl = rng.standard_normal((2, class_dim)).astype(np.float32)
            kw_t["class_labels"] = torch.from_numpy(cl)
            kw_f["class_labels"] = jnp.asarray(cl)
        for i, (L, d) in enumerate(cross_shapes):
            ctx = rng.standard_normal((2, L, d)).astype(np.float32)
            m = np.ones((2, L), bool)
            m[:, -2:] = False
            sfx = "" if i == 0 else "_1"
            kw_t[f"encoder_hidden_states{sfx}"] = torch.from_numpy(ctx)
            kw_t[f"encoder_attention_mask{sfx}"] = torch.from_numpy(m)
            kw_f[f"encoder_hidden_states{sfx}"] = jnp.asarray(ctx)
            kw_f[f"encoder_attention_mask{sfx}"] = jnp.asarray(m)

        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(t), **kw_t)
        got = fm.apply(params, jnp.asarray(x), jnp.asarray(t), **kw_f)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-3, atol=2e-3)

    def test_unet_musicldm_family(self):
        # class-embedding concat, self-attention only, odd H for the
        # ceil-divide downsample -> out_hw upsample path
        self._run_unet(tiny_unet_config(), h=15, w=16, class_dim=32)

    def test_unet_audioldm2_family(self):
        # dual cross-attention streams (GPT-2 + T5 shapes in miniature)
        cfg = tiny_unet_config(cross_attention_dims=(24, 16))
        self._run_unet(cfg, h=16, w=16, cross_shapes=((7, 24), (5, 16)))

    def test_vae_encode_decode(self):
        rng = _seed_all()
        cfg = tiny_vae_config()
        tm = tr.TorchVAE(cfg).eval()
        params = ckpt.convert_vae(tr.flat_state_dict(tm), cfg)
        fm = AutoencoderKL(cfg)

        x = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
        with torch.no_grad():
            want_z = tm.encode(torch.from_numpy(x))
            want_x = tm.decode(want_z)
        got_z = fm.apply(params, jnp.asarray(x), method=fm.encode)
        np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(),
                                   rtol=1e-3, atol=1e-3)
        got_x = fm.apply(params, jnp.asarray(got_z), method=fm.decode)
        np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                                   rtol=2e-3, atol=2e-3)
