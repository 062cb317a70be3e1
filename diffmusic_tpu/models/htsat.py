"""CLAP audio tower (HTSAT Swin transformer) in flax.

Behavioral parity with transformers ClapAudioModelWithProjection (Apache-2.0),
which the reference uses for prompt_type='clap' audio conditioning
(plpeline_audioldm2.py:469-481) and for the style-guidance gram matrix
(operator.py:253-271). Static input resolution means every window/shift/attn-mask
is precomputed in numpy at trace time — no data-dependent control flow.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    num_mel_bins: int = 64
    window_size: int = 8
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_attention_heads: Tuple[int, ...] = (4, 8, 16, 32)
    patch_embeds_hidden_size: int = 96
    mlp_ratio: float = 4.0
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    qkv_bias: bool = True

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def num_features(self) -> int:
        return int(self.patch_embeds_hidden_size * 2 ** (len(self.depths) - 1))


def tiny_clap_audio_config() -> ClapAudioConfig:
    return ClapAudioConfig(spec_size=64, patch_size=4, patch_stride=(4, 4),
                           num_mel_bins=16, window_size=4, depths=(1, 1),
                           num_attention_heads=(2, 2),
                           patch_embeds_hidden_size=16, projection_dim=16)


def _window_partition(x, ws):
    """(B, H, W, C) -> (B * H/ws * W/ws, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(h, w, ws, shift) -> np.ndarray:
    """Swin SW-MSA mask: (num_windows, ws*ws, ws*ws) additive (-100/0)."""
    img = np.zeros((h, w), np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    cfg: ClapAudioConfig
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        ws = self.window_size
        nw_b, n, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="query")(x)
        k = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="key")(x)
        v = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="value")(x)
        q = q.reshape(nw_b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(nw_b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(nw_b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)

        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros,
                           ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(n, n, self.num_heads)
        scores = scores + jnp.transpose(bias, (2, 0, 1))[None]

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            scores = scores.reshape(nw_b // nw, nw, self.num_heads, n, n)
            scores = scores + attn_mask[None, :, None]
            scores = scores.reshape(nw_b, self.num_heads, n, n)

        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw_b, n, self.dim)
        return nn.Dense(self.dim, name="output_dense")(out)


class SwinBlock(nn.Module):
    cfg: ClapAudioConfig
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    shift_size: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h, w = self.input_resolution
        ws, shift = cfg.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0  # no partitioning needed

        b, n, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before")(x)
        y = y.reshape(b, h, w, c)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
            attn_mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            attn_mask = None

        windows = _window_partition(y, ws)
        attn = WindowAttention(cfg, self.dim, self.num_heads, ws,
                               name="attention")(windows, attn_mask)
        y = _window_reverse(attn, ws, hp, wp)

        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :h, :w, :]
        y = y.reshape(b, n, c)

        x = shortcut + y
        z = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after")(x)
        z = nn.Dense(int(self.dim * cfg.mlp_ratio), name="intermediate_dense")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="output_dense")(z)
        return x + z


class PatchMerging(nn.Module):
    cfg: ClapAudioConfig
    input_resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        b, n, c = x.shape
        y = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        y = jnp.concatenate([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                             y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
        y = y.reshape(b, -1, 4 * c)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(y)


class ClapAudioModelWithProjection(nn.Module):
    cfg: ClapAudioConfig

    @nn.compact
    def __call__(self, input_features: jax.Array,
                 features: str = "pooled") -> jax.Array:
        """(B, 1, T, num_mel_bins) log-mel -> (B, projection_dim) audio embeds.

        Mirrors ClapAudioEncoder.forward: channel-wise BatchNorm over mel bins
        (inference: running stats), reshape_mel2img time folding, patch embed,
        Swin stages, LayerNorm, freq-grouped avgpool, 2-layer projection.

        features="frames" pools only over the frequency axis and projects each
        temporal frame, returning (B, T', projection_dim) — the patch-feature
        sequence the StyleGuidanceOperator's gram matrix needs (reference
        operator.py:253-271 calls an undefined clap_model.get_gram_matrix; this
        is the working TPU-native definition of that feature map).
        """
        cfg = self.cfg

        # BatchNorm2d over the mel-bin axis, inference mode (running stats)
        bn_scale = self.param("bn_scale", nn.initializers.ones,
                              (cfg.num_mel_bins,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros,
                             (cfg.num_mel_bins,))
        bn_mean = self.variable("batch_stats", "bn_mean",
                                lambda: jnp.zeros((cfg.num_mel_bins,))).value
        bn_var = self.variable("batch_stats", "bn_var",
                               lambda: jnp.ones((cfg.num_mel_bins,))).value
        x = input_features
        x = (x - bn_mean[None, None, None, :]) / jnp.sqrt(
            bn_var[None, None, None, :] + 1e-5)
        x = x * bn_scale[None, None, None, :] + bn_bias[None, None, None, :]

        # reshape_mel2img: fold time by freq_ratio into the freq axis
        b, c, t, f = x.shape
        fr = cfg.freq_ratio
        spec_w = cfg.spec_size * fr
        spec_h = cfg.spec_size // fr
        if t < spec_w:
            x = jax.image.resize(x, (b, c, spec_w, f), method="bicubic")
            t = spec_w
        if f < spec_h:
            x = jax.image.resize(x, (b, c, t, spec_h), method="bicubic")
            f = spec_h
        x = x.reshape(b, c * fr, t // fr, f)
        x = jnp.transpose(x, (0, 1, 3, 2))
        x = x.reshape(b, c, f * fr, t // fr)  # (B, 1, spec_size, spec_size)

        # patch embed: conv stride patch_stride, then flatten + LayerNorm
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        pad = (cfg.patch_size - cfg.patch_stride[0]) // 2
        x = nn.Conv(cfg.patch_embeds_hidden_size,
                    (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_stride, padding=pad,
                    name="patch_embed_proj")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, -1)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_embed_norm")(x)

        res = (gh, gw)
        for i, depth in enumerate(cfg.depths):
            dim = int(cfg.patch_embeds_hidden_size * 2 ** i)
            for d in range(depth):
                shift = 0 if d % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(cfg, dim, cfg.num_attention_heads[i], res, shift,
                              name=f"stage_{i}_block_{d}")(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(cfg, res, name=f"stage_{i}_downsample")(x)
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)

        # freq-grouped reshape + global average pool (ClapAudioEncoder tail)
        nC = x.shape[-1]
        frames_num = cfg.spec_size  # image height after reshape_mel2img
        freq_shape = frames_num // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride[0]
        temporal_shape = frames_num // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride[1]
        y = jnp.transpose(x, (0, 2, 1)).reshape(b, nC, freq_shape, temporal_shape)
        c_freq_bin = freq_shape // fr
        y = y.reshape(b, nC, freq_shape // c_freq_bin, c_freq_bin, temporal_shape)
        y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, nC, c_freq_bin, -1)
        if features == "frames":
            # per-frame features: pool only over frequency, keep time
            pooled = jnp.transpose(jnp.mean(y, axis=2), (0, 2, 1))  # (B, T', C)
        else:
            pooled = jnp.mean(y.reshape(b, nC, -1), axis=-1)

        # ClapProjectionLayer: linear -> relu -> linear (Dense maps the last
        # axis, so the same projection weights serve both feature modes)
        p = nn.Dense(cfg.projection_dim, name="projection_linear1")(pooled)
        p = nn.relu(p)
        p = nn.Dense(cfg.projection_dim, name="projection_linear2")(p)
        return p


def get_audio_features(model, params, input_features):
    emb = model.apply(params, input_features)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
