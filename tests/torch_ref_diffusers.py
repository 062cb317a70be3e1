"""Minimal torch re-implementation of the diffusers layer grammar, for parity
testing the flax UNet/VAE (VERDICT r1 item 3: diffusers itself is not in the
image, and UNet/VAE are the dominant-compute modules — a wrong GroupNorm eps or
attention scale would otherwise pass every shape/grad test).

Each module follows the published diffusers semantics (UNet2DConditionModel /
AutoencoderKL, as loaded by the reference at plpeline_audioldm2.py:21-46 and
pipeline_musicldm.py:30-40) and names its submodules exactly as the diffusers
state_dict grammar in models/checkpoint.py expects, so state_dicts convert
through the production `convert_unet` / `convert_vae` paths.

Test-support module — torch only, not imported by the package.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- layers
def timestep_embedding(timesteps, dim, flip_sin_to_cos=True,
                       downscale_freq_shift=0.0, max_period=10000.0):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    sin, cos = torch.sin(args), torch.cos(args)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    """diffusers resnet.ResnetBlock2D: GN(eps=1e-5)/SiLU/3x3 conv x2, time
    shift after conv1, 1x1 conv_shortcut when channels change."""

    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """diffusers attention_processor.Attention: no-bias q/k/v, to_out.0 with
    bias, softmax(QK^T / sqrt(head_dim)) in fp32."""

    def __init__(self, dim, heads, head_dim, context_dim=None):
        super().__init__()
        inner = heads * head_dim
        context_dim = context_dim or dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, context=None, mask=None):
        context = x if context is None else context
        b, tq, _ = x.shape
        tk = context.shape[1]
        q = self.to_q(x).view(b, tq, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(context).view(b, tk, self.heads,
                                    self.head_dim).transpose(1, 2)
        v = self.to_v(context).view(b, tk, self.heads,
                                    self.head_dim).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) / math.sqrt(self.head_dim)
        if mask is not None:
            logits = logits.masked_fill(~mask[:, None, None, :], -1e9)
        attn = logits.softmax(dim=-1) @ v
        attn = attn.transpose(1, 2).reshape(b, tq, -1)
        return self.to_out[0](attn)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    """ff.net.0 = GEGLU, ff.net.1 = dropout (identity), ff.net.2 = Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attn [+ cross streams] + GEGLU FF. Dual-stream naming
    (attn2 / attn2_1) follows the AudioLDM2 UNet variant the converter reads
    (models/checkpoint.py:179-187)."""

    def __init__(self, dim, heads, head_dim, cross_dims=()):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, head_dim)
        self.cross_dims = tuple(cross_dims)
        for i, cd in enumerate(self.cross_dims):
            sfx = "" if i == 0 else f"_{i}"
            setattr(self, f"norm2{sfx}", nn.LayerNorm(dim))
            setattr(self, f"attn2{sfx}", Attention(dim, heads, head_dim, cd))
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, contexts=(), masks=()):
        x = x + self.attn1(self.norm1(x))
        for i, _ in enumerate(self.cross_dims):
            sfx = "" if i == 0 else f"_{i}"
            m = masks[i] if i < len(masks) else None
            x = x + getattr(self, f"attn2{sfx}")(
                getattr(self, f"norm2{sfx}")(x), contexts[i], m)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """GN(eps=1e-6) -> linear proj_in -> blocks over (H*W) tokens -> linear
    proj_out + residual (diffusers use_linear_projection variant)."""

    def __init__(self, ch, heads, head_dim, depth=1, cross_dims=(), groups=32):
        super().__init__()
        inner = heads * head_dim
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, head_dim, cross_dims)
             for _ in range(depth)])
        self.proj_out = nn.Linear(inner, ch)

    def forward(self, x, contexts=(), masks=()):
        b, c, h, w = x.shape
        residual = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, contexts, masks)
        y = self.proj_out(y)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return y + residual


class Downsample2D(nn.Module):
    """Asymmetric (0,1,0,1) pad then stride-2 VALID conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x, out_hw=None):
        if out_hw is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=tuple(out_hw), mode="nearest")
        return self.conv(x)


# ----------------------------------------------------------------------- UNet
class TorchUNet(nn.Module):
    """Full UNet2DConditionModel mirror for the two config families the
    reference drives (MusicLDM class-embedding concat; AudioLDM2 dual
    cross-attention). Takes the package's UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb = cfg.time_embed_dim
        self.time_embedding = TimestepEmbedding(ch0, temb)
        if cfg.class_embed_type == "simple_projection":
            self.class_embedding = nn.Linear(
                cfg.projection_class_embeddings_input_dim, temb)
        cond_dim = temb * 2 if cfg.class_embeddings_concat and \
            cfg.class_embed_type else temb
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)

        def make_attn(ch):
            return Transformer2DModel(
                ch, ch // cfg.attention_head_dim, cfg.attention_head_dim,
                depth=1, cross_dims=cfg.cross_attention_dims,
                groups=cfg.norm_num_groups)

        self.down_blocks = nn.ModuleList()
        ch = ch0
        skip_chs = [ch0]
        for i, out_ch in enumerate(cfg.block_out_channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock2D(
                    ch, out_ch, cond_dim, cfg.norm_num_groups))
                if cfg.has_attention[i]:
                    blk.attentions.append(make_attn(out_ch))
                ch = out_ch
                skip_chs.append(ch)
            if i != len(cfg.block_out_channels) - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
                skip_chs.append(out_ch)
            self.down_blocks.append(blk)

        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, cond_dim, cfg.norm_num_groups),
             ResnetBlock2D(ch, ch, cond_dim, cfg.norm_num_groups)])
        mid.attentions = nn.ModuleList([make_attn(ch)])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        for i, out_ch in enumerate(reversed(cfg.block_out_channels)):
            rev_i = len(cfg.block_out_channels) - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip_ch = skip_chs.pop()
                blk.resnets.append(ResnetBlock2D(
                    ch + skip_ch, out_ch, cond_dim, cfg.norm_num_groups))
                if cfg.has_attention[rev_i]:
                    blk.attentions.append(make_attn(out_ch))
                ch = out_ch
            if i != len(cfg.block_out_channels) - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states=None,
                encoder_hidden_states_1=None, encoder_attention_mask=None,
                encoder_attention_mask_1=None, class_labels=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        emb = self.time_embedding(
            timestep_embedding(timesteps, cfg.block_out_channels[0]))
        if cfg.class_embed_type == "simple_projection" and \
                class_labels is not None:
            cemb = self.class_embedding(class_labels)
            emb = torch.cat([emb, cemb], dim=-1) \
                if cfg.class_embeddings_concat else emb + cemb

        contexts, masks = [], (encoder_attention_mask,
                               encoder_attention_mask_1)
        if len(cfg.cross_attention_dims) >= 1:
            contexts.append(encoder_hidden_states)
        if len(cfg.cross_attention_dims) >= 2:
            contexts.append(encoder_hidden_states_1)

        x = self.conv_in(sample)
        skips = [x]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, emb)
                if blk.attentions:
                    x = blk.attentions[j](x, contexts, masks)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb)
        x = self.mid_block.attentions[0](x, contexts, masks)
        x = self.mid_block.resnets[1](x, emb)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, emb)
                if blk.attentions:
                    x = blk.attentions[j](x, contexts, masks)
            if hasattr(blk, "upsamplers"):
                out_hw = skips[-1].shape[2:] if skips else None
                x = blk.upsamplers[0](x, out_hw)

        assert not skips
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ------------------------------------------------------------------------ VAE
class VAEAttention(nn.Module):
    """diffusers AutoencoderKL mid attention: GroupNorm inside the Attention
    module (group_norm.* keys), single head over channels, residual add."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.attn = Attention(ch, 1, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.attn(y)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)

    def state_dict_flat(self, prefix):
        sd = {f"{prefix}.group_norm.weight": self.group_norm.weight,
              f"{prefix}.group_norm.bias": self.group_norm.bias}
        for n, p in self.attn.named_parameters():
            sd[f"{prefix}.{n}"] = p
        return sd


class TorchVAE(nn.Module):
    """AutoencoderKL mirror (encoder + decoder + quant convs). Takes the
    package's VAEConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        ch = chs[0]
        for i, out_ch in enumerate(chs):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock2D(ch, out_ch, None, g))
                ch = out_ch
            if i != len(chs) - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, g), ResnetBlock2D(ch, ch, None, g)])
        enc.mid_block.attentions = nn.ModuleList([VAEAttention(ch, g)])
        enc.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)

        dec = nn.Module()
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)
        dec.conv_in = nn.Conv2d(cfg.latent_channels, chs[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        ch = chs[-1]
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, g), ResnetBlock2D(ch, ch, None, g)])
        dec.mid_block.attentions = nn.ModuleList([VAEAttention(ch, g)])
        dec.up_blocks = nn.ModuleList()
        for i, out_ch in enumerate(reversed(chs)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(ResnetBlock2D(ch, out_ch, None, g))
                ch = out_ch
            if i != len(chs) - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)
        self.decoder = dec

    def encode(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = e.mid_block.resnets[0](x)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        mean, _ = self.quant_conv(x).chunk(2, dim=1)
        return mean

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block.resnets[0](x)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x)
        for blk in d.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


def flat_state_dict(module) -> dict:
    """torch state_dict as {str: np.float32 array} — what the converters eat.
    VAEAttention's inner `attn.` level is flattened away to match the
    diffusers grammar (mid_block.attentions.0.to_q...)."""
    sd = {}
    for k, v in module.state_dict().items():
        k = k.replace(".attn.to_", ".to_")
        sd[k] = v.detach().numpy().astype(np.float32)
    return sd
