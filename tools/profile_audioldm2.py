"""Device-trace profile of the AudioLDM2 guided DPS step (VERDICT r4 item 3).

AudioLDM2 is the reference CLI's DEFAULT model (reference run.py:84) and its
dual cross-attention UNet (GPT-2 stream + T5 stream,
plpeline_audioldm2.py:1147-1154) dominates its per-step cost; this captures an
xprof trace of the exact program tools/check_audioldm2_step.py benches and
prints the top XLA ops by device self-time, plus a per-component rollup
(attention kinds / convs / norms / copies), so the 52.8 ms/step headline gets
the same op-level attribution MusicLDM got in rounds 2-4.

Usage: python tools/profile_audioldm2.py [steps] [topk] [top|copies]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")


def build_sample(steps: int):
    """Identical program construction to check_audioldm2_step.main (kept in
    sync so the persistent-cache entry is shared)."""
    from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
    from diffmusic_tpu.models.configs import (HiFiGANConfig, UNetConfig,
                                              VAEConfig)
    from diffmusic_tpu.models.hifigan import SpeechT5HifiGan
    from diffmusic_tpu.models.unet import UNet2DConditionModel
    from diffmusic_tpu.models.vae import AutoencoderKL
    from diffmusic_tpu.samplers import (DiffusionSchedule, SamplerConfig,
                                        make_step_fn)

    audio_s = 10.0
    unet_cfg = UNetConfig(cross_attention_dims=(768, 1024),
                          class_embed_type=None,
                          projection_class_embeddings_input_dim=None,
                          class_embeddings_concat=False)
    vae_cfg = VAEConfig()
    voc_cfg = HiFiGANConfig()

    sr, hop = 16000, voc_cfg.hop_length
    height = int(np.ceil(audio_s * sr / hop / vae_cfg.scale_factor)
                 ) * vae_cfg.scale_factor
    owl = int(audio_s * sr)
    lat_shape = (1, unet_cfg.in_channels, height // vae_cfg.scale_factor,
                 voc_cfg.model_in_dim // vae_cfg.scale_factor)

    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    voc = SpeechT5HifiGan(voc_cfg)

    cfg_doubled = os.environ.get("DIFFMUSIC_TPU_CFG2") == "1"
    nstream = 2 if cfg_doubled else 1
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        ks = jax.random.split(jax.random.key(0), 3)
        gen = jnp.zeros((nstream, 8, 768))
        t5_seq = jnp.zeros((nstream, 12, 1024))
        t5_mask = jnp.ones((nstream, 12), jnp.int32)
        unet_p = unet.init(ks[0], jnp.zeros(lat_shape), jnp.asarray([0]),
                           encoder_hidden_states=gen[:1],
                           encoder_hidden_states_1=t5_seq[:1],
                           encoder_attention_mask_1=t5_mask[:1])
        vae_p = vae.init(ks[1], jnp.zeros((1, 1, height, voc_cfg.model_in_dim)))
        voc_p = voc.init(ks[2], jnp.zeros((1, height, voc_cfg.model_in_dim)))
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, t)
    unet_p, vae_p, voc_p = cast(unet_p), cast(vae_p), cast(voc_p)
    gen = gen.astype(jnp.bfloat16)
    t5_seq = t5_seq.astype(jnp.bfloat16)

    op = MusicInpaintingOperator(audio_length_in_s=audio_s, sample_rate=sr,
                                 mask_type="box", start_inpainting_s=4.0,
                                 end_inpainting_s=6.0)
    measurement = op.forward(jnp.zeros((1, owl)))
    target_mel = op.transform(measurement)
    schedule = DiffusionSchedule()
    cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                        num_inference_steps=steps)
    scaling = vae_cfg.scaling_factor
    timesteps = jnp.asarray(schedule.timesteps(steps))

    @jax.jit
    def sample(params, latents, key):
        unet_pp, vae_pp, voc_pp = params

        def model_fn(x, t):
            if not cfg_doubled:
                eps = unet.apply(unet_pp, x.astype(jnp.bfloat16), t,
                                 encoder_hidden_states=gen,
                                 encoder_hidden_states_1=t5_seq,
                                 encoder_attention_mask_1=t5_mask)
                return eps.astype(jnp.float32)
            x_in = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
            eps = unet.apply(unet_pp, x_in, t,
                             encoder_hidden_states=gen,
                             encoder_hidden_states_1=t5_seq,
                             encoder_attention_mask_1=t5_mask)
            uncond, text = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return uncond + 3.5 * (text - uncond)

        def loss_fn(x0):
            mel = vae.apply(vae_pp, (x0 / scaling).astype(jnp.bfloat16),
                            method=AutoencoderKL.decode)
            audio = op.inverse_transform(
                mel, lambda m: voc.apply(voc_pp, m))
            pred = op.forward(audio[:, :owl].astype(jnp.float32))
            return jnp.linalg.norm(target_mel - op.transform(pred))

        step_fn = make_step_fn(schedule, cfg, loss_fn)

        def body(carry, t):
            x, k = carry
            k, sub = jax.random.split(k)
            eps = model_fn(x, t)
            prev, _x0, loss = step_fn(eps, t, x, sub)
            return (prev, k), loss

        (final, _), losses = jax.lax.scan(body, (latents, key), timesteps)
        return final, losses

    latents = jax.random.normal(jax.random.key(1), lat_shape)
    return sample, (unet_p, vae_p, voc_p), latents


def component_rollup(logdir: str, steps: int):
    """Bucket device self-time into coarse components for the PERF_NOTES
    table: flash-attn custom calls, XLA attention (batch-dot softmax chains),
    convolutions, norms/elementwise fusions, copies/layout."""
    import glob
    import gzip
    import json
    from collections import defaultdict
    buckets = defaultdict(float)
    total = 0.0
    for f in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if "tpu" not in pid_names.get(ev.get("pid"), "").lower():
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0)
            total += dur
            low = name.lower()
            if "custom-call" in low or "flash" in low or "mosaic" in low:
                buckets["pallas_custom_calls"] += dur
            elif low.startswith(("conv", "cudnn")) or ".conv" in low:
                buckets["convolutions"] += dur
            elif low.startswith("dot") or "dot" in low.split(".")[0]:
                buckets["matmuls"] += dur
            elif low.startswith(("copy", "transpose", "reshape", "pad",
                                 "slice", "dynamic", "concat", "bitcast",
                                 "convert")):
                buckets["copies_layout"] += dur
            elif "reduce" in low or "norm" in low:
                buckets["reductions_norms"] += dur
            else:
                buckets["other_fusions"] += dur
    print(f"component rollup ({total / 1e3 / steps:.2f} ms/step device "
          f"total):")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v / 1e3 / steps:8.3f} ms/step  {k}")


def main(steps: int = 20, topk: int = 40, mode: str = "top"):
    from profile_trace import parse_traces
    sample, params, lat = build_sample(steps)
    t0 = time.time()
    out = sample(params, lat, jax.random.key(2))
    jax.block_until_ready(out)
    print(f"compile+1st: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = sample(params, lat, jax.random.key(3))
    jax.block_until_ready(out)
    warm = time.time() - t0
    print(f"warm: {warm:.2f}s ({warm / steps * 1e3:.1f} ms/step)", flush=True)

    logdir = "/tmp/diffmusic_trace_aldm2"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = sample(params, lat, jax.random.key(4))
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0]))
    jax.profiler.stop_trace()
    parse_traces(logdir, topk, steps, mode)
    component_rollup(logdir, steps)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 40,
         sys.argv[3] if len(sys.argv) > 3 else "top")
