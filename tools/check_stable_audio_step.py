"""Full-scale StableAudio compile/run check on the real TPU.

Third model family: stable-audio-open DiT (24 layers, 1536 hidden,
rotary GQA) + Oobleck waveform VAE + EDM DPM-Solver++(2M), at real dims with
random weights (no egress). The reference ships this pipeline dormant; here
it is wired — this validates it at scale on hardware.

Usage: python tools/check_stable_audio_step.py [steps] [seconds]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main(steps: int = 10, seconds: float = 5.0):
    sys.path.insert(0, ".")
    from diffmusic_tpu.models.configs import (OobleckConfig,
                                              StableAudioDiTConfig,
                                              StableAudioProjectionConfig,
                                              T5Config)
    from diffmusic_tpu.models.oobleck import AutoencoderOobleck
    from diffmusic_tpu.models.stable_audio_dit import (
        StableAudioDiTModel, StableAudioProjectionModel)
    from diffmusic_tpu.pipelines.stable_audio import StableAudioPipeline

    dit_cfg = StableAudioDiTConfig()
    vae_cfg = OobleckConfig()
    t5_cfg = T5Config(d_model=768)
    proj_cfg = StableAudioProjectionConfig()

    dit = StableAudioDiTModel(dit_cfg)
    vae = AutoencoderOobleck(vae_cfg)
    proj = StableAudioProjectionModel(proj_cfg)

    sr, hop = vae_cfg.sampling_rate, vae_cfg.hop_length
    latent_t = int(np.ceil(seconds * sr / hop))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        ks = jax.random.split(jax.random.key(0), 3)
        dit_p = dit.init(ks[0], jnp.zeros((1, dit_cfg.in_channels, latent_t)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 12, dit_cfg.cross_attention_input_dim)),
                         jnp.zeros((1, dit_cfg.global_states_input_dim)))
        vae_p = vae.init(ks[1],
                         jnp.zeros((1, dit_cfg.in_channels, latent_t)),
                         method=AutoencoderOobleck.decode)
        proj_p = proj.init(ks[2], jnp.zeros((2, 12, t5_cfg.d_model)),
                           jnp.zeros((2,)), jnp.zeros((2,)))
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, t)

    pipe = StableAudioPipeline(
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, text_cfg=t5_cfg, proj_cfg=proj_cfg,
        dit_params=cast(dit_p), vae_params=cast(vae_p), text_params={},
        proj_params=cast(proj_p), dtype=jnp.bfloat16)

    prompt_embeds = jnp.zeros((2, 12, t5_cfg.d_model), jnp.bfloat16)
    # two timed calls in one process: first carries the compile, second is
    # warm — its wall / steps is the steady-state per-step cost
    walls = []
    for rep in range(2):
        t0 = time.time()
        out = pipe(prompt_embeds=prompt_embeds, audio_end_in_s=seconds,
                   num_inference_steps=steps, guidance_scale=7.0,
                   key=jax.random.key(1 + rep))
        walls.append(time.time() - t0)
        audio = out.audios
        assert np.isfinite(audio).all(), "non-finite audio"
    print(f"stable_audio {steps}-step {seconds:.0f}s OK  "
          f"cold={walls[0]:.1f}s warm={walls[1]:.1f}s "
          f"audio={audio.shape}", flush=True)
    # warm wall includes the Oobleck decode + dispatch, so wall/steps is NOT
    # a per-step cost at small step counts (the 50-step run measured
    # 9.9 ms/step steady, docs/PERF_NOTES.md) — report the warm total
    return {"steps": steps, "seconds": seconds,
            "cold_s": round(walls[0], 1),
            "warm_total_s": round(walls[1], 2)}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10,
         float(sys.argv[2]) if len(sys.argv) > 2 else 5.0)
