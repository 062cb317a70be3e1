"""Device-trace profile of the guided DPS step (bench.py workload, 20 steps).

Captures an xprof trace of the compiled scan and prints the top XLA ops by
device self-time — turns the per-component scan benches into an op-level
breakdown. Works iff the platform exposes device tracing (the axon tunnel may
only give host traces; the tool says which it found).

Usage: python tools/profile_trace.py [steps] [topk]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def build_sample(steps: int):
    sys.path.insert(0, ".")
    import __graft_entry__
    from diffmusic_tpu.samplers import SamplerConfig, make_step_fn
    from diffmusic_tpu.models.vae import AutoencoderKL

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    unet_p, vae_p, voc_p = (cast(pipe.unet_params), cast(pipe.vae_params),
                            cast(pipe.vocoder_params))
    measurement = op.forward(jnp.zeros((1, owl)))
    target_mel = op.transform(measurement)
    cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                        num_inference_steps=steps)
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    # mirror bench.py's degenerate-CFG default (single-stream UNet);
    # DIFFMUSIC_TPU_CFG2=1 traces the doubled program instead
    cfg_doubled = os.environ.get("DIFFMUSIC_TPU_CFG2") == "1"
    prompt_embeds = jnp.zeros((2 if cfg_doubled else 1, cls_dim), jnp.bfloat16)
    scaling = pipe.vae_cfg.scaling_factor
    ts = jnp.asarray(pipe.schedule.timesteps(steps))

    @jax.jit
    def sample(params, latents, key):
        up, vp, wp = params

        def model_fn(x, t):
            if not cfg_doubled:
                eps = pipe.unet.apply(up, x.astype(jnp.bfloat16), t,
                                      class_labels=prompt_embeds)
                return eps.astype(jnp.float32)
            x_in = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
            eps = pipe.unet.apply(up, x_in, t, class_labels=prompt_embeds)
            unc, txt = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return unc + 2.0 * (txt - unc)

        def loss_fn(x0):
            mel = pipe.vae.apply(vp, (x0 / scaling).astype(jnp.bfloat16),
                                 method=AutoencoderKL.decode)
            audio = op.inverse_transform(
                mel, lambda m: pipe.vocoder.apply(wp, m))
            pred = op.forward(audio[:, :owl].astype(jnp.float32))
            return jnp.linalg.norm(target_mel - op.transform(pred))

        step_fn = make_step_fn(pipe.schedule, cfg, loss_fn)

        def body(carry, t):
            x, k = carry
            k, sub = jax.random.split(k)
            eps = model_fn(x, t)
            prev, _x0, loss = step_fn(eps, t, x, sub)
            return (prev, k), loss

        (final, _), losses = jax.lax.scan(body, (latents, key), ts)
        return final, losses

    params = (unet_p, vae_p, voc_p)
    lat = jax.random.normal(jax.random.key(0), lat_shape)
    return sample, params, lat


COPY_PREFIXES = ("copy", "reshape", "pad", "transpose", "convert", "bitcast",
                 "slice", "dynamic-slice", "dynamic-update-slice", "concat")


def parse_traces(logdir: str, topk: int, steps: int, mode: str = "top"):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("NO trace files found — platform did not emit a trace")
        return
    by_name = defaultdict(float)
    by_copy = defaultdict(lambda: [0.0, 0])
    device_total = 0.0
    copy_total = 0.0
    tracks = set()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            tracks.add(pname)
            if "TPU" not in pname and "tpu" not in pname.lower():
                continue
            name = ev.get("name", "?")
            by_name[name] += ev.get("dur", 0)
            device_total += ev.get("dur", 0)
            base = name.split(".")[0].split("-fusion")[0]
            if base.startswith(COPY_PREFIXES):
                # bucket the copy/layout tail by (op kind, result shape):
                # long_name carries 'shape = ...' metadata when present
                args = ev.get("args", {}) or {}
                lname = args.get("long_name", "") or args.get("tf_op", "")
                key = (base, lname[:140] if lname else name[:60])
                by_copy[key][0] += ev.get("dur", 0)
                by_copy[key][1] += 1
                copy_total += ev.get("dur", 0)
    print(f"tracks seen: {sorted(tracks)}")
    if not by_name:
        print("no device-track events (host-only trace)")
        return
    print(f"device events total: {device_total / 1e3:.2f} ms "
          f"({device_total / 1e3 / steps:.3f} ms/step)")
    if mode == "copies":
        print(f"copy/layout tail total: {copy_total / 1e3 / steps:.3f} ms/step "
              f"across {sum(c for _d, c in by_copy.values())} events")
        for (base, lname), (dur, cnt) in sorted(
                by_copy.items(), key=lambda kv: -kv[1][0])[:topk]:
            print(f"  {dur / 1e3 / steps:8.4f} ms/step  x{cnt // steps:4d} "
                  f" {base:12s} {lname}")
        return
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:topk]:
        print(f"  {dur / 1e3 / steps:8.3f} ms/step  {name[:110]}")


def main(steps: int = 20, topk: int = 40, mode: str = "top"):
    sample, params, lat = build_sample(steps)
    t0 = time.time()
    out = sample(params, lat, jax.random.key(1))
    jax.block_until_ready(out)
    print(f"compile+1st: {time.time() - t0:.1f}s", flush=True)

    logdir = "/tmp/diffmusic_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = sample(params, lat, jax.random.key(2))
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0]))
    jax.profiler.stop_trace()
    parse_traces(logdir, topk, steps, mode)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 40,
         sys.argv[3] if len(sys.argv) > 3 else "top")
