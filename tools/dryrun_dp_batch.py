"""dp-sharded batching artifact: the documented multi-clip serving story.

Single-chip batching LOSES on this workload (tools/bench_batched.py, measured
on v5e: batch-4 costs 4.8x batch-1 — every dominant per-step cost scales with
batch, weight traffic is too small to amortize). The TPU-native batching story
is therefore dp over a mesh: one clip per chip, params replicated, zero
cross-clip communication. This tool PROVES the two structural claims on a
virtual mesh (no multi-chip hardware needed):

1. EXACTNESS — a dp=2 batch-2 guided DPS scan produces, per clip, the same
   result as two independent batch-1 runs (the per-clip-summed reconstruction
   loss in pipelines/musicldm.py::make_loss_fn keeps clip gradients
   independent; reference semantics is batch-1 only, run.py:249).
2. LINEAR SCALING BY CONSTRUCTION — the compiled dp program's only cross-dp
   collective is the scalar loss reduction (a few bytes/step): each dp shard
   runs the measured batch-1 program, so seconds-of-audio/s/chip is flat in
   the number of chips. The tool counts collective ops in the compiled HLO.

Usage: python tools/dryrun_dp_batch.py [ndp]   (default 2; self-provisions a
virtual CPU mesh when the session backend exposes fewer devices, exactly like
__graft_entry__.dryrun_multichip).
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _self_provision(ndp: int):
    import subprocess
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={ndp}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(ndp)], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"dp-batch CPU-mesh subprocess failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}")
    # last line is the JSON artifact
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main(ndp: int = 2):
    import jax
    if len(jax.devices()) < ndp:
        out = _self_provision(ndp)
        print(json.dumps(out))
        return out

    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__
    from diffmusic_tpu.parallel import make_mesh, shard_batch_dp
    from diffmusic_tpu.samplers import SamplerConfig, make_step_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(ndp, dp=ndp, tp=1)
    n_steps = 6
    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(
        tiny=True, batch=ndp)

    # ndp DISTINCT clips -> distinct measurements (tones at different pitches)
    sr = 16000
    tt = np.arange(owl) / sr
    gt = np.stack([np.sin(2 * np.pi * 220.0 * (b + 1) * tt)
                   for b in range(ndp)]).astype(np.float32)
    measurement = op.forward(jnp.asarray(gt))
    cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                        num_inference_steps=n_steps)
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    timesteps = jnp.asarray(pipe.schedule.timesteps(n_steps))

    def scan_for(batch: int):
        # single-stream UNet (the product's degenerate-CFG path for the empty
        # inverse-problem prompt): CFG batch-doubling would concat along the
        # dp-sharded axis, which GSPMD realizes as an all-gather per step
        prompt_embeds = jnp.zeros((batch, cls_dim))
        model_fn = pipe._make_model_fn(prompt_embeds, 1.0)

        def run(latents, meas, key):
            loss_fn = pipe.make_loss_fn(meas, owl, "mel_spectrogram")
            step_fn = make_step_fn(pipe.schedule, cfg, loss_fn)

            def body(carry, t):
                x, k = carry
                k, sub = jax.random.split(k)
                eps = model_fn(x, t)
                prev, _x0, loss = step_fn(eps, t, x, sub)
                return (prev, k), loss

            (final, _), losses = jax.lax.scan(body, (latents, key), timesteps)
            return final, losses
        return run

    latents0 = jax.random.normal(jax.random.key(1), lat_shape)
    scan_key = jax.random.key(2)

    # independent batch-1 reference runs (eta=0 DPS has no per-step noise, so
    # the scan key does not enter the math and per-clip results are comparable)
    run1 = jax.jit(scan_for(1))
    singles = [np.asarray(run1(latents0[b:b + 1], measurement[b:b + 1],
                                scan_key)[0]) for b in range(ndp)]

    run_dp = scan_for(ndp)
    with mesh:
        lat_sh = shard_batch_dp(mesh, len(lat_shape))
        meas_sh = shard_batch_dp(mesh, measurement.ndim)
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(run_dp, in_shardings=(lat_sh, meas_sh, repl),
                         out_shardings=(lat_sh, repl))
        lowered = jitted.lower(jax.device_put(latents0, lat_sh),
                               jax.device_put(measurement, meas_sh), scan_key)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        # cross-dp collectives present in the compiled program
        colls = re.findall(
            r"\b(f32|bf16|s32|u32|pred)\[([0-9,]*)\][^\n]*?"
            r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
            r"all-to-all)\b", hlo)
        coll_elems = sum(int(np.prod([int(d) for d in dims.split(",") if d]))
                         if dims else 1 for _, dims, _ in colls)
        final, losses = jitted(jax.device_put(latents0, lat_sh),
                               jax.device_put(measurement, meas_sh), scan_key)
        final = np.asarray(final)

    diffs = [float(np.max(np.abs(final[b] - singles[b][0])))
             for b in range(ndp)]
    scale = max(float(np.max(np.abs(s))) for s in singles)
    ok = max(diffs) <= 1e-4 * max(scale, 1.0)
    out = {
        "artifact": "dp_batching",
        "dp": ndp,
        "clips": ndp,
        "steps": n_steps,
        "per_clip_max_abs_diff_vs_independent_runs": [round(d, 9)
                                                      for d in diffs],
        "result_scale": round(scale, 4),
        "equal_to_independent_runs": bool(ok),
        "cross_dp_collective_ops": len(colls),
        "cross_dp_collective_elements": int(coll_elems),
        "note": "each dp shard runs the batch-1 program; collectives carry "
                "only the scalar loss reduction, so s-audio/s/chip is flat "
                "in chips (single-chip batch-4 measured 4.8x cost — "
                "tools/bench_batched.py)",
    }
    assert ok, out
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
