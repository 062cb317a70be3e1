"""DiffMusic-TPU inference CLI — drop-in compatible with the reference's run.py
flag surface (reference run.py:39-142) and output tree (run.py:153-155):
outputs/{model}/{data}/{scheduler}/{task}/{wav,mel}_{input,recon,label}.

Extra flags beyond the reference: --checkpoint_dir (local converted weights; this
environment has no hub egress) and --tiny (random tiny weights smoke mode).
"""

import os
from argparse import ArgumentParser, Namespace
from pathlib import Path

import numpy as np

from diffmusic_tpu.constants import (
    CONFIG_PATH, MOISES, MUSICCAPS, AUDIOLDM2, MUSICLDM, STABLE_AUDIO,
    MUSIC_GENERATION, MUSIC_INPAINTING, SUPER_RESOLUTION,
    PHASE_RETRIEVAL, MUSIC_DEREVERBERATION, STYLE_GUIDANCE,
    DDIM, DPS, MPGD, DSG, DIFFMUSIC, DITTO,
    NULL_TEXT, TAG, CLAP, WAV_FORM, MEL_SPECTROGRAM,
)


def parse_arguments() -> Namespace:
    parser = ArgumentParser()
    parser.add_argument("-c", "--config_name", type=str, default=DIFFMUSIC,
                        choices=[DDIM, DPS, MPGD, DSG, DITTO, DIFFMUSIC])
    parser.add_argument("-t", "--task", type=str, default=MUSIC_INPAINTING,
                        choices=[MUSIC_GENERATION, MUSIC_INPAINTING,
                                 SUPER_RESOLUTION, PHASE_RETRIEVAL,
                                 MUSIC_DEREVERBERATION, STYLE_GUIDANCE])
    parser.add_argument("-d", "--datasets", type=str, default=MOISES,
                        choices=[MOISES, MUSICCAPS])
    parser.add_argument("-m", "--model", type=str, default=AUDIOLDM2,
                        choices=[AUDIOLDM2, MUSICLDM, STABLE_AUDIO])
    parser.add_argument("--mask_type", type=str, default="box",
                        choices=["box", "random", "periodic"])
    parser.add_argument("--supervised_space", type=str, default=MEL_SPECTROGRAM,
                        choices=[WAV_FORM, MEL_SPECTROGRAM])
    parser.add_argument("--prompt_type", type=str, default=NULL_TEXT,
                        choices=[NULL_TEXT, TAG, CLAP])
    parser.add_argument("-p", "--prompt", type=str, default="")
    parser.add_argument("-np", "--negative_prompt", type=str, default=None)
    parser.add_argument("--transcription", type=str, required=False, default="",
                        help="Transcription for Text-to-Speech")
    parser.add_argument("--show_progress", action="store_true")
    # TPU-build extras
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="local converted-weights dir (no hub egress here)")
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny-weights smoke mode (CPU-friendly)")
    parser.add_argument("--num_inference_steps", type=int, default=None,
                        help="override config num_inference_steps")
    parser.add_argument("-nw", "--num_waveforms_per_prompt", type=int, default=1,
                        help="generate N candidates; best by CLAP re-ranking "
                             "is written (reference pipeline_musicldm.py:304)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="device mesh spec, e.g. 'dp=4' or 'dp=2,tp=4': "
                             "shards the candidate batch (dp) and weight "
                             "channels (tp) over the chips jax.devices() sees")
    parser.add_argument("-o", "--override", action="append", default=[],
                        help="Hydra-style dotted config override, repeatable: "
                             "-o model.pipe.audio_length_in_s=5 -o data.root=…")
    return parser.parse_args()


def parse_mesh(spec):
    """'dp=2,tp=4' -> a jax Mesh (parallel/mesh.py)."""
    if not spec:
        return None
    from diffmusic_tpu.parallel.mesh import make_mesh
    kv = dict(part.split("=") for part in spec.split(","))
    dp, tp = int(kv.get("dp", 0)) or None, int(kv.get("tp", 0)) or None
    n = (dp or 1) * (tp or 1)
    return make_mesh(n_devices=n, dp=dp, tp=tp)


def build_operator(args, config, noiser):
    """Task -> operator construction (reference run.py:159-214), with the
    style_guidance path actually wired instead of raising."""
    from diffmusic_tpu.inverse_problem import (
        IdentityOperator, MusicInpaintingOperator, PhaseRetrievalOperator,
        SuperResolutionOperator, MusicDereverberationOperator,
        StyleGuidanceOperator,
    )
    task = args.task
    downsample_scale = 1
    if task == MUSIC_GENERATION:
        op = IdentityOperator(sample_rate=config.data.sample_rate)
    elif task == MUSIC_INPAINTING:
        op = MusicInpaintingOperator(
            audio_length_in_s=config.model.pipe.audio_length_in_s,
            sample_rate=config.data.sample_rate,
            mask_type=args.mask_type,
            start_inpainting_s=config.data.start_inpainting_s - config.data.start_s,
            end_inpainting_s=config.data.end_inpainting_s - config.data.start_s,
            mask_percentage=0.3, interval_s=1, mask_duration_s=0.1,
            noiser=noiser)
    elif task == SUPER_RESOLUTION:
        downsample_scale = 2
        op = SuperResolutionOperator(sample_rate=config.data.sample_rate,
                                     scale=downsample_scale, noiser=noiser)
    elif task == PHASE_RETRIEVAL:
        op = PhaseRetrievalOperator(n_fft=config.data.n_fft,
                                    hop_length=config.data.hop_length,
                                    win_length=config.data.win_length,
                                    noiser=noiser)
    elif task == MUSIC_DEREVERBERATION:
        op = MusicDereverberationOperator(ir_length=5000, decay_factor=0.99,
                                          noiser=noiser)
    elif task == STYLE_GUIDANCE:
        # clap_embed is bound after load_pipeline from the pipeline's HTSAT
        # tower (the reference's style_guidance path is dead — run.py:213-214
        # raises; operator.py:253-271 is never constructed. Wired here.)
        op = StyleGuidanceOperator(noiser=noiser)
    else:
        raise ValueError(f"Unknown task: {task}")
    return op, downsample_scale


def bind_style_guidance(pipe, operator):
    """Attach the pipeline's CLAP frame-feature tower to the style operator so
    the guided loss is the gram-matrix style distance (operator.py:253-271)."""
    from dataclasses import replace
    if getattr(pipe, "clap_frame_embed", None) is None:
        raise SystemExit(
            "style_guidance needs a CLAP audio tower: this checkpoint's "
            "text_encoder has no audio_model weights")
    operator = replace(operator, clap_embed=pipe.clap_frame_embed)
    pipe.operator = operator
    return operator


def load_pipeline(args, config, operator):
    from diffmusic_tpu.pipelines import get_pipeline
    from diffmusic_tpu.samplers import DiffusionSchedule

    cls = get_pipeline(pip_name=config.model.name)
    if config.model.name == STABLE_AUDIO:
        # EDM DPM-Solver++(2M) is internal to the pipeline; the DDIM block in
        # stable_audio.yaml is unused (the reference marks it "TODO: need to
        # fix" and its pipeline is unreachable anyway, run.py:84-87)
        if args.tiny:
            return cls.tiny()
        if args.checkpoint_dir:
            return cls.from_pretrained(args.checkpoint_dir)
        raise SystemExit(
            "This environment has no hub egress: pass --checkpoint_dir with "
            "locally converted weights, or --tiny for the smoke mode.")
    sched_cfg = config.model.scheduler
    schedule = DiffusionSchedule(
        num_train_timesteps=sched_cfg.num_train_timesteps,
        beta_start=sched_cfg.beta_start, beta_end=sched_cfg.beta_end,
        beta_schedule=sched_cfg.beta_schedule,
        set_alpha_to_one=sched_cfg.set_alpha_to_one,
        steps_offset=sched_cfg.steps_offset,
        timestep_spacing=sched_cfg.timestep_spacing)
    if args.tiny:
        pipe = cls.tiny(scheduler_name=config.name, operator=operator)
        pipe.schedule = schedule
        return pipe
    if args.checkpoint_dir:
        return cls.from_pretrained(args.checkpoint_dir,
                                   scheduler_name=config.name,
                                   operator=operator, schedule=schedule)
    raise SystemExit(
        "This environment has no hub egress: pass --checkpoint_dir with locally "
        "converted weights, or --tiny for the random-weights smoke mode.")


def main() -> None:
    args = parse_arguments()
    import jax
    import jax.numpy as jnp

    from diffmusic_tpu.config import compose
    from diffmusic_tpu.inverse_problem import get_noiser
    from diffmusic_tpu.ops.mel import Wav2Mel
    from diffmusic_tpu.data import get_dataset, get_dataloader, write_wav
    from diffmusic_tpu.pipelines import save_mel_spectrogram

    # cwd-relative configs/ (the reference's convention, run.py:147-151) only
    # when it actually holds the requested scheduler yaml — an unrelated
    # configs/ dir in the working directory must not shadow the tree shipped
    # next to this file
    cfg_path = CONFIG_PATH if Path(CONFIG_PATH,
                                   f"{args.config_name}.yaml").is_file() \
        else str(Path(__file__).resolve().parent / CONFIG_PATH)
    config = compose(config_name=args.config_name, overrides=[
        f"data={args.datasets}", f"model={args.model}", *args.override],
        config_path=cfg_path)
    if args.num_inference_steps is not None:
        config.model.pipe.num_inference_steps = args.num_inference_steps
    if args.num_waveforms_per_prompt != 1:
        config.model.pipe.num_waveforms_per_prompt = args.num_waveforms_per_prompt

    output_dir = Path("outputs", config.model.name, config.data.name,
                      args.config_name, args.task)
    for d in ["wav_input", "wav_recon", "wav_label",
              "mel_input", "mel_recon", "mel_label"]:
        os.makedirs(Path(output_dir, d), exist_ok=True)

    if args.model == STABLE_AUDIO and args.task != MUSIC_GENERATION:
        raise SystemExit(
            "stable_audio supports music_generation only: its latent space is "
            "the waveform-VAE (Oobleck), and neither this build nor the "
            "reference defines a measurement/guidance path for it (reference "
            "pipeline_stable_audio.py:728 plain scheduler.step)")

    noiser = get_noiser(**config.inverse_problem.noise)
    operator, downsample_scale = build_operator(args, config, noiser)
    pipe = load_pipeline(args, config, operator)
    if args.task == STYLE_GUIDANCE:
        operator = bind_style_guidance(pipe, operator)
    pipe.mesh = parse_mesh(args.mesh)

    # stable_audio.yaml keys the clip length as audio_end_in_s (reference
    # configs/model/stable_audio.yaml), the LDM configs as audio_length_in_s
    audio_length_in_s = config.model.pipe.get(
        "audio_length_in_s", config.model.pipe.get("audio_end_in_s"))
    sr = config.data.sample_rate
    # generated audio is written at the GENERATOR's rate: the LDM vocoders run
    # at 16 kHz (== data sr), the Oobleck waveform VAE at its own rate
    out_sr = (getattr(getattr(pipe, "vocoder_cfg", None), "sampling_rate", None)
              or getattr(getattr(pipe, "vae_cfg", None), "sampling_rate", None)
              or sr)
    wav2mel = Wav2Mel(sample_rate=sr, n_fft=config.data.n_fft,
                      hop_length=config.data.hop_length,
                      win_length=config.data.win_length,
                      n_mels=config.data.n_mels, power=config.data.power)

    dataset = get_dataset(
        name=config.data.name, type=config.data.type, root=config.data.root,
        sample_rate=sr, audio_length_in_s=audio_length_in_s,
        start_s=config.data.start_s, end_s=config.data.end_s, transforms=None)
    loader = get_dataloader(dataset, batch_size=1, num_workers=0, train=False)

    print("=" * 50)
    print(f"| Model             : {config.model.name}")
    print(f"| Data              : {config.data.name}")
    print(f"| Task              : {args.task}")
    print(f"| Scheduler         : {args.config_name}")
    print(f"| Supervised Space  : {args.supervised_space}")
    print(f"| Prompt Type       : {args.prompt_type}")
    print(f"| Prompt            : '{args.prompt}'")
    print(f"| Show Progress     : {args.show_progress}")
    print(f"| Number of Samples : {len(loader)}")
    print("=" * 50)

    key = jax.random.key(0)
    mel_frames = int(audio_length_in_s * 100)

    for i, (data, file_name) in enumerate(loader, start=1):
        print(f"=====> Inference for audio {i}")
        recon_path = Path(output_dir, "wav_recon", file_name)
        if recon_path.exists():
            print(f"File {file_name} already exists. Skipping.")
            continue

        gt_wave = jnp.asarray(data)
        gt_mel = np.asarray(wav2mel(gt_wave))[:, :, :mel_frames]
        save_mel_spectrogram(gt_mel.transpose(0, 2, 1),
                             Path(output_dir, "mel_label",
                                  file_name).with_suffix(".png"), sr)

        if args.task != PHASE_RETRIEVAL:
            key, mkey = jax.random.split(key)
            ref_wave = operator.forward(gt_wave, mkey)
            ref_mel = np.asarray(wav2mel(ref_wave))[:, :, :mel_frames]
            # gt mel clamps the frequency axis so a downsampled input renders
            # on the ground truth's scale (reference run.py:293-300)
            save_mel_spectrogram(ref_mel.transpose(0, 2, 1),
                                 Path(output_dir, "mel_input",
                                      file_name).with_suffix(".png"),
                                 sr // downsample_scale,
                                 gt_mel_spectrogram=gt_mel.transpose(0, 2, 1),
                                 gt_sample_rate=sr)
            measurement = ref_wave
        else:
            key, mkey = jax.random.split(key)
            measurement = operator.forward(gt_wave, mkey)
            ref_wave = None

        key, pkey = jax.random.split(key)
        out = pipe(
            latents=None,
            prompt=args.prompt,
            negative_prompt=args.negative_prompt,
            measurement=measurement,
            eta=config.scheduler.eta,
            ip_guidance_rate=config.scheduler.ip_guidance_rate,
            optim_prompt_learning_rate=config.scheduler.optim_prompt_learning_rate,
            key=pkey,
            optim_prompt=config.scheduler.optim_prompt,
            optim_outer_loop=config.scheduler.optim_outer_loop,
            show_progress=args.show_progress,
            prompt_type=args.prompt_type,
            transcription=args.transcription,
            supervised_space=args.supervised_space,
            **config.model.pipe,
        )
        audio = out.audios
        if config.model.pipe.num_waveforms_per_prompt > 1:
            # CLAP re-ranking: write the best text-match first (the reference
            # defines score_waveforms but its call site is commented out,
            # plpeline_audioldm2.py:1240 — wired here)
            if getattr(pipe, "clap_audio_embed", None) is not None:
                audio, sims = pipe.score_waveforms(
                    args.prompt, audio,
                    config.model.pipe.num_waveforms_per_prompt)
                print(f"CLAP re-ranking similarities: {np.round(sims, 4)}")
            else:
                print("num_waveforms_per_prompt > 1 but no CLAP audio tower "
                      "loaded; keeping generation order")

        write_wav(Path(output_dir, "wav_label", file_name), np.asarray(gt_wave)[0], sr)
        if ref_wave is not None:
            write_wav(Path(output_dir, "wav_input", file_name),
                      np.asarray(ref_wave)[0], sr // downsample_scale)

        audio = np.asarray(audio)
        # stable_audio emits stereo (B, C, T); downmix for the mel PNG only
        audio_mono = audio.mean(axis=1) if audio.ndim == 3 else audio
        if out_sr != sr:
            # wav2mel is built at config.data.sample_rate; stable_audio's
            # generator runs at its own native rate (44.1 kHz with real
            # Oobleck checkpoints) — resample before taking the spectrogram
            from diffmusic_tpu.ops.resample import resample
            audio_mono = np.asarray(
                resample(jnp.asarray(audio_mono), out_sr, sr))
        pred_mel = np.asarray(wav2mel(jnp.asarray(audio_mono)))[:, :, :mel_frames]
        save_mel_spectrogram(pred_mel.transpose(0, 2, 1),
                             Path(output_dir, "mel_recon",
                                  file_name).with_suffix(".png"), sr)
        write_wav(recon_path, audio[0], out_sr)


if __name__ == "__main__":
    main()
