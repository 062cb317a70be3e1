"""End-to-end CLI test for run.py (reference run.py:145-378 contract).

Exercises the full entry point the way a user would: argv parsing, Hydra-style
compose with dotted overrides, operator construction, tiny pipeline, the
per-file inference loop, and the reference's output-tree contract
outputs/{model}/{data}/{scheduler}/{task}/{wav,mel}_{input,recon,label}
(reference run.py:153-155) including skip-if-exists resumability
(run.py:270-273).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


@pytest.fixture()
def data_root(tmp_path):
    from diffmusic_tpu.data.io import write_wav
    root = tmp_path / "data_src"
    root.mkdir()
    sr = 16000
    t = np.arange(int(0.5 * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    write_wav(root / "track.wav", wav, sr)
    return root


def _run_cli(monkeypatch, tmp_path, data_root, extra):
    import run
    argv = ["run.py", "-c", "dps", "-t", "music_inpainting", "-m", "musicldm",
            "--tiny", "--num_inference_steps", "2",
            "-o", f"data.root={data_root}",
            "-o", "data.start_s=0", "-o", "data.end_s=0.4",
            "-o", "data.start_inpainting_s=0.1",
            "-o", "data.end_inpainting_s=0.3",
            "-o", "model.pipe.audio_length_in_s=0.4",
            *extra]
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", argv)
    run.main()
    return tmp_path / "outputs" / "musicldm" / "moises" / "dps" / "music_inpainting"


def test_cli_stable_audio_music_generation(monkeypatch, tmp_path, data_root):
    """stable_audio is reachable from the product CLI (unlike the reference,
    whose run.py -m lists only audioldm2/musicldm at run.py:84-87 while
    shipping configs/model/stable_audio.yaml): tiny e2e produces the output
    tree with a stereo wav at the Oobleck rate."""
    import run
    argv = ["run.py", "-c", "ddim", "-t", "music_generation",
            "-m", "stable_audio", "--tiny", "--num_inference_steps", "2",
            "-o", f"data.root={data_root}",
            "-o", "data.start_s=0", "-o", "data.end_s=0.4",
            "-o", "model.pipe.audio_end_in_s=0.2",
            "-o", "model.pipe.num_waveforms_per_prompt=1"]
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", argv)
    run.main()
    out = (tmp_path / "outputs" / "stable_audio" / "moises" / "ddim"
           / "music_generation")
    assert (out / "wav_recon" / "track.wav").exists()
    assert (out / "mel_recon" / "track.png").exists()

    from diffmusic_tpu.data.io import read_wav
    recon, sr = read_wav(out / "wav_recon" / "track.wav")
    assert sr == 16000  # tiny Oobleck rate (real ckpt: 44.1 kHz)
    assert recon.shape[0] == 2  # stereo
    assert recon.shape[-1] == 3200  # audio_end_in_s * sr
    assert np.isfinite(recon).all()


def test_cli_stable_audio_rejects_inverse_tasks(monkeypatch, tmp_path,
                                                data_root):
    import run
    argv = ["run.py", "-c", "dps", "-t", "music_inpainting",
            "-m", "stable_audio", "--tiny",
            "-o", f"data.root={data_root}"]
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="music_generation only"):
        run.main()


def test_cli_end_to_end_output_tree(monkeypatch, tmp_path, data_root, capsys):
    out = _run_cli(monkeypatch, tmp_path, data_root, [])

    # the reference's six output subdirs (run.py:153-155)
    for d in ["wav_input", "wav_recon", "wav_label",
              "mel_input", "mel_recon", "mel_label"]:
        assert (out / d).is_dir(), d

    assert (out / "wav_recon" / "track.wav").exists()
    assert (out / "wav_label" / "track.wav").exists()
    assert (out / "wav_input" / "track.wav").exists()
    for d in ["mel_input", "mel_recon", "mel_label"]:
        assert (out / d / "track.png").exists(), d

    from diffmusic_tpu.data.io import read_wav
    recon, sr = read_wav(out / "wav_recon" / "track.wav")
    assert sr == 16000
    assert recon.shape[-1] == 6400  # audio_length_in_s * sr
    assert np.isfinite(recon).all()

    # skip-if-exists resumability (reference run.py:270-273)
    _run_cli(monkeypatch, tmp_path, data_root, [])
    assert "already exists. Skipping." in capsys.readouterr().out
    # note: _run_cli chdirs to tmp_path, so this test also covers finding the
    # configs/ tree shipped next to run.py from a foreign working directory
