"""Native codec layer (data/codecs.py): libopus + Ogg demuxer, libmpg123 MP3,
and the FAD gate running on the reference's real opus fixtures
(VERDICT r1 item 8: the regression gate must see real audio, not sine sweeps).
"""

import ctypes
import json
from pathlib import Path

import numpy as np
import pytest

from diffmusic_tpu.data import get_dataset, read_audio, write_wav
from diffmusic_tpu.data.codecs import (decode_mp3, decode_opus, have_mp3,
                                       have_opus)

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)

SAMPLES = Path("/root/reference/fadtk/test/samples")
REF_CSV = Path("/root/reference/fadtk/test/samples_FAD_scores.csv")

needs_opus = pytest.mark.skipif(not have_opus(), reason="libopus absent")
needs_mp3 = pytest.mark.skipif(not have_mp3(), reason="libmpg123 absent")
needs_fixtures = pytest.mark.skipif(not SAMPLES.exists(),
                                    reason="reference fixtures absent")


def _encode_mp3_lame(path, wav: np.ndarray, sr: int):
    """Encode mono float32 -> MP3 via libmp3lame (test fixture generator)."""
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_brate(gfp, 128)
    assert lame.lame_init_params(gfp) >= 0
    n = len(wav)
    out = (ctypes.c_ubyte * (int(1.25 * n) + 7200))()
    pcm = np.ascontiguousarray(wav, np.float32)
    m = lame.lame_encode_buffer_ieee_float(
        gfp, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, out, len(out))
    assert m >= 0
    tail = (ctypes.c_ubyte * 7200)()
    t = lame.lame_encode_flush(gfp, tail, len(tail))
    lame.lame_close(gfp)
    Path(path).write_bytes(bytes(out[:m]) + bytes(tail[:t]))


class TestOpus:
    @needs_opus
    @needs_fixtures
    def test_reference_fixture_decodes(self):
        wav, sr = decode_opus(SAMPLES / "mg-1634.opus")
        assert sr == 48000
        assert wav.shape == (1, 480000)  # exactly 10 s after pre-skip trim
        assert np.isfinite(wav).all()
        assert 0.05 < np.abs(wav).max() <= 1.5  # real music, sane level

    @needs_opus
    @needs_fixtures
    def test_all_fixtures_decode(self):
        for f in sorted(SAMPLES.glob("*.opus")):
            wav, sr = decode_opus(f)
            assert sr == 48000 and wav.shape[1] > 48000, f.name
            assert np.isfinite(wav).all(), f.name

    @needs_opus
    @needs_fixtures
    def test_read_audio_dispatch_and_dataset(self, tmp_path):
        wav, sr = read_audio(SAMPLES / "mg-1648.opus")
        assert sr == 48000 and wav.ndim == 2
        ds = get_dataset(name="ref-opus", type="opus", root=str(SAMPLES),
                         sample_rate=16000, audio_length_in_s=5.0,
                         start_s=0.0, end_s=5.0, transforms=None)
        item, name = ds[0]
        assert item.shape == (1, 80000) and name.endswith(".opus")
        assert np.isfinite(item).all()


class TestMP3:
    @needs_mp3
    def test_mp3_roundtrip_via_lame(self, tmp_path):
        sr = 16000
        t = np.arange(sr * 2) / sr
        clean = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mp3 = tmp_path / "tone.mp3"
        _encode_mp3_lame(mp3, clean, sr)
        wav, got_sr = decode_mp3(mp3)
        assert got_sr == sr and wav.shape[0] == 1
        # lame adds ~2900 samples of encoder+decoder delay; align by
        # cross-correlation then compare
        dec = wav[0]
        lag = int(np.argmax(np.correlate(dec[:8000], clean[:2000], "valid")))
        corr = np.corrcoef(dec[lag:lag + sr], clean[:sr])[0, 1]
        assert corr > 0.99, f"decoded audio decorrelated (corr={corr:.3f})"

    @needs_mp3
    def test_mp3_dataset(self, tmp_path):
        sr = 16000
        t = np.arange(sr * 3) / sr
        _encode_mp3_lame(tmp_path / "a.mp3",
                         (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                         sr)
        ds = get_dataset(name="m", type="mp3", root=str(tmp_path),
                         sample_rate=16000, audio_length_in_s=2.0,
                         start_s=0.0, end_s=2.0, transforms=None)
        item, name = ds[0]
        assert item.shape == (1, 32000) and name == "a.mp3"


class TestOpusFixtureGoldens:
    """FAD gate on the reference's 23 real opus clips (mfcc-stack embedder;
    the reference CSV's vggish/MERT columns need real checkpoints, but the
    song list and the gate mechanics run on the same fixtures)."""

    @needs_opus
    @needs_fixtures
    def test_per_song_csv_covers_reference_song_list(self, tmp_path):
        import csv as csvmod
        from diffmusic_tpu.fadtk import FADEngine

        engine = FADEngine(model_name="mfcc-stack")
        # cache lands next to the fixtures; keep the mirror read-only by
        # copying the opus files into tmp first
        work = tmp_path / "samples"
        work.mkdir()
        for f in sorted(SAMPLES.glob("*.opus")):
            (work / f.name).write_bytes(f.read_bytes())
        out_csv = engine.score_individual(work, work, tmp_path / "scores.csv")
        with open(out_csv) as fh:
            got_songs = {row[0] for row in csvmod.reader(fh)}
        with open(REF_CSV) as fh:
            ref_songs = {row["song_id"].removeprefix("samples/")
                         for row in csvmod.DictReader(fh)} - {"all"}
        assert ref_songs <= got_songs, ref_songs - got_songs

    @needs_opus
    @needs_fixtures
    def test_fixture_fad_golden(self, tmp_path):
        """mg-* vs mp-* split of the real fixtures: a frozen golden catches
        regressions in decode, embedding, stats, or the Fréchet solver."""
        from diffmusic_tpu.fadtk import FADEngine

        a, b = tmp_path / "mg", tmp_path / "other"
        a.mkdir(), b.mkdir()
        for f in sorted(SAMPLES.glob("*.opus")):
            dest = a if f.name.startswith("mg-") else b
            (dest / f.name).write_bytes(f.read_bytes())
        assert len(list(a.iterdir())) and len(list(b.iterdir()))
        fad = FADEngine(model_name="mfcc-stack").score(a, b)
        golden = json.loads(
            (Path(__file__).parent / "golden_scores.json").read_text())
        want = golden.get("opus_fixture_mg_vs_other_mfcc_stack")
        assert want is not None, (
            f"freeze this as opus_fixture_mg_vs_other_mfcc_stack: {fad}")
        assert fad == pytest.approx(want, rel=0.05), (fad, want)
