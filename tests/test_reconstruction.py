"""Reconstruction through the REAL decode chain (VERDICT round-2 item 2).

The reference's entire point is that the guidance gradient flows through
VAE.decode -> vocoder -> A(.) (scheduling_dps.py:195-213). These tests prove
that chain *reconstructs* on the tiny fake backend: the measurement is
produced by the same chain guidance differentiates, the guided loss
trajectory DECREASES, and the final sample's measurement-consistency beats an
unguided scan from the same key. Ground truth is a DDIM sample from the SAME
tiny model, so it lies on the model's output manifold (a random-weights prior
cannot hallucinate masked content — the verify-skill calibration note — so
recovery is judged in the OBSERVED region, where guidance acts).

Measured on this seed (30 steps): diffmusic rate 0.5 loss 223.5 -> 79.9,
dsg rate 0.2 -> 94.1, dps rate 0.3 -> 132.3; DITTO outer 167 -> 120.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
from diffmusic_tpu.pipelines import MusicLDMPipeline

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


@pytest.fixture(scope="module")
def setup():
    op = MusicInpaintingOperator(audio_length_in_s=0.4, sample_rate=16000,
                                 mask_type="box", start_inpainting_s=0.15,
                                 end_inpainting_s=0.25)
    gen = MusicLDMPipeline.tiny("ddim")
    gt = jnp.asarray(gen(prompt="", audio_length_in_s=0.4,
                         num_inference_steps=10,
                         key=jax.random.key(42)).audios)
    meas = op.forward(gt)
    unguided = gen(prompt="", audio_length_in_s=0.4, num_inference_steps=30,
                   eta=1.0, key=jax.random.key(1)).audios
    return op, gt, meas, unguided


def _consistency(op, meas, audio):
    """|| A(transform(audio)) - transform(y) ||: the guided loss itself,
    evaluated on a finished waveform (observed region only — A masks)."""
    pred = op.transform(op.forward(jnp.asarray(audio)))
    return float(jnp.linalg.norm(op.transform(meas) - pred))


class TestFullChainReconstruction:
    @pytest.mark.parametrize("name,eta,rate,floor", [
        ("diffmusic", 1.0, 0.5, 0.55),  # measured 223.5 -> 79.9 (64% drop)
        ("dsg", 1.0, 0.2, 0.45),        # measured 223.5 -> 94.1
        ("dps", 0.0, 0.3, 0.25),        # measured 223.5 -> 132.3
    ])
    def test_guided_loss_decreases_through_real_chain(self, setup, name, eta,
                                                      rate, floor):
        op, gt, meas, unguided = setup
        pipe = MusicLDMPipeline.tiny(name, operator=op)
        out, losses = pipe(prompt="", audio_length_in_s=0.4,
                           num_inference_steps=30, eta=eta,
                           ip_guidance_rate=rate, measurement=meas,
                           return_losses=True, key=jax.random.key(1))
        losses = np.asarray(losses)
        assert np.isfinite(out.audios).all()
        # trajectory must DECREASE through UNet step -> VAE decode -> HiFi-GAN
        # -> mask -> mel — not merely stay finite
        assert losses[-3:].mean() < (1.0 - floor) * losses[:3].mean(), losses

    def test_guided_beats_unguided_consistency(self, setup):
        op, gt, meas, unguided = setup
        pipe = MusicLDMPipeline.tiny("diffmusic", operator=op)
        out = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=30,
                   eta=1.0, ip_guidance_rate=0.5, measurement=meas,
                   key=jax.random.key(1))
        d_guided = _consistency(op, meas, out.audios)
        d_unguided = _consistency(op, meas, unguided)
        # measured ~80 vs ~223: guidance pulls the observed region toward y
        assert d_guided < 0.6 * d_unguided

    def test_ditto_outer_loop_reduces_loss(self, setup):
        """DITTO's outer SGD on the init latent must reduce the full-chain
        loss across outer iterations (reference scheduling_ditto.py:205-208;
        measured 167 -> 120 over 8 outers)."""
        op, gt, meas, unguided = setup
        pipe = MusicLDMPipeline.tiny("ditto", operator=op)
        out, dl = pipe(prompt="", audio_length_in_s=0.4,
                       num_inference_steps=10, eta=1.0, ip_guidance_rate=0.5,
                       optim_outer_loop=8, measurement=meas,
                       return_losses=True, key=jax.random.key(3))
        dl = np.asarray(dl)
        assert dl.shape == (8,)
        assert np.isfinite(dl).all()
        assert dl[-3:].mean() < dl[:3].mean(), dl
