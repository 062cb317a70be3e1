"""Per-stage fused vocoder backward megakernel (pallas/stage_bwd_kernel.py)
vs the plain pair-reference composition, interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.conv1d_kernel as ck
import diffmusic_tpu.pallas.stage_bwd_kernel as sk

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


@pytest.fixture(autouse=True)
def _interpret_mode():
    ck._INTERPRET = True
    sk._INTERPRET = True
    yield
    ck._INTERPRET = False
    sk._INTERPRET = False


KS = (3, 7, 11)
DILS = ((1, 3), (1, 3), (1, 5))


def _conv_np(x, w, d):
    """'same' dilated conv, numpy float64: x (t, cin), w (k, cin, cout)."""
    k = w.shape[0]
    pad = (k - 1) * d // 2
    xp = np.pad(x, ((pad, pad), (0, 0)))
    return sum(xp[tap * d:tap * d + x.shape[0]] @ w[tap] for tap in range(k))


def _stage_grad_numpy_f64(x, params, g, slope):
    """Analytic float64 stage input-gradient — the flag-immune ground truth
    (x64-context jax is unavailable in this jax version)."""
    params = [[np.asarray(a, np.float64) for a in p] for p in params]
    mask = lambda s, v: np.where(s >= 0, v, slope * v)
    adj = lambda w: np.flip(w, axis=0).swapaxes(1, 2)
    dx_total = np.zeros_like(x)
    pi = 0
    for k, dils in zip(KS, DILS):
        saved = []
        xb = x
        for d, (w1, b1, w2, b2) in zip(dils, params[pi:pi + len(dils)]):
            h = _conv_np(mask(xb, xb), w1, d) + b1
            y = _conv_np(mask(h, h), w2, 1) + b2 + xb
            saved.append((xb, h, w1, w2, d))
            xb = y
        dcur = g / len(KS)
        for xb_i, h, w1, w2, d in reversed(saved):
            dh = mask(h, _conv_np(dcur, adj(w2), 1))
            dcur = mask(xb_i, _conv_np(dh, adj(w1), d)) + dcur
        dx_total += dcur
        pi += len(dils)
    return dx_total


def _make_params(rng, c):
    params = []
    for k, dils in zip(KS, DILS):
        for _d in dils:
            params.append((
                jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32),
                jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
                jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32),
                jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)))
    return tuple(params)


class TestStageBwdMegakernel:
    def test_forward_matches_reference(self, rng):
        t, c = 900, 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        params = _make_params(rng, c)
        out = ck.from_canvas(sk.stage_resblocks_canvas(
            ck.to_canvas(x), params, t, KS, DILS, 0.1), t)
        want = sk._stage_ref(x, params, KS, DILS, 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_gradient_matches_reference(self, rng):
        """The megakernel's one-call stage backward == autodiff through the
        plain pair-reference composition (18 adjoint convs + masks + skips
        across three branches, margins crossed).

        The reference is computed in FLOAT64: under the suite's
        --xla_force_host_platform_device_count=8 flag, XLA CPU's f32
        dilated-conv adjoint itself diverges by ~1e-2 at a block-halo edge
        (measured: flag-on f32 lax.conv grad is 1.0e-2 from the f64 truth at
        rows 451-453 while this kernel is 4e-6 from it; flag-off both are
        ~5e-6) — the kernel is the MORE accurate side, so it must not be
        asserted against the flag-perturbed f32 conv path."""
        t, c = 700, 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        params = _make_params(rng, c)
        probe = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)

        def loss_stage(x_):
            out = ck.from_canvas(sk.stage_resblocks_canvas(
                ck.to_canvas(x_), params, t, KS, DILS, 0.1), t)
            return jnp.sum(out * probe)

        g_stage = jax.grad(loss_stage)(x)
        g_ref = _stage_grad_numpy_f64(np.asarray(x)[0].astype(np.float64),
                                      params, np.asarray(probe)[0]
                                      .astype(np.float64), 0.1)
        np.testing.assert_allclose(np.asarray(g_stage)[0],
                                   g_ref.astype(np.float32),
                                   rtol=1e-3, atol=1e-3)

    def test_vocoder_stage_routed_gradient_semantics(self, rng, monkeypatch):
        """Full vocoder value AND input gradient with the stage megakernel
        routed == the plain XLA path."""
        from diffmusic_tpu.models.configs import HiFiGANConfig
        from diffmusic_tpu.models.hifigan import SpeechT5HifiGan

        monkeypatch.setenv("DIFFMUSIC_TPU_STAGE_BWD", "1")
        cfg = HiFiGANConfig(model_in_dim=64, upsample_initial_channel=256,
                            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                            resblock_kernel_sizes=(3, 7),
                            resblock_dilation_sizes=((1, 3), (1, 3)))
        voc = SpeechT5HifiGan(cfg)
        mel = jnp.asarray(rng.standard_normal((1, 41, 64)), jnp.float32)
        params = voc.init(jax.random.key(0), mel)

        def loss(m, interpret):
            ck._INTERPRET = interpret
            sk._INTERPRET = interpret
            try:
                return jnp.sum(voc.apply(params, m) ** 2)
            finally:
                ck._INTERPRET = True
                sk._INTERPRET = True

        np.testing.assert_allclose(float(loss(mel, True)),
                                   float(loss(mel, False)), rtol=1e-3)
        g_stage = jax.grad(lambda m: loss(m, True))(mel)
        g_plain = jax.grad(lambda m: loss(m, False))(mel)
        np.testing.assert_allclose(np.asarray(g_stage), np.asarray(g_plain),
                                   rtol=1e-3, atol=1e-3)
