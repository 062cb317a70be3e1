"""Coverage for the observability utilities and the orbax conversion tool."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu import tracing

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


class TestTracing:
    def test_annotate_and_trace(self, tmp_path):
        with tracing.trace(str(tmp_path / "trace")):
            with tracing.annotate("test_phase"):
                x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
                x.block_until_ready()
        # xprof writes under plugins/profile/<run>/
        assert any((tmp_path / "trace").rglob("*"))

    def test_debug_nans_toggle(self):
        try:
            tracing.debug_nans(True)
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: jnp.log(x))(
                    jnp.asarray(-1.0)).block_until_ready()
        finally:
            tracing.debug_nans(False)  # other tests rely on NaNs propagating
        out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
        assert np.isnan(float(out))

    def test_device_memory_stats(self):
        stats = tracing.device_memory_stats()
        assert isinstance(stats, dict)


class TestOrbaxConversion:
    def test_save_and_reload_pytrees(self, tmp_path):
        """The convert_checkpoint tool's orbax save path round-trips a tiny
        pipeline's param trees."""
        ocp = pytest.importorskip("orbax.checkpoint")
        from diffmusic_tpu.pipelines import MusicLDMPipeline

        pipe = MusicLDMPipeline.tiny()
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(tmp_path / "unet", pipe.unet_params)
        restored = ckptr.restore(tmp_path / "unet")

        want = jax.tree_util.tree_leaves(pipe.unet_params)
        got = jax.tree_util.tree_leaves(restored)
        assert len(want) == len(got)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
