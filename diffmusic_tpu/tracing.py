"""Tracing / profiling / failure-detection utilities (SURVEY.md section 5).

The reference has no tracing or sanitizers — only tqdm descriptions carrying the
per-step loss (pipeline_musicldm.py:761-763) and its NaN-retry loop. TPU-native
equivalents:

- `trace(logdir)`: xprof-compatible device trace (view with tensorboard or
  xprof); the denoise scan bodies are annotated with
  jax.profiler.TraceAnnotation scopes ("unet_forward", "guided_step") in
  pipelines/base.py.
- `annotate(name)`: named scope for custom phases.
- `debug_nans(enable)`: jax_debug_nans — raises at the first NaN-producing op
  instead of relying on the host-level retry (pipelines/base.py
  denoise_with_nan_retry keeps the reference's recovery semantics in prod).
- per-step loss streaming to the host: `show_progress=True` on any pipeline
  call (jax.debug.callback inside the compiled scan).
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace under `logdir` (xprof/tensorboard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace scope: `with annotate("vae_decode"): ...`."""
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True) -> None:
    """Fail fast at the first NaN inside jitted code (debug builds only —
    disables some fusions). Production keeps the reference's NaN-retry
    semantics at the host level instead."""
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> dict:
    """Per-device memory stats (live bytes, peak) for observability."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {k: stats[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use")
                           if k in stats}
    return out
