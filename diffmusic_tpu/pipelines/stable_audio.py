"""StableAudio pipeline placeholder.

The reference ships a 756-line StableAudioPipeline (pipeline_stable_audio.py) that
is DORMANT: the pipeline factory only returns audioldm2/musicldm
(pipelines/__init__.py:11-13), so the stable-audio path is unreachable there.
Parity here = the same disabled state, documented: the DiT (StableAudioDiTModel),
waveform VAE (AutoencoderOobleck), EDM DPM-Solver schedule, and 1-D rotary
embeddings are future work tracked for a later round; `get_pipeline` does not
expose this class, matching the reference.
"""


class StableAudioPipeline:
    """Disabled, like the reference's. Constructing it raises with guidance."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "StableAudio (DiT + AutoencoderOobleck + EDM DPM-Solver) is dormant "
            "in the reference (its factory never returns it, "
            "pipelines/__init__.py:11-13) and not yet implemented here.")

    @classmethod
    def from_pretrained(cls, *args, **kwargs):
        return cls()
