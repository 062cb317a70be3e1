"""String vocabulary for the CLI/config surface.

Mirrors the reference's vocabulary (reference: diffmusic/constants.py:1-35) so the
`run.py` flag surface stays drop-in compatible.
"""

CONFIG_PATH = "configs"

# datasets
MOISES = "moises"
MUSICCAPS = "music_data"

# models
AUDIOLDM2 = "audioldm2"
MUSICLDM = "musicldm"
# reachable here unlike the reference, whose run.py -m lists only
# audioldm2/musicldm (reference run.py:84-87) while shipping
# configs/model/stable_audio.yaml and a dormant pipeline
STABLE_AUDIO = "stable_audio"

# tasks
MUSIC_GENERATION = "music_generation"
MUSIC_INPAINTING = "music_inpainting"
SUPER_RESOLUTION = "super_resolution"
PHASE_RETRIEVAL = "phase_retrieval"
MUSIC_DEREVERBERATION = "music_dereverberation"
STYLE_GUIDANCE = "style_guidance"

TASKS = (
    MUSIC_GENERATION,
    MUSIC_INPAINTING,
    SUPER_RESOLUTION,
    PHASE_RETRIEVAL,
    MUSIC_DEREVERBERATION,
    STYLE_GUIDANCE,
)

# schedulers / guided samplers
DDIM = "ddim"
DPS = "dps"
MPGD = "mpgd"
DSG = "dsg"
DITTO = "ditto"
DIFFMUSIC = "diffmusic"

SCHEDULERS = (DDIM, DPS, MPGD, DSG, DITTO, DIFFMUSIC)

# prompt ablation axes
NULL_TEXT = "null_text"
TAG = "tag"
CLAP = "clap"

# supervision spaces for the guidance loss
WAV_FORM = "wav_form"
MEL_SPECTROGRAM = "mel_spectrogram"
