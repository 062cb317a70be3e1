"""Data layer: registry + host-side audio datasets.

TPU-native rethink of the reference data layer (diffmusic/data/dataloader.py:13-145):
audio decode/crop/resample are host I/O, so they stay numpy-side; the device only
ever sees fixed-shape float32 arrays. The decorator registry keyed by file `type`
(dataloader.py:16-28) and the (data, file_name) item contract (dataloader.py:73-89)
are preserved so run.py stays drop-in compatible.
"""

from .codecs import decode_mp3, decode_opus, read_audio
from .dataloader import (
    MP3Dataset,
    OpusDataset,
    WAVDataset,
    get_dataloader,
    get_dataset,
    register_dataset,
)
from .io import read_wav, write_wav

__all__ = [
    "MP3Dataset",
    "OpusDataset",
    "WAVDataset",
    "decode_mp3",
    "decode_opus",
    "get_dataloader",
    "get_dataset",
    "read_audio",
    "register_dataset",
    "read_wav",
    "write_wav",
]
