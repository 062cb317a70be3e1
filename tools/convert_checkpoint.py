"""One-time checkpoint conversion: HF torch snapshot -> orbax flax pytrees.

The reference re-downloads + re-loads torch weights every run (run.py:218);
here conversion happens once and the pipelines load native flax pytrees
directly (SURVEY.md section 5 checkpoint/resume row: "weights converted once
from HF safetensors -> orbax/msgpack pytrees").

  python tools/convert_checkpoint.py --model musicldm \
      --src /path/hf_snapshot --dst /path/converted

from_pretrained() also accepts the raw HF snapshot; this tool just front-loads
the conversion cost and drops torch/safetensors from the serving footprint.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["musicldm", "audioldm2", "stable_audio"])
    p.add_argument("--src", required=True, help="HF snapshot directory")
    p.add_argument("--dst", required=True, help="output orbax directory")
    args = p.parse_args()

    from diffmusic_tpu.models import checkpoint as ck
    import orbax.checkpoint as ocp

    loaders = {"musicldm": ck.load_musicldm, "audioldm2": ck.load_audioldm2,
               "stable_audio": ck.load_stable_audio}
    pipe = loaders[args.model](args.src)

    trees = {"unet": getattr(pipe, "unet_params", None),
             "vae": pipe.vae_params,
             "vocoder": getattr(pipe, "vocoder_params", None),
             "text": getattr(pipe, "text_params", None),
             "t5": getattr(pipe, "t5_params", None),
             "gpt2": getattr(pipe, "gpt2_params", None),
             "projection": getattr(pipe, "proj_params", None),
             "dit": getattr(pipe, "dit_params", None),
             "vits": getattr(pipe, "vits_params", None)}
    trees = {k: v for k, v in trees.items() if v is not None}

    ckptr = ocp.PyTreeCheckpointer()
    dst = Path(args.dst).resolve()
    for name, tree in trees.items():
        ckptr.save(dst / name, tree)
        print(f"saved {name} -> {dst / name}")


if __name__ == "__main__":
    main()
