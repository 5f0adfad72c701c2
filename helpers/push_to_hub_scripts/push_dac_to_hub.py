"""Convert official DAC weights into this framework's artifact format —
equivalent of the reference's ``helpers/push_to_hub_scripts/push_dac_to_hub.py``
(which wraps descript weights into its DACModel and pushes to the Hub).

This image has no network egress; the script converts a *local* HF
``DacModel`` checkpoint (or weight-normed descript state dict) into a JAX
params artifact, and pushes only when --push is given and hub access exists.

Usage: python helpers/push_to_hub_scripts/push_dac_to_hub.py <local_dac_dir> <out_dir> [--push repo_id]
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--push", default=None, help="hub repo id (requires network + auth)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp
    from transformers import DacModel

    from parler_tts_tpu.core.config import DACConfig
    from parler_tts_tpu.core.torch_import import import_dac

    m = DacModel.from_pretrained(args.src)
    c = m.config
    params = import_dac(
        m.state_dict(),
        num_down=len(c.downsampling_ratios),
        num_up=len(c.upsampling_ratios),
        num_codebooks=c.n_codebooks,
    )
    cfg = DACConfig(
        num_codebooks=c.n_codebooks, codebook_size=c.codebook_size, codebook_dim=c.codebook_dim,
        latent_dim=c.hidden_size, encoder_hidden_size=c.encoder_hidden_size,
        downsampling_ratios=tuple(c.downsampling_ratios), decoder_hidden_size=c.decoder_hidden_size,
        upsampling_ratios=tuple(c.upsampling_ratios), sampling_rate=c.sampling_rate,
    )
    import json
    import os

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(os.path.join(args.out, "weights")), params, force=True)
    print(f"converted {args.src} -> {args.out}")

    if args.push:
        try:
            from huggingface_hub import HfApi

            HfApi().upload_folder(folder_path=args.out, repo_id=args.push)
            print(f"pushed to {args.push}")
        except Exception as e:
            print(f"push skipped ({e})", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
