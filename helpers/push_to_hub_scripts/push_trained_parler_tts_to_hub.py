"""Push a trained model artifact to the Hub — equivalent of the reference's
``helpers/push_to_hub_scripts/push_trained_parler_tts_to_hub.py``.

Zero-egress images only validate the artifact; pushing needs network+auth.

Usage: python helpers/push_to_hub_scripts/push_trained_parler_tts_to_hub.py <artifact_dir> <repo_id>
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact_dir")
    ap.add_argument("repo_id")
    args = ap.parse_args()

    from parler_tts_tpu.core import checkpoint as ck

    params, cfg, gen = ck.load_model(args.artifact_dir)  # validates the artifact
    print(f"artifact OK: decoder {cfg.decoder.num_hidden_layers}L/{cfg.decoder.hidden_size}h, "
          f"{cfg.decoder.num_codebooks} codebooks")
    try:
        from huggingface_hub import HfApi

        HfApi().upload_folder(folder_path=args.artifact_dir, repo_id=args.repo_id)
        print(f"pushed to {args.repo_id}")
    except Exception as e:
        print(f"push skipped ({e})", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
