"""Fine-tune on a local dataset (or the synthetic smoke set) — thin wrapper
over the training CLI, mirroring the reference's training README flow.

Usage:
  python examples/finetune.py --model_name_or_path <model_dir> \
      --train_dataset_name <local_hf_dataset_or_synthetic://N> \
      --output_dir ./output/finetune --max_steps 100

All training-CLI flags pass through (see parler_tts_tpu/training/args.py or
helpers/training_configs/*.json for recipes).
"""

import sys

from parler_tts_tpu.training.run_training import main

if __name__ == "__main__":
    result = main(sys.argv[1:] or [
        "--model_name_or_path", "dummy",
        "--train_dataset_name", "synthetic://96",
        "--output_dir", "./output/finetune-smoke",
        "--max_steps", "20",
        "--logging_steps", "5",
        "--save_steps", "10",
        "--do_eval", "--eval_steps", "10",
    ])
    print(result)
