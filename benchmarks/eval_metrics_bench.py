"""Wall-time of the eval WER/CLAP pass at realistic model scale (round-4
VERDICT weak #5 / round-5 item #8).

The reference evaluates <=100 generated clips per eval with
``distil-whisper/distil-large-v2`` + ``laion/larger_clap_music_and_speech``
on the training GPUs (``run_parler_tts_training.py:253-260, 1285-1331``).
This box is zero-egress, so the real checkpoints cannot land — but ASR/CLAP
wall time is weight-value independent, so this benchmark builds RANDOM
models at the real architecture size locally and times the actual
``WerMetric``/``ClapMetric`` code paths on host CPU:

* Whisper at distil-large-v2 geometry: d_model 1280, 32 encoder layers,
  2 decoder layers, 20 heads (≈750M params; vocab shrunk to 1k — the
  decode cost is 2 thin layers, the 32-layer encoder dominates);
* CLAP at the default HTSAT-base geometry (the ``larger_clap`` audio tower
  is ~2-3x this — scale the reported number accordingly).

Usage: python benchmarks/eval_metrics_bench.py [--clips 32] [--seconds 6]
       [--batch 8]
Emits one JSON line; record the result in PERFORMANCE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def build_distil_whisper_sized(d: str) -> None:
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperTokenizerFast,
    )

    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|transcribe|>", "<|notimestamps|>"]
    tok = Tokenizer(models.BPE(unk_token="<|endoftext|>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        ["hey how are you doing today", "say row number zero"],
        trainers.BpeTrainer(vocab_size=200, special_tokens=specials),
    )
    fast = WhisperTokenizerFast(
        tokenizer_object=tok, unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>",
    )
    fast.save_pretrained(d)
    ids = {s: fast.convert_tokens_to_ids(s) for s in specials}
    torch.manual_seed(0)
    # distil-large-v2 geometry (distil-whisper paper: large-v2 encoder kept
    # frozen-size, decoder distilled to 2 layers)
    m = WhisperForConditionalGeneration(WhisperConfig(
        vocab_size=1000, d_model=1280, encoder_layers=32, decoder_layers=2,
        encoder_attention_heads=20, decoder_attention_heads=20,
        encoder_ffn_dim=5120, decoder_ffn_dim=5120,
        num_mel_bins=80, max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=ids["<|startoftranscript|>"],
        eos_token_id=ids["<|endoftext|>"], bos_token_id=ids["<|endoftext|>"],
        pad_token_id=ids["<|endoftext|>"],
    ))
    m.generation_config.decoder_start_token_id = ids["<|startoftranscript|>"]
    m.generation_config.forced_decoder_ids = None
    m.generation_config.begin_suppress_tokens = None
    m.generation_config.suppress_tokens = None
    m.generation_config.max_length = 32  # ~ a short utterance's transcript
    m.generation_config.no_timestamps_token_id = ids["<|notimestamps|>"]
    m.save_pretrained(d)
    WhisperFeatureExtractor().save_pretrained(d)


def build_clap_default(d: str) -> None:
    import torch
    from transformers import AutoProcessor, ClapConfig, ClapModel, ClapProcessor  # noqa: F401
    from transformers import ClapFeatureExtractor, RobertaTokenizerFast
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    torch.manual_seed(0)
    # enable_fusion matches the default ClapFeatureExtractor's 4-channel
    # fusion features (and the real laion/larger_clap_* are fusion models)
    ClapModel(ClapConfig(audio_config={"enable_fusion": True})).save_pretrained(d)
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        ["a female speaker with a low pitched voice", "clear audio quality"],
        trainers.BpeTrainer(vocab_size=300, special_tokens=specials),
    )
    RobertaTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>",
        bos_token="<s>", eos_token="</s>", mask_token="<mask>", cls_token="<s>",
        sep_token="</s>",
    ).save_pretrained(d)
    ClapFeatureExtractor().save_pretrained(d)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-clap", action="store_true")
    args = ap.parse_args()

    from parler_tts_tpu.training.eval_metrics import ClapMetric, WerMetric

    cache = os.path.join(tempfile.gettempdir(), "eval_bench_models")
    wdir = os.path.join(cache, "whisper_distil_large_sized")
    if not os.path.isdir(wdir):
        os.makedirs(wdir, exist_ok=True)
        t0 = time.time()
        build_distil_whisper_sized(wdir)
        print(f"built whisper-sized model in {time.time()-t0:.0f}s", file=sys.stderr)

    sr = 16000
    rng = np.random.default_rng(0)
    clips = [rng.normal(0, 0.05, int(args.seconds * sr)).astype(np.float32)
             for _ in range(args.clips)]
    prompts = ["hey how are you doing today"] * args.clips

    result = {"metric": "eval_metrics_wall", "clips": args.clips,
              "clip_seconds": args.seconds, "asr_batch": args.batch}

    t0 = time.time()
    wer = WerMetric(wdir, batch_size=args.batch)
    result["asr_load_s"] = round(time.time() - t0, 1)
    assert wer.available, getattr(wer, "error", "")

    # serial baseline on a subset (the round-4 code path: one call per clip)
    n_serial = min(8, args.clips)
    wer_serial = WerMetric(wdir, batch_size=1)
    t0 = time.time()
    wer_serial(prompts[:n_serial], clips[:n_serial], sr)
    serial_s = time.time() - t0
    result["asr_serial_s_per_clip"] = round(serial_s / n_serial, 2)

    t0 = time.time()
    wer(prompts, clips, sr)
    batched_s = time.time() - t0
    result["asr_batched_s_per_clip"] = round(batched_s / args.clips, 2)
    result["asr_batched_total_s"] = round(batched_s, 1)
    result["asr_100clip_projection_s"] = round(100 * batched_s / args.clips, 0)

    print(json.dumps(result), file=sys.stderr)  # ASR numbers survive a CLAP crash

    if not args.skip_clap:
        try:
            cdir = os.path.join(cache, "clap_fusion_sized")
            if not os.path.isdir(cdir):
                os.makedirs(cdir, exist_ok=True)
                build_clap_default(cdir)
            t0 = time.time()
            clap = ClapMetric(cdir)
            result["clap_load_s"] = round(time.time() - t0, 1)
            if clap.available:
                t0 = time.time()
                clap(prompts, clips, sr)
                clap_s = time.time() - t0
                result["clap_s_per_clip"] = round(clap_s / args.clips, 2)
                result["clap_100clip_projection_s"] = round(100 * clap_s / args.clips, 0)
            else:
                result["clap_error"] = getattr(clap, "error", "")[:200]
        except Exception as e:
            result["clap_error"] = str(e)[:200]

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
