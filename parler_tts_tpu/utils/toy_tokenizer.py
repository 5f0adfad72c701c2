"""Tiny local WordPiece tokenizer for tests/benches (zero-egress stand-in
for the real T5 tokenizer; NOT a production component).

Used by the serving benchmark, the Mini-geometry surface gates, and the
quality-gate CI so they all tokenize identically (a drifted copy would
desynchronize engine-vs-direct bitwise comparisons).
"""

from __future__ import annotations

DEFAULT_SENTENCES = (
    "a female speaker with a low pitched voice speaks very fast",
    "hey how are you doing today",
    "clear audio quality speaks fast",
    "a male speaker with a deep voice hey there",
)


def build_toy_tokenizer(save_dir: str | None = None, *, vocab_size: int = 100,
                        sentences=DEFAULT_SENTENCES):
    """-> PreTrainedTokenizerFast over a freshly-trained tiny WordPiece.

    ``vocab_size`` must stay below the model's text-encoder/prompt vocab
    (ids flow straight into embedding tables).
    """
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        list(sentences),
        trainers.WordPieceTrainer(vocab_size=vocab_size, special_tokens=["[UNK]", "[PAD]", "</s>"]),
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]", eos_token="</s>"
    )
    if save_dir is not None:
        fast.save_pretrained(save_dir)
    return fast
